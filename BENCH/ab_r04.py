"""Same-epoch interleaved A/B for the round-4 language-scorer prefix bound
(BENCH policy: the shared host drifts ~2x between epochs, so NEVER compare
absolute totals across runs — only interleaved legs from the same epoch,
per-leg minima).

    python BENCH/ab_r04.py [--rounds 3] [--out BENCH/ab_r04.json]

Leg: doc_language_id over the sf0.1 documents table (5k docs) PLUS a
long-document fixture (5k docs x ~64 KB — the regime the bound targets:
per-row scorer cost was O(document length) for a decision that saturates
after a few KB).

  A = round-3 scorer: 9 regexp_replace passes + tokenize over the FULL text
      (``language_score_exprs(max_chars=None)``);
  B = round-4 scorer: same expressions over ``substring(text, 1, 4096)``.

Answers are NOT asserted byte-identical — the bound can legitimately change
the call on a document whose language composition shifts after 4 KB (the
standard langid prefix trade-off) — instead the script reports the
AGREEMENT RATE alongside timings, and the harness/driver gates pin the
bounded scorer's correctness vs its DuckDB twin (which cuts the same
prefix) at sf0.01 and sf0.1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-r04", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _language_id(df, max_chars):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import language_pick_expr, language_score_exprs

    scores = language_score_exprs("text", max_chars=max_chars)
    scored = df.select(
        "doc_id", *[c.alias(f"__lang_{k}") for k, c in scores.items()]
    )
    refs = {k: F.col(f"__lang_{k}") for k in scores}
    return scored.select("doc_id", language_pick_expr(refs).alias("lang_pred"))


def _fixtures(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # long-document fixture: tile each sf0.1 document to ~64 KB (deterministic)
    reps = F.greatest((F.lit(65536) / F.greatest(F.length("text"), F.lit(1))).cast("int"), F.lit(1))
    long_docs = docs.select(
        "doc_id", F.substring(F.repeat(F.col("text"), reps), 1, 65536).alias("text")
    )
    paths = {}
    for name, df in [("docs", docs.select("doc_id", "text")), ("long", long_docs)]:
        p = f"/tmp/ab_r04_{name}"
        df.write.mode("overwrite").option("parquet.block.size", 8 * 1024 * 1024).parquet(p)
        paths[name] = p
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "ab_r04.json"))
    args = ap.parse_args()

    spark = _spark()
    paths = _fixtures(spark, args.sf_dir)

    # agreement rate (once, not timed)
    agreement = {}
    for name, p in paths.items():
        df = spark.read.parquet(p)
        a = _language_id(df, None).withColumnRenamed("lang_pred", "a")
        b = _language_id(df, 4096).withColumnRenamed("lang_pred", "b")
        j = a.join(b, "doc_id")
        total = j.count()
        same = j.filter("a <=> b").count()
        agreement[name] = {"total": total, "same": same, "rate": same / total}

    legs = {}
    for name, p in paths.items():
        df = spark.read.parquet(p)
        for label, mc in [("A_fulltext", None), ("B_prefix4096", 4096)]:
            _language_id(df, mc).count()  # warm the scan/codegen once
        times: dict[str, list] = {"A_fulltext": [], "B_prefix4096": []}
        for _ in range(args.rounds):
            for label, mc in [("A_fulltext", None), ("B_prefix4096", 4096)]:
                t0 = time.monotonic()
                _language_id(df, mc).count()
                times[label].append(time.monotonic() - t0)
        legs[name] = {
            k: {"min": min(v), "all": [round(x, 3) for x in v]} for k, v in times.items()
        }
        legs[name]["speedup_min"] = (
            legs[name]["A_fulltext"]["min"] / legs[name]["B_prefix4096"]["min"]
        )

    out = {"agreement": agreement, "legs": legs, "rounds": args.rounds, "sf_dir": args.sf_dir}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
