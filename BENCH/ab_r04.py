"""Same-epoch interleaved A/B for the round-4 language-scorer rework (BENCH
policy: the shared host drifts ~2x between epochs, so NEVER compare absolute
totals across runs — only interleaved legs from the same epoch, per-leg
minima).

    python BENCH/ab_r04.py [--rounds 3] [--out BENCH/ab_r04.json]

Fixtures: the sf0.1 documents table (5k docs, ~300 chars each) PLUS a
long-document fixture (5k docs tiled to ~64 KB — the regime the prefix
bound targets). Both re-written as multi-file parquet so scan parallelism
is equal across legs (the single-split effect is measured separately and
fixed by ``_ensure_parallelism`` inside ``language_id``).

  A = the round-3 scorer, replicated inline: FULL text, per-language
      ``split(lower(text))`` (16 copies after plan collapse),
      ``length(regexp_replace(text,'[^ranges]',''))`` script counts,
      two-projection materialize + argmax;
  B = the shipped round-4 ``language_id``: 4096-char prefix bound,
      let-bound tokenize (computed once per row — a transform-lambda
      binding, immune to Catalyst alias re-inlining), and
      ``regexp_count`` script counts (no stripped-string allocation).

Answers are NOT asserted byte-identical — the prefix bound can legitimately
change the call on a document whose language composition shifts after 4 KB
— so the script reports the AGREEMENT RATE alongside timings; the bounded
scorer's correctness is pinned by its DuckDB twins (which cut the same
prefix) at sf0.01 and sf0.1 via the driver/harness gates.
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


def _language_id_r3(df):
    """Inline replica of the round-3 language_id (see git history
    dcadd53^): full-text scoring, regexp_replace+length script counts,
    materialized score columns + array_max argmax."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import _SCRIPTS, _STOPWORDS

    tokens = F.split(F.lower(F.col("text")), " ")
    scores = {
        lang: F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in _STOPWORDS.items()
    }
    n_chars = F.greatest(F.length(F.col("text")), F.lit(1))
    for lang, (ranges, weight) in _SCRIPTS.items():
        cls = "".join(f"\\u{lo}-\\u{hi}" for lo, hi in ranges)
        cnt = F.length(F.regexp_replace(F.col("text"), f"[^{cls}]", ""))
        scores[lang] = F.floor((cnt * F.lit(20 * weight)) / n_chars)
    scored = df.select(
        "doc_id", *[c.alias(f"__lang_{k}") for k, c in scores.items()]
    )
    entries = [
        F.struct(F.col(f"__lang_{k}").alias("s"), F.lit(-i).alias("ni"), F.lit(k).alias("lang"))
        for i, k in enumerate(scores)
    ]
    m = F.array_max(F.array(*entries))
    pick = F.when(m["s"] <= 0, F.lit("und")).otherwise(m["lang"])
    return scored.select("doc_id", pick.alias("lang_pred"))


def _language_id_r4(df):
    from ddsparkle.spark.dataops import language_id

    return language_id(df)


def _gate_r3(df):
    """Inline replica of the round-3 curate() language gate: materialize the
    25 score columns, filter on the argmax of the column refs. Catalyst's
    filter pushdown substitutes the aliases back into the predicate, so the
    physical plan carries 16 split(lower(...)) copies + 9 regexp passes in
    the scan-fused filter — the shape the let-binding exists to kill."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import _SCRIPTS, _STOPWORDS

    tokens = F.split(F.lower(F.col("text")), " ")
    scores = {
        lang: F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in _STOPWORDS.items()
    }
    n_chars = F.greatest(F.length(F.col("text")), F.lit(1))
    for lang, (ranges, weight) in _SCRIPTS.items():
        cls = "".join(f"\\u{lo}-\\u{hi}" for lo, hi in ranges)
        cnt = F.length(F.regexp_replace(F.col("text"), f"[^{cls}]", ""))
        scores[lang] = F.floor((cnt * F.lit(20 * weight)) / n_chars)
    gated = df.select("*", *[c.alias(f"__lang_{k}") for k, c in scores.items()])
    entries = [
        F.struct(F.col(f"__lang_{k}").alias("s"), F.lit(-i).alias("ni"), F.lit(k).alias("lang"))
        for i, k in enumerate(scores)
    ]
    m = F.array_max(F.array(*entries))
    pick = F.when(m["s"] <= 0, F.lit("und")).otherwise(m["lang"])
    return gated.filter(pick.isin(["en"])).select("doc_id", "text")


def _gate_r4(df):
    from ddsparkle.spark.dataops import language_pred_expr

    return df.filter(language_pred_expr("text").isin(["en"])).select("doc_id", "text")


def _fixtures(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = F.greatest((F.lit(65536) / F.greatest(F.length("text"), F.lit(1))).cast("int"), F.lit(1))
    long_docs = docs.select(
        "doc_id", F.substring(F.repeat(F.col("text"), reps), 1, 65536).alias("text")
    )
    paths = {}
    for name, df in [("docs", docs.select("doc_id", "text")), ("long", long_docs)]:
        p = f"/tmp/ab_r04_{name}"
        df.repartition(32).write.mode("overwrite").option(
            "parquet.block.size", 8 * 1024 * 1024
        ).parquet(p)
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
        a = _language_id_r3(df).withColumnRenamed("lang_pred", "a")
        b = _language_id_r4(df).withColumnRenamed("lang_pred", "b")
        j = a.join(b, "doc_id")
        total = j.count()
        same = j.filter("a <=> b").count()
        agreement[name] = {"total": total, "same": same, "rate": same / total}

    # four regimes: select shape on short/long multi-file fixtures, the
    # curate-style FILTER shape (pushdown re-inlining — the shape that made
    # doc_curation_pipeline 12 s), and the raw single-file bench table
    # (single-split scan — the shape behind doc_language_id's 2.5 s)
    cases = {
        "docs": (paths["docs"], ("A_r3_scorer", _language_id_r3), ("B_r4_scorer", _language_id_r4)),
        "long": (paths["long"], ("A_r3_scorer", _language_id_r3), ("B_r4_scorer", _language_id_r4)),
        "gate": (paths["docs"], ("A_r3_gate", _gate_r3), ("B_r4_gate", _gate_r4)),
        "single_split": (
            f"{args.sf_dir}/documents.parquet",
            ("A_r3_scorer", _language_id_r3),
            ("B_r4_scorer", _language_id_r4),
        ),
    }
    legs = {}
    for name, (p, *legs_fns) in cases.items():
        df = spark.read.parquet(p)
        for _, fn in legs_fns:
            fn(df).count()  # warm scan/codegen once per leg
        times: dict[str, list] = {label: [] for label, _ in legs_fns}
        for _ in range(args.rounds):
            for label, fn in legs_fns:
                t0 = time.monotonic()
                fn(df).count()
                times[label].append(time.monotonic() - t0)
        legs[name] = {
            k: {"min": min(v), "all": [round(x, 3) for x in v]} for k, v in times.items()
        }
        (a_label, _), (b_label, _) = legs_fns
        legs[name]["speedup_min"] = legs[name][a_label]["min"] / legs[name][b_label]["min"]

    out = {"agreement": agreement, "legs": legs, "rounds": args.rounds, "sf_dir": args.sf_dir}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
