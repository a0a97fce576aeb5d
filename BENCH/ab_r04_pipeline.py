"""Same-epoch interleaved A/B of the END-TO-END curation pipeline
(VERDICT r3 next-step #5): attribute doc_curation_pipeline's r3 cost
movement (7.4 -> 12.2 s cross-epoch) to the language stage by running the
identical pipeline with

  A — the round-3 language scorer restored (full-text scoring, inline
      per-use expressions: Catalyst's filter pushdown re-inlines the
      16 split(lower()) copies + 9 full-text regexp passes into the
      scan-fused gate), via monkeypatching dataops.language_pred_expr;
  B — the shipped round-4 scorer (4096-char prefix bound + let-bound
      tokenize + regexp_count).

Everything else — decontamination, exact dedup, full-recall fuzzy dedup,
quality gate, stage counting — is byte-identical between legs, same
session, interleaved rounds, per-leg minima (BENCH policy: the host drifts
~2x between epochs, so only same-epoch interleaving is evidence).

    python BENCH/ab_r04_pipeline.py [--rounds 3] -> BENCH/ab_r04_pipeline.json
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
        "ddsparkle-ab-r04-pipeline", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _language_pred_r3(text_col: str):
    """Round-3 language_pred_expr replica (git dcadd53^): full-text token +
    script scoring built from inline expressions, so every use site (and
    every pushdown substitution) re-evaluates the whole scorer."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import _SCRIPTS, _STOPWORDS

    tokens = F.split(F.lower(F.col(text_col)), " ")
    scores = {
        lang: F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in _STOPWORDS.items()
    }
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    for lang, (ranges, weight) in _SCRIPTS.items():
        cls = "".join(f"\\u{lo}-\\u{hi}" for lo, hi in ranges)
        cnt = F.length(F.regexp_replace(F.col(text_col), f"[^{cls}]", ""))
        scores[lang] = F.floor((cnt * F.lit(20 * weight)) / n_chars)
    # r3 shape: no let-binding — aliases materialized then argmaxed; under a
    # FILTER Catalyst substitutes them back, duplicating every score expr.
    # Reproduce with a nested-select-free expression: build the structs
    # directly from the score expressions (equivalent post-substitution).
    entries = [
        F.struct(c.alias("s"), F.lit(-i).alias("ni"), F.lit(k).alias("lang"))
        for i, (k, c) in enumerate(scores.items())
    ]
    m = F.array_max(F.array(*entries))
    return F.when(m["s"] <= 0, F.lit("und")).otherwise(m["lang"])


def _run_pipeline(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataprep import curate

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = df.filter(F.col("source") != "src0")
    reference = df.filter(F.col("source") == "src0")
    _curated, stats = curate(
        corpus,
        decontaminate_against=reference,
        min_tokens=5,
        max_mean_token_len=20.0,
        languages=["en"],
        jaccard_threshold=0.7,
        num_perm=32,
        bands=32,
        max_bucket_size=None,
        release_cache=True,
    )
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "ab_r04_pipeline.json")
    )
    args = ap.parse_args()

    import ddsparkle.spark.dataops as dataops

    spark = _spark()
    shipped = dataops.language_pred_expr

    def leg(label):
        t0 = time.monotonic()
        stats = _run_pipeline(spark, args.sf_dir)
        return time.monotonic() - t0, stats

    # warm both legs once (scan cache, codegen) — not timed
    dataops.language_pred_expr = _language_pred_r3
    _, stats_a = leg("A")
    dataops.language_pred_expr = shipped
    _, stats_b = leg("B")

    times = {"A_r3_scorer": [], "B_r4_shipped": []}
    for _ in range(args.rounds):
        dataops.language_pred_expr = _language_pred_r3
        t, sa = leg("A")
        times["A_r3_scorer"].append(t)
        dataops.language_pred_expr = shipped
        t, sb = leg("B")
        times["B_r4_shipped"].append(t)
    dataops.language_pred_expr = shipped

    out = {
        "sf_dir": args.sf_dir,
        "rounds": args.rounds,
        "sec": {k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]} for k, v in times.items()},
        "speedup_min": round(min(times["A_r3_scorer"]) / min(times["B_r4_shipped"]), 3),
        # stage counts: identical up to the language gate by construction;
        # the final stage may differ only where the 4KB prefix changes a
        # long doc's language call (the bounded scorer is the oracle-gated
        # shipped behavior)
        "stats_A": stats_a,
        "stats_B": stats_b,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
