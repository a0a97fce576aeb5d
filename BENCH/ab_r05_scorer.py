"""Same-epoch interleaved A/B for the model-quality scorer's two hashers
(quality_model.model_quality_score):

- **A** `hasher='md5'` (default): cross-engine-portable bucket hash
  (hashlib per DISTINCT gram per batch — the per-batch np.unique dedup is
  what keeps this viable on Zipfian corpora);
- **B** `hasher='fast'`: vectorized murmur-based `hash64` over the
  distinct-gram array (no per-gram Python call).

Both legs run the identical featurizer/weights/dot on the 200k-conv /
~2.9M-turn fixture and must agree on n_grams totals (scores differ by
design — different bucket assignment). The measurement backs (or refutes)
the docstring's "hot-path throughput" claim with numbers.

    python BENCH/ab_r05_scorer.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r05_scorer.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"  # shared with the r4b/r5 legs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r05_scorer.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.quality_model import model_quality_score
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-r05-scorer", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{FIXTURE}_{args.convs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from ddsparkle.transcripts import transcripts_df

        (
            transcripts_df(spark, n_convs=args.convs, profile="bench", seed=7)
            .write.mode("overwrite")
            .option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(path)
        )
    df = spark.read.parquet(path).select(
        F.concat_ws("|", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    n_rows = df.count()  # warm the scan once, untimed
    total_chars = df.select(F.sum(F.length("text"))).collect()[0][0]

    def leg(hasher, cache):
        t0 = time.monotonic()
        agg = (
            model_quality_score(df, hasher=hasher, cache_buckets=cache)
            .select(F.sum(F.col("n_grams").cast("long")).alias("g"))
            .collect()[0]["g"]
        )
        return time.monotonic() - t0, int(agg)

    LEGS = (
        ("md5_nocache", "md5", False),
        ("md5_cached", "md5", True),
        ("fast", "fast", False),
    )
    results = {
        "n_rows": n_rows,
        "total_chars": int(total_chars),
        "rounds": [],
    }
    mins = {name: float("inf") for name, _, _ in LEGS}
    grams = {}
    for _ in range(args.rounds):
        rnd = {}
        for name, hasher, cache in LEGS:
            dt, g = leg(hasher, cache)
            rnd[name] = round(dt, 3)
            grams[name] = g
            mins[name] = min(mins[name], dt)
        rnd["grams_equal"] = len(set(grams.values())) == 1
        results["rounds"].append(rnd)
        print(json.dumps(rnd))
    results["total_grams"] = grams["md5_nocache"]
    results["grams_equal"] = len(set(grams.values())) == 1
    for name, _, _ in LEGS:
        results[f"{name}_min"] = round(mins[name], 3)
        results[f"{name}_rows_per_sec"] = round(n_rows / mins[name])
        results[f"{name}_mb_per_sec"] = round(total_chars / mins[name] / 1e6, 1)
    results["cache_speedup"] = round(mins["md5_nocache"] / mins["md5_cached"], 2)
    results["fast_speedup_vs_md5_nocache"] = round(
        mins["md5_nocache"] / mins["fast"], 2
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
