"""Same-epoch interleaved A/B for the AMS F2 / self-join-size sketch
(approx.ams_f2_sketch) against the exact computation it prices:

- **A** exact F2: groupBy(conv_id).count() -> SUM(cnt^2) — one full
  exchange of the key column (the thing the sketch exists to avoid);
- **B** AMS tug-of-war, 256 counters: one scan, per-task counter partials,
  a 2 KB payload reduce — ZERO raw-row exchange.

Per round both legs run on the same 200k-conv / ~2.9M-turn fixture; the
sketch's relative error vs the exact F2 must stay within the 4-sigma
Chebyshev bound 4*sqrt(2/256) = 0.354 (asserted every round — it is
deterministic given the seed). The wall-clock comparison is recorded for
context, NOT claimed as a win at this scale: at 2.9M rows the exact
groupBy is cheap; the sketch's value is the absent exchange, which grows
with the corpus while the sketch state stays 2 KB.

    python BENCH/ab_r05_ams.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r05_ams.json]
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
    ap.add_argument("--out", default="BENCH/ab_r05_ams.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.approx import ams_f2_sketch
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-r05-ams", master="local[32]", shuffle_partitions=64,
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
    df = spark.read.parquet(path)
    n_rows = df.count()
    keyed = df.select(
        F.conv(F.substring(F.md5("conv_id"), 1, 15), 16, 10).cast("long").alias("k")
    )

    results = {"convs": args.convs, "rows": n_rows, "rounds": []}
    bound = 4.0 * (2.0 / 256.0) ** 0.5
    for rnd in range(args.rounds):
        t0 = time.perf_counter()
        exact = int(
            df.groupBy("conv_id")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
            .collect()[0]["f2"]
        )
        wall_a = time.perf_counter() - t0

        t0 = time.perf_counter()
        sk = ams_f2_sketch(keyed, "k", n_counters=256, seed=0)
        est = sk.f2_estimate()
        wall_b = time.perf_counter() - t0

        rel = abs(est - exact) / exact
        assert rel <= bound, (rel, bound)
        results["rounds"].append(
            {
                "wall_exact_s": round(wall_a, 3),
                "wall_ams_s": round(wall_b, 3),
                "f2_exact": exact,
                "f2_ams": round(est, 1),
                "rel_err": round(rel, 5),
            }
        )
        print(f"round {rnd}: exact {wall_a:.2f}s  ams {wall_b:.2f}s  rel_err {rel:.4f}")

    results["min_wall_exact_s"] = min(r["wall_exact_s"] for r in results["rounds"])
    results["min_wall_ams_s"] = min(r["wall_ams_s"] for r in results["rounds"])
    results["ams_turns_per_s"] = round(n_rows / results["min_wall_ams_s"], 1)
    results["bound_4sigma"] = round(bound, 4)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
