"""Same-epoch interleaved A/B for the r5 `curate_conversations` persist fix
(VERDICT r4, "What's wrong #1" / next-round task 1).

- **A** (r4 replica): no stage persists — `exact_kept` is re-derived (full
  scan + the dedup fingerprint groupBy + semi-join) by the near-dup call,
  the CC node frame, the `fuzzy_kept` join, AND each stage-count action;
  `fuzzy_kept` likewise feeds three consumers (a ~4-5x recompute multiplier
  on the corpus scan);
- **B** (shipped): `exact_kept` and `fuzzy_kept` persisted for the call
  (released per the `release_cache` contract), exactly the discipline of
  `dataprep.curate`.

Both legs must produce IDENTICAL stats dicts every round. Fixture: the
200 k-conv / ~2.9 M-turn bench-profile corpus of AB_r04.md (r4 wall was
24.7 s on that epoch's host).

    python BENCH/ab_r05_curate.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r05_curate.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"  # shared with scale_conv_ops_r04b


def _curate_convs_r4(df, cc_local_threshold=100_000):
    """Verbatim r4 `curate_conversations` (pre-persist), minus docstring —
    the A leg. Kept local to the bench so the shipped operator stays the
    only production implementation."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import connected_components
    from ddsparkle.spark.transcript_ops import (
        dedup_conversations,
        near_dup_conversations,
    )

    stats = {}
    stats["input_convs"] = int(df.select("conv_id").distinct().count())
    exact_reps = dedup_conversations(df).select("conv_id")
    exact_kept = df.join(exact_reps, "conv_id", "left_semi")
    stats["after_exact_dedup"] = int(exact_reps.count())
    pairs = near_dup_conversations(
        exact_kept, threshold=0.6, min_turns=2, max_digest_df=64
    ).select(F.col("conv_a").alias("id_a"), F.col("conv_b").alias("id_b"))
    comp = connected_components(
        pairs,
        exact_kept.select("conv_id").distinct(),
        "conv_id",
        local_threshold=cc_local_threshold,
    )
    fuzzy_reps = comp.filter(F.col("conv_id") == F.col("component")).select("conv_id")
    fuzzy_kept = exact_kept.join(fuzzy_reps, "conv_id", "left_semi")
    stats["after_near_dup"] = int(fuzzy_reps.count())
    meta = fuzzy_kept.groupBy("conv_id").agg(
        F.count("*").alias("__n"), F.collect_set("role").alias("__roles")
    )
    good = (
        meta.filter(F.col("__n") >= 2)
        .filter(F.array_contains("__roles", "user"))
        .filter(F.array_contains("__roles", "assistant"))
        .select("conv_id")
    )
    stats["after_quality"] = int(good.count())
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r05_curate.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.session import get_spark
    from ddsparkle.spark.transcript_ops import curate_conversations

    spark = get_spark(
        "ddsparkle-ab-r05-curate", master="local[32]", shuffle_partitions=64,
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
    n_turns = df.count()  # warm the scan once, untimed

    def leg_B():
        _curated, stats = curate_conversations(df, release_cache=True)
        return stats

    results = {
        "n_convs": args.convs,
        "n_turns": n_turns,
        "rounds": [],
    }
    mins = {"A": float("inf"), "B": float("inf")}
    stats_equal = True
    for _ in range(args.rounds):
        rnd = {}
        out = {}
        for leg, fn in (("A", lambda: _curate_convs_r4(df)), ("B", leg_B)):
            t0 = time.monotonic()
            out[leg] = fn()
            dt = time.monotonic() - t0
            rnd[f"curate_{leg}"] = round(dt, 3)
            mins[leg] = min(mins[leg], dt)
        rnd["stats_equal"] = out["A"] == {
            k: v for k, v in out["B"].items() if k in out["A"]
        }
        stats_equal = stats_equal and rnd["stats_equal"]
        rnd["stats"] = out["B"]
        results["rounds"].append(rnd)
        print(json.dumps(rnd))
    results["curate_min_A"] = round(mins["A"], 3)
    results["curate_min_B"] = round(mins["B"], 3)
    results["curate_speedup"] = round(mins["A"] / mins["B"], 2)
    results["stats_equal_all_rounds"] = stats_equal
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
