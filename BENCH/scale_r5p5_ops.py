"""Scale-sanity leg for the r5-part-5 transcript operators on the
200 k-conv / ~2.9 M-turn bench-profile fixture (the scale_conv_ops_r04b
corpus — 70x the sf0.1 gate table). Single warm run per operator,
local[32]: the question is cost CLASS, not an A/B (bench policy: no
cross-epoch perf claims; walls here are recorded with turns/s context
only).

    python BENCH/scale_r5p5_ops.py [--convs 200000]
        [--out BENCH/scale_r5p5_ops.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"  # shared with scale_conv_ops_r04b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--out", default="BENCH/scale_r5p5_ops.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.session import get_spark
    from ddsparkle.spark.transcript_ops import (
        merge_consecutive_turns,
        self_repetition,
        truncate_to_token_budget,
    )
    from ddsparkle.transcripts import transcripts_df

    spark = get_spark(
        "ddsparkle-scale-r5p5",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{FIXTURE}_{args.convs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        (
            transcripts_df(spark, n_convs=args.convs, profile="bench", seed=7)
            .write.mode("overwrite")
            .option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(path)
        )
    df = spark.read.parquet(path)
    n_turns = df.count()
    results = {"n_convs": args.convs, "n_turns": n_turns, "ops": {}}

    def leg(name, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        results["ops"][name] = {
            "wall_s": round(dt, 2),
            "turns_per_s": round(n_turns / dt),
            **out,
        }
        print(json.dumps({name: results["ops"][name]}))

    df.select(F.count("*")).collect()  # warm the scan cache (not timed)

    leg(
        "merge_consecutive_turns",
        lambda: {"runs": merge_consecutive_turns(df).count()},
    )
    leg(
        "truncate_to_token_budget(128)",
        lambda: {"kept_turns": truncate_to_token_budget(df, max_tokens=128).count()},
    )
    leg(
        "self_repetition",
        lambda: {"conv_role_groups": self_repetition(df).count()},
    )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
