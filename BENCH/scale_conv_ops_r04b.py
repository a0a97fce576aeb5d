"""Scale-sanity leg for the r4b transcript operators on the 200 k-conv /
~2.9 M-turn bench-profile fixture (the same corpus as AB_r04.md's
conversation-operator leg — 70x the sf0.1 gate table). Single warm run per
operator, local[32]: the question is cost CLASS, not an A/B.

    python BENCH/scale_conv_ops_r04b.py [--convs 200000]
        [--out BENCH/scale_conv_ops_r04b.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--out", default="BENCH/scale_conv_ops_r04b.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.session import get_spark
    from ddsparkle.spark.transcript_ops import (
        conversation_contamination,
        per_conversation_latency_quantiles,
        sample_conversations,
        sft_pairs,
        token_quantiles_by_role,
        tool_latency_quantiles,
    )
    from ddsparkle.transcripts import transcripts_df

    spark = get_spark(
        "ddsparkle-scale-r04b", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            # synthetic text over-compresses; keep scan splits small enough
            # to parallelize (CLAUDE.md bench-writer convention)
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
        results["ops"][name] = {"wall_s": round(dt, 2), **out}
        print(json.dumps({name: results["ops"][name]}))

    # warm the scan cache once (not timed)
    df.select(F.count("*")).collect()

    leg(
        "sft_pairs",
        lambda: {"rows": sft_pairs(df, context_turns=3).count()},
    )
    eval_ids = sample_conversations(df, k=2000, seed=1).select("conv_id").distinct()
    eval_ids = eval_ids.localCheckpoint(eager=True)
    leg(
        "conversation_contamination(k=2000 eval convs)",
        lambda: {"flagged_convs": conversation_contamination(df, eval_ids).count()},
    )
    leg(
        "per_conversation_latency_quantiles",
        lambda: {"groups": per_conversation_latency_quantiles(df).count()},
    )
    leg(
        "token_quantiles_by_role",
        lambda: {"roles": token_quantiles_by_role(df).count()},
    )
    leg(
        "tool_latency_quantiles",
        lambda: {"tools": tool_latency_quantiles(df).count()},
    )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
