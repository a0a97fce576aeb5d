"""Same-epoch interleaved A/B: per-row percentile scoring.

- **A** (baseline): `percent_rank()` over (PARTITION BY role ORDER BY
  text_len) — the exact answer, but the window SORTS every partition's
  full row set: with 4 roles over 2.9 M turns, 4 giant sort tasks own the
  job regardless of core count (and at 10^12 rows per-group sorts are the
  job). This is the formulation the operator exists to avoid.
- **B** (shipped): `agg.percentile_rank_scores` — two KB-scale sketch
  stages + one row-local Arrow scoring pass; approximate with the
  mapping's relative-accuracy contract on the value axis.

The legs answer the same question with different contracts (exact vs
alpha-accurate), so the equality check is an AGREEMENT metric, not a
hash: mean and max |rank_A - rank_B| over all scored rows are recorded
and must stay small (mean well under alpha-scale rank noise); row counts
must match exactly.

    python BENCH/ab_r05_pctrank.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r05_pctrank.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"  # shared with the other r5 A/Bs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r05_pctrank.json")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ddsparkle.config import SketchConfig
    from ddsparkle.spark.agg import percentile_rank_scores
    from ddsparkle.spark.session import get_spark
    from ddsparkle.transcripts import transcripts_df

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
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
    df = (
        spark.read.parquet(path)
        .select("conv_id", "turn_idx", "role", F.length("text").alias("text_len"))
    )
    n_turns = df.count()  # warm the scan once, untimed
    cfg = SketchConfig(
        mapping_kind="log",
        relative_accuracy=0.01,
        store_policy="unbounded",
        max_bins=0,
        track_exact_stats=False,
    )

    def leg_a():
        w = Window.partitionBy("role").orderBy("text_len")
        out = df.withColumn("pr", F.percent_rank().over(w))
        row = out.agg(
            F.count("pr").alias("n"), F.sum("pr").alias("s")
        ).collect()[0]
        return int(row["n"]), float(row["s"])

    def leg_b():
        out = percentile_rank_scores(df, "text_len", by="role", config=cfg)
        row = out.agg(
            F.count("pct_rank").alias("n"), F.sum("pct_rank").alias("s")
        ).collect()[0]
        return int(row["n"]), float(row["s"])

    results = {"n_convs": args.convs, "n_turns": n_turns, "rounds": []}
    mins = {"A": float("inf"), "B": float("inf")}
    for _ in range(args.rounds):
        rnd = {}
        for leg, fn in (("A", leg_a), ("B", leg_b)):
            t0 = time.monotonic()
            n, s = fn()
            dt = time.monotonic() - t0
            rnd[f"{leg}_n"] = n
            rnd[f"{leg}_wall"] = round(dt, 3)
            mins[leg] = min(mins[leg], dt)
        rnd["counts_equal"] = rnd["A_n"] == rnd["B_n"]
        results["rounds"].append(rnd)
        print(json.dumps(rnd))

    # agreement metric, once (untimed): join the two rank columns
    w = Window.partitionBy("role").orderBy("text_len")
    a = df.withColumn("pr", F.percent_rank().over(w))
    b = percentile_rank_scores(df, "text_len", by="role", config=cfg)
    joined = a.join(
        b.select("conv_id", "turn_idx", "pct_rank"), ["conv_id", "turn_idx"]
    )
    agg = joined.agg(
        F.mean(F.abs(F.col("pr") - F.col("pct_rank"))).alias("mean_abs"),
        F.max(F.abs(F.col("pr") - F.col("pct_rank"))).alias("max_abs"),
    ).collect()[0]
    results["rank_agreement_mean_abs"] = round(float(agg["mean_abs"]), 6)
    results["rank_agreement_max_abs"] = round(float(agg["max_abs"]), 6)
    results["wall_min_A"] = round(mins["A"], 3)
    results["wall_min_B"] = round(mins["B"], 3)
    results["speedup"] = round(mins["A"] / mins["B"], 2)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
