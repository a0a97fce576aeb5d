"""Same-epoch interleaved A/B: corr_matrix's ONE-aggregate k-measure
correlation screen vs the naive approach users actually run — k(k-1)/2
separate pairwise jobs (each a full scan + aggregate; here linreg calls,
whose finals corr_matrix matches bit-for-bit, so outputs are compared
for exact equality on (r2, t2, sign) each round). Per bench policy:
per-leg minima over interleaved rounds; host drift makes absolute totals
meaningless. The structural claim: k=5 measures -> 10 pairwise scans
collapse into one."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 5
COLS = ["n_turns", "total_chars", "n_tool_turns", "duration_s", "hash_mod"]


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from ddsparkle.spark.dataops import (
        _portable_line_key,
        corr_matrix,
        linreg,
    )
    from ddsparkle.spark.transcript_ops import conversation_stats

    tr = spark.read.parquet(E._transcripts_path(spark, SF))
    # replicate conversations so the scan is non-trivial at local scale
    # (suffix the group key so replicas are distinct conversations)
    reps = []
    for i in range(8):
        reps.append(
            tr.withColumn(
                "conv_id", F.concat(F.col("conv_id"), F.lit(f"#{i}"))
            )
        )
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    stats = conversation_stats(big).withColumn(
        "hash_mod",
        (_portable_line_key(F.col("conv_id")) % 1000000).cast("double"),
    )
    # the input to both legs is the same materialized per-conv frame so
    # the A/B prices the AGGREGATION strategy, not conv_stats itself
    stats = stats.repartition(32).persist()
    stats.count()

    def leg_one_agg():
        return {
            (r.x_col, r.y_col): (r.r2, r.t2, r.sign)
            for r in corr_matrix(stats, COLS).collect()
        }

    def leg_pairwise():
        out = {}
        for i in range(len(COLS)):
            for j in range(i + 1, len(COLS)):
                r = linreg(
                    stats, COLS[i], COLS[j], x_decimals=0, y_decimals=0
                ).collect()[0]
                out[(COLS[i], COLS[j])] = (r.r2, r.t2, r.slope_sign)
        return out

    mins = {"one_agg": float("inf"), "pairwise": float("inf")}
    equal = True
    rounds = []
    for _ in range(ROUNDS):
        rnd = {}
        res = {}
        for name, fn in (("pairwise", leg_pairwise), ("one_agg", leg_one_agg)):
            t0 = time.monotonic()
            res[name] = fn()
            dt = time.monotonic() - t0
            rnd[name] = round(dt, 3)
            mins[name] = min(mins[name], dt)
        equal = equal and res["pairwise"] == res["one_agg"]
        rounds.append(rnd)
    report = {
        "bench": "corr_matrix one-agg vs k(k-1)/2 pairwise jobs",
        "sf": 0.1,
        "replicas": 8,
        "k_cols": len(COLS),
        "n_pairs": len(COLS) * (len(COLS) - 1) // 2,
        "rounds": rounds,
        "min_pairwise_s": round(mins["pairwise"], 3),
        "min_one_agg_s": round(mins["one_agg"], 3),
        "speedup_min": round(mins["pairwise"] / mins["one_agg"], 3),
        "outputs_equal_all_rounds": equal,
    }
    print(json.dumps(report))
    with open("BENCH/ab_r5p12_corr.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
