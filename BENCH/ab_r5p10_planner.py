"""Same-epoch interleaved A/B for the sketch-informed join planner's
salted plan on a fanout-skewed equijoin: 2 hot conversations hold 20% of
the fact side AND a 64-row build block each, so the hot keys' join output
(2 x 200k x 64 = 25.6M rows) lands in ONE sort-merge task unless split.

Legs (interleaved, per-leg minima per bench policy):
  smj_aqeskew  plain shuffle join, AQE skew-join ON (Spark's own remedy —
               the honest control; note AQE can only re-plan AFTER the map
               stage materializes, the planner decides BEFORE)
  smj_noskew   plain shuffle join, AQE skew-join OFF (what a static plan
               does at 100 TB when AQE's per-partition stats miss or the
               join is not an eligible SMJ)
  salted       the planner's pick: probe once (cost reported separately),
               hot rows scattered 16 ways probe-side / replicated 16 ways
               build-side

Row-equality is enforced every round with an order-free bit_xor(xxhash64)
digest over every output column plus exact counts (Catalyst would rewrite
a bare count() over the join; the digest forces full evaluation).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

import argparse

ROUNDS = 3
HOT_FACT = 200_000  # fact rows per hot conv
HOT_BUILD = 64  # build rows per hot conv (CLI-overridable: the fanout knob)
N_UNIF = 1_600_000  # uniform fact rows
N_CONVS = 100_000  # uniform conv universe
BUILD_PER_CONV = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-build", type=int, default=HOT_BUILD)
    ap.add_argument("--out", default="BENCH/ab_r5p10_planner.json")
    args = ap.parse_args()
    hot_build = args.hot_build
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        # the 100 TB regime under test: BOTH sides too big to broadcast —
        # locally Spark would broadcast the 800k-row build side and no
        # skew would exist, so pin the shuffle-join physical space
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ddsparkle.spark.planner import sketch_informed_join

    unif = spark.range(N_UNIF).select(
        F.concat(F.lit("c"), (F.col("id") % N_CONVS).cast("string")).alias("conv_id"),
        (F.col("id") * 7 % 1000).alias("fv"),
    )
    hot = spark.range(2 * HOT_FACT).select(
        F.concat(F.lit("hot"), (F.col("id") % 2).cast("string")).alias("conv_id"),
        (F.col("id") * 11 % 1000).alias("fv"),
    )
    fact = unif.unionByName(hot).repartition(32).persist()

    bunif = spark.range(N_CONVS * BUILD_PER_CONV).select(
        F.concat(F.lit("c"), (F.col("id") % N_CONVS).cast("string")).alias("cid"),
        (F.col("id") % 97).alias("bv"),
    )
    bhot = spark.range(2 * hot_build).select(
        F.concat(F.lit("hot"), (F.col("id") % 2).cast("string")).alias("cid"),
        (F.col("id") % 97).alias("bv"),
    )
    build = bunif.unionByName(bhot).repartition(32).persist()
    n_fact, n_build = fact.count(), build.count()

    # price the join once; broadcast disabled so the decision exercises the
    # skew rule (the dim side is small here only because the fixture is —
    # the 100 TB shape has a corpus-scale build side too)
    t0 = time.monotonic()
    salted_df, decision = sketch_informed_join(
        fact, build, left_on="conv_id", right_on="cid",
        broadcast_rows=0, skew_factor=2, parts=32, salt=16,
    )
    probe_s = time.monotonic() - t0
    plain = fact.join(build, fact["conv_id"] == build["cid"], "inner")

    def digest(df):
        cols = [F.col(c) for c in df.columns]
        row = df.agg(
            F.bit_xor(F.xxhash64(*cols)).alias("h"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return (row["h"], row["n"])

    def leg(df, skew_on):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        t0 = time.monotonic()
        d = digest(df)
        return time.monotonic() - t0, d

    legs = [
        ("smj_aqeskew", plain, True),
        ("smj_noskew", plain, False),
        ("salted", salted_df, True),
    ]
    mins = {n: float("inf") for n, _, _ in legs}
    rounds, digests_equal = [], True
    for _ in range(ROUNDS):
        rnd, ds = {}, set()
        for name, df, skew_on in legs:
            dt, d = leg(df, skew_on)
            rnd[name] = round(dt, 3)
            mins[name] = min(mins[name], dt)
            ds.add(d)
        digests_equal = digests_equal and len(ds) == 1
        rounds.append(rnd)

    report = {
        "bench": "planner salted join vs plain SMJ (fanout skew)",
        "fact_rows": n_fact,
        "build_rows": n_build,
        "hot_build_rows_per_conv": hot_build,
        "hot_output_rows": 2 * HOT_FACT * hot_build,
        "total_output_rows": N_UNIF * BUILD_PER_CONV + 2 * HOT_FACT * hot_build,
        "decision": {
            "strategy": decision["strategy"],
            "hot_keys": sorted(map(str, decision["hot_keys"])),
            "join_est": decision["join_est_num"] // decision["n_counters"],
        },
        "probe_s": round(probe_s, 3),
        "rounds": rounds,
        **{f"min_{n}_s": round(v, 3) for n, v in mins.items()},
        "speedup_vs_noskew": round(mins["smj_noskew"] / mins["salted"], 3),
        "speedup_vs_aqeskew": round(mins["smj_aqeskew"] / mins["salted"], 3),
        "digests_equal_all_rounds": digests_equal,
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
