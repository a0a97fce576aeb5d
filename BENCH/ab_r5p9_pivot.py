"""Same-epoch interleaved A/B: Spark native .pivot(col, values) (TWO
aggregate stages + TWO exchanges via pivotfirst) vs dataops.pivot_report's
conditional aggregation (ONE map-side-combined exchange) on the identical
day x event-type count crosstab. Outputs are compared for equality each
round (native NULL cells coalesced to 0 — the count semantics the
conditional form gives directly). Per bench policy: per-leg minima over
interleaved rounds; host drift makes absolute totals meaningless."""
import json
import time

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 5
TYPES = ["click", "error", "purchase", "signup", "view"]


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ddsparkle.spark.dataops import pivot_report

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
    )
    # replicate the frame so the work is non-trivial at local scale
    big = ev
    for _ in range(4):
        big = big.unionByName(big)
    big = big.repartition(32).persist()
    big.count()

    def leg_native():
        out = big.groupBy("day").pivot("event_type", TYPES).agg(
            F.count(F.lit(1))
        )
        return out.select(
            "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in TYPES]
        )

    def leg_cond():
        return pivot_report(
            big, "day", "event_type", TYPES,
            lambda c: F.count(F.when(c, F.lit(1))),
        )

    mins = {"native": float("inf"), "conditional": float("inf")}
    equal = True
    rounds = []
    for r in range(ROUNDS):
        rnd = {}
        res = {}
        for name, fn in (("native", leg_native), ("conditional", leg_cond)):
            t0 = time.monotonic()
            rows = fn().collect()
            dt = time.monotonic() - t0
            rnd[name] = round(dt, 3)
            mins[name] = min(mins[name], dt)
            res[name] = sorted(map(tuple, rows))
        equal = equal and res["native"] == res["conditional"]
        rounds.append(rnd)
    report = {
        "bench": "pivot native-vs-conditional",
        "sf": 0.1,
        "replicas": 16,
        "rounds": rounds,
        "min_native_s": round(mins["native"], 3),
        "min_conditional_s": round(mins["conditional"], 3),
        "speedup_min": round(mins["native"] / mins["conditional"], 3),
        "outputs_equal_all_rounds": equal,
    }
    print(json.dumps(report))
    with open("BENCH/ab_r5p9_pivot.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
