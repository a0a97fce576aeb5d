"""Same-epoch interleaved A/B: Mann-Whitney rank algebra over DISTINCT
values (shipped) vs the naive per-row global rank window.

Both compute identical statistics (asserted per round: n/u2/tie_term/z2
byte-equal). The shipped design sorts only the distinct-value frame
(|V| rows after a map-side aggregate); the naive design global-sorts ALL
rows into one partition for rank() — the cost class the operator exists
to avoid. Per bench policy: interleaved same-epoch rounds, per-leg MINIMA,
no cross-epoch claims.

Usage: python BENCH/ab_r5p11_mw.py [--rows 10000000] [--card 1000]
       -> BENCH/ab_r5p11_mw.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--card", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import (
        MANN_WHITNEY_RB_EXPR,
        MANN_WHITNEY_Z2_EXPR,
        mann_whitney_u,
    )
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        master="local[32]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": "32",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic skewed-ties fixture: integer outcome, xxhash group
    df = (
        spark.range(args.rows)
        .select(
            (F.xxhash64("id") % 2 == 0).alias("g"),
            (F.abs(F.xxhash64("id", F.lit(1))) % args.card).alias("v"),
        )
        .localCheckpoint(eager=True)  # freeze input outside the timed legs
    )

    def naive(sdf):
        # per-row midrank: 2*midrank = 2*rank + cnt - 1; rank() needs the
        # GLOBAL sort of all rows into one partition
        w_rank = Window.orderBy("v")
        w_ties = Window.partitionBy("v")
        ranked = sdf.select(
            "g",
            "v",
            (2 * F.rank().over(w_rank) + F.count("*").over(w_ties) - 1).alias(
                "mr2"
            ),
        )
        per_v = sdf.groupBy("v").agg(F.count("*").alias("c"))
        tie = per_v.agg(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias(
                "tie_term"
            )
        )
        tot = ranked.agg(
            F.sum(F.col("g").cast("long")).alias("n1"),
            F.sum((~F.col("g")).cast("long")).alias("n2"),
            F.sum(F.when(F.col("g"), F.col("mr2")).otherwise(0)).alias(
                "__two_r1"
            ),
        )
        staged = (
            tot.crossJoin(tie)
            .select(
                "n1",
                "n2",
                (F.col("__two_r1") - F.col("n1") * (F.col("n1") + 1)).alias(
                    "u2_true"
                ),
                "tie_term",
            )
            .select(
                "n1",
                "n2",
                "u2_true",
                "tie_term",
                (F.col("u2_true") - F.col("n1") * F.col("n2")).alias("__d"),
                (F.col("n1") + F.col("n2")).alias("__n"),
            )
        )
        return staged.select(
            F.col("n1").alias("n_true"),
            F.col("n2").alias("n_false"),
            "u2_true",
            "tie_term",
            F.expr(MANN_WHITNEY_Z2_EXPR).alias("z2"),
            F.expr(MANN_WHITNEY_RB_EXPR).alias("rank_biserial"),
            (F.expr(MANN_WHITNEY_Z2_EXPR) > F.lit(3.8416)).alias(
                "significant_95"
            ),
        )

    legs = {
        "A_naive_global_rank": lambda: naive(df).collect()[0],
        "B_distinct_value_window": lambda: mann_whitney_u(
            df, "g", "v"
        ).collect()[0],
    }
    mins = {k: float("inf") for k in legs}
    rounds = []
    results = {}
    for _ in range(args.rounds):
        rnd = {}
        for name, fn in legs.items():
            t0 = time.monotonic()
            row = fn()
            dt = time.monotonic() - t0
            rnd[name] = round(dt, 3)
            mins[name] = min(mins[name], dt)
            results[name] = (
                row.n_true, row.n_false, row.u2_true, row.tie_term,
                round(row.z2, 10),
            )
        assert results["A_naive_global_rank"] == results[
            "B_distinct_value_window"
        ], results
        rounds.append(rnd)

    out = {
        "rows": args.rows,
        "cardinality": args.card,
        "rounds": rounds,
        "min_sec": {k: round(v, 3) for k, v in mins.items()},
        "speedup_B_over_A": round(
            mins["A_naive_global_rank"] / mins["B_distinct_value_window"], 2
        ),
        "results_equal": True,
        "stat": list(results["B_distinct_value_window"]),
    }
    path = os.path.join(os.path.dirname(__file__), "ab_r5p11_mw.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
