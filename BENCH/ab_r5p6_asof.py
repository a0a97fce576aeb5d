"""Same-epoch interleaved A/B: AS-OF join formulations.

- **A** (naive): equi-join on the key with the inequality as a filter,
  then argmax-per-left-row (max_by over a (ts, payload) struct after a
  groupBy) — the formulation users write first. Its intermediate is the
  FULL per-key cross product of left x right rows (fanout = rows-per-key
  squared), then a second exchange for the reduce.
- **B** (shipped): `dataops.asof_join` — the union-window pattern: one
  exchange + sort of (left + right) narrow rows, a running
  `last(payload, ignorenulls)` window, NO join node (plan-pinned in
  tests/test_plans.py).

Both legs answer the identical question (most recent strictly-prior
right row per left row), so the RESULT SETS are asserted equal —
per-round full set equality, not count equality (the ab_r04_verify
lesson, per ADVICE r4). Interleaved A/B/A/B rounds; per-query minima
reported (the bench policy for a drifting host).

Fixture: synthetic (key, ts) streams — `--keys` users, `--left` point
rows and `--right` reference rows per key on average, timestamps from a
second deterministic hash; right side deduped per (key, ts) by construction.

    python BENCH/ab_r5p6_asof.py [--keys 20000] [--left 4000000]
        [--right 4000000] [--rounds 3] [--out BENCH/ab_r5p6_asof.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=40_000)
    ap.add_argument("--left", type=int, default=2_000_000)
    ap.add_argument("--right", type=int, default=2_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r5p6_asof.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import asof_join
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic fixture: ids 0..n-1, key = xxhash-bucketed, ts = LCG
    def synth(n, keys, salt, ts_mod):
        return (
            spark.range(n)
            .select(
                F.col("id"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(keys)).alias("k"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(salt * 9973)), F.lit(ts_mod)).alias(
                    "ts"
                ),
            )
        )

    left = synth(args.left, args.keys, 1, 10_000_000).withColumnRenamed("id", "lid")
    right = (
        synth(args.right, args.keys, 2, 10_000_000)
        .groupBy("k", "ts")
        .agg(F.max("id").alias("val"))  # unique per (key, ts) — the contract
    )
    left = left.persist()
    right = right.persist()
    print("fixture:", left.count(), "left,", right.count(), "right rows", flush=True)

    # explicit aliases for the naive leg
    la, ra = left.alias("l"), right.alias("r")

    def run_naive():
        j = la.join(ra, F.col("l.k") == F.col("r.k")).filter(
            F.col("r.ts") < F.col("l.ts")
        )
        best = (
            j.groupBy(F.col("l.lid").alias("lid"))
            .agg(F.max(F.struct(F.col("r.ts"), F.col("r.val"))).alias("b"))
            .select("lid", F.col("b.val").alias("val"))
        )
        # left-outer semantics: rows with no match come back NULL
        out = left.select("lid").join(best, "lid", "left")
        return out

    def run_shipped():
        out = asof_join(
            left.select("k", "ts", "lid"),
            right.withColumnRenamed("ts", "rts"),
            ["k"],
            left_ts="ts",
            right_ts="rts",
            payload_cols=["val"],
            strict=True,
        ).select("lid", "val")
        return out

    def collect_set(df):
        return set(map(tuple, df.collect()))

    # result-set equality once up front (full sets, not counts)
    sa = collect_set(run_naive())
    sb = collect_set(run_shipped())
    assert sa == sb, f"result sets differ: {len(sa)} vs {len(sb)}"
    print("result sets equal:", len(sa), "rows", flush=True)

    times = {"naive": [], "shipped": []}
    for r in range(args.rounds):
        for name, fn in (("naive", run_naive), ("shipped", run_shipped)):
            # a payload checksum, not count(): Catalyst rewrites count()
            # over a left-join-with-unique-right / unused-window plan into
            # count(left) and both legs collapse to the scan
            t0 = time.monotonic()
            row = fn().agg(
                F.expr("bit_xor(xxhash64(lid, val))").alias("h"),
                F.count("*").alias("n"),
            ).collect()[0]
            n = row["n"]
            dt = time.monotonic() - t0
            times[name].append(round(dt, 3))
            print(f"round {r} {name}: {dt:.2f}s ({n} rows)", flush=True)

    res = {
        "fixture": {
            "keys": args.keys,
            "left": args.left,
            "right": args.right,
        },
        "rounds": times,
        "min_naive_s": min(times["naive"]),
        "min_shipped_s": min(times["shipped"]),
        "speedup_min": round(min(times["naive"]) / min(times["shipped"]), 3),
        "result_rows": len(sa),
        "result_sets_equal": True,
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
