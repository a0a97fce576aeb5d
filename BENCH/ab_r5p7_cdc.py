"""snapshot_diff hash_compare A/B (r5 part 7): evidence for the cdc.py
claim that `hash_compare=True` is the 100-TB shape — only keys + 16-byte
digests enter the full-outer exchange, vs full text payloads on BOTH sides
in direct-compare mode.

Fixture: 200k wide rows (~2 KB deterministic INCOMPRESSIBLE text each,
~400 MB) as the old snapshot; the new snapshot derives 1% updates / 0.5%
inserts / 0.5% deletes by key residue. Text is 64 chained md5 blocks per
row (distinct inputs), so shuffle compression cannot shrink it — the
CLAUDE.md footgun (synthetic repeated text over-compresses) would
otherwise understate the full-compare leg's shuffle bytes. Legs are
interleaved same-epoch (per-leg minima); the (key, op) result SETS are
asserted identical up front. Shuffle bytes per leg come from the Spark UI
REST API (sum of shuffle-write bytes over the stages each leg ran), the
same instrumentation class AB_r03 used.

Run: python BENCH/ab_r5p7_cdc.py  ->  BENCH/ab_r5p7_cdc.json
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_r5p7_cdc.json")
N_ROWS = 200_000
ROUNDS = 5


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def _shuffle_write_bytes(spark):
    """Total shuffle-write bytes across all completed stages so far."""
    total = 0
    for st in _rest(spark, "stages?status=complete"):
        total += st.get("shuffleWriteBytes", 0)
    return total


def main():
    from pyspark.sql import functions as F

    from ddsparkle.spark.cdc import snapshot_diff
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-cdc",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # wide deterministic rows: ~2 KB of INCOMPRESSIBLE per-key text (64
    # md5 blocks of distinct inputs). Shuffle compression (on by default)
    # shrinks repeated text ~50x and would understate the full-compare
    # leg; md5 blocks are pseudo-random so compressed size ~= raw size.
    base = spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.md5(F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))),
            ),
        ).alias("text"),
        (F.col("id") % 7).cast("string").alias("role"),
    )
    old = base.filter(F.col("id") % 200 != 3)  # 0.5% only-in-new -> I
    new = (
        base.filter(F.col("id") % 200 != 7)  # 0.5% only-in-old -> D
        .withColumn(
            "text",
            F.when(
                F.col("k") % 100 == 11,  # 1% updates
                F.concat(F.lit("CHANGED "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    )
    old = old.persist()
    new = new.persist()
    old.count(), new.count()

    def leg_full():
        return (
            snapshot_diff(old, new, ["k"], ["text", "role"])
            .select("k", "op")
        )

    def leg_hash():
        return (
            snapshot_diff(old, new, ["k"], ["text", "role"], hash_compare=True)
            .select("k", "op")
        )

    # identical (key, op) sets before timing
    a = set(map(tuple, leg_full().collect()))
    b = set(map(tuple, leg_hash().collect()))
    assert a == b, (len(a), len(b))
    n_diff = len(a)

    def run(fn):
        s0 = _shuffle_write_bytes(spark)
        t0 = time.monotonic()
        fn().agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64("k"))).collect()
        dt = time.monotonic() - t0
        time.sleep(0.3)  # let the status store settle
        return dt, _shuffle_write_bytes(spark) - s0

    mins = {"full": 9e9, "hash": 9e9}
    sh = {"full": [], "hash": []}
    for _ in range(ROUNDS):
        for name, fn in (("full", leg_full), ("hash", leg_hash)):
            dt, sb = run(fn)
            mins[name] = min(mins[name], dt)
            sh[name].append(sb)

    result = {
        "n_rows": N_ROWS,
        "n_diff_rows": n_diff,
        "min_s": {k: round(v, 3) for k, v in mins.items()},
        "shuffle_bytes": {k: max(v) for k, v in sh.items()},
        "shuffle_ratio": round(max(sh["full"]) / max(1, max(sh["hash"])), 2),
        "note": (
            "full-compare shuffles both snapshots' text through the "
            "full-outer exchange; hash_compare ships 8-byte keys + 32-char "
            "digests — at 100 TB the exchange is the job, so the byte "
            "column is the one that scales"
        ),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
