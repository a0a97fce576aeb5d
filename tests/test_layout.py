"""Tests for ddsparkle.spark.layout — Morton key correctness vs an
independent pure-Python bit-by-bit reference (the AMS lesson: pin shared
conventions against an independent derivation, not a self-consistent one),
cross-engine equality with oracle.zorder_key_sql, and the actual layout
property: z-ordered parquet row groups cover small rectangles of the key
space where a single-key sort covers full-width stripes."""

import random

import pytest

from ddsparkle.spark.layout import rowgroup_stats, zorder_key, zorder_write

pytestmark = pytest.mark.spark


def _morton_ref(vals, nbits):
    """Independent reference: interleave bit-by-bit, column i at position
    i + k*len(vals)."""
    out = 0
    for k in range(nbits):
        for i, v in enumerate(vals):
            out |= ((v >> k) & 1) << (k * len(vals) + i)
    return out


def test_zorder_key_2col_exhaustive_small(spark):
    grid = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(grid, "a int, b int")
    got = {
        (r["a"], r["b"]): r["zkey"]
        for r in zorder_key(
            df, ["a", "b"], bits=3, ranges={"a": (0, 7), "b": (0, 7)}
        ).collect()
    }
    for a, b in grid:
        assert got[(a, b)] == _morton_ref([a, b], 3), (a, b)


def test_zorder_key_3col_random(spark):
    random.seed(7)
    rows = [
        tuple(random.randrange(0, 1 << 16) for _ in range(3)) for _ in range(64)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    rng = {c: (0, (1 << 16) - 1) for c in "abc"}
    got = {
        (r["a"], r["b"], r["c"]): r["zkey"]
        for r in zorder_key(df, ["a", "b", "c"], bits=16, ranges=rng).collect()
    }
    for t in rows:
        assert got[t] == _morton_ref(list(t), 16)


def test_zorder_key_normalization_and_nulls(spark):
    # range 1000..9000 into 2 bits: step = (8000 >> 2) + 1 = 2001
    df = spark.createDataFrame(
        [(1000, 0), (3000, 0), (5003, 0), (9000, 0), (None, 0)], "v long, w long"
    )
    out = {
        r["v"]: r["zkey"]
        for r in zorder_key(
            df, ["v", "w"], bits=2, ranges={"v": (1000, 9000), "w": (0, 3)}
        ).collect()
    }
    # scaled = (v-1000) // 2001 -> 0,0,2,3; NULL -> slot 0
    assert out[1000] == _morton_ref([0, 0], 2)
    assert out[3000] == _morton_ref([0, 0], 2)
    assert out[5003] == _morton_ref([2, 0], 2)
    assert out[9000] == _morton_ref([3, 0], 2)
    assert out[None] == _morton_ref([0, 0], 2)


def test_zorder_key_auto_ranges_matches_explicit(spark):
    rows = [(i * 37 % 1000, i * 91 % 500) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    auto = zorder_key(df, ["a", "b"], bits=8).orderBy("a", "b").collect()
    mn_a, mx_a = min(r[0] for r in rows), max(r[0] for r in rows)
    mn_b, mx_b = min(r[1] for r in rows), max(r[1] for r in rows)
    exp = (
        zorder_key(
            df, ["a", "b"], bits=8, ranges={"a": (mn_a, mx_a), "b": (mn_b, mx_b)}
        )
        .orderBy("a", "b")
        .collect()
    )
    assert [r["zkey"] for r in auto] == [r["zkey"] for r in exp]


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    with pytest.raises(ValueError):
        zorder_key(df, ["a"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c", "d"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=40)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c"], bits=21)


def test_zorder_key_matches_duckdb_twin(spark, tmp_path):
    import duckdb

    from ddsparkle.oracle import zorder_key_sql

    random.seed(3)
    rows = [
        (random.randrange(0, 10**9), random.randrange(0, 10**12))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    path = str(tmp_path / "zin.parquet")
    df.write.mode("overwrite").parquet(path)
    got = (
        zorder_key(spark.read.parquet(path), ["a", "b"], bits=16)
        .orderBy("a", "b")
        .toPandas()
    )
    sql = zorder_key_sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')", ["a", "b"], bits=16
    )
    want = duckdb.sql(sql + " ORDER BY a, b").df()
    assert got["zkey"].tolist() == want["zkey"].tolist()


def test_zorder_write_bounds_worstcase_pruning(spark, tmp_path, sf_dir):
    """The layout property itself: a single-key (ts) sort prunes perfectly
    on ts and NOT AT ALL on user_id — its worst queried dimension touches
    every row group. Z-order bounds the worst case: BOTH a user_id-only
    predicate and a ts-only predicate skip most row groups. (With k row
    groups a 1-D sort's mean bounding-box AREA already matches z-order's
    ~1/k — area is not the win; worst-dimension pruning is.)"""
    from pyspark.sql import functions as F

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000))
            .cast("long")
            .alias("ts_s"),
        )
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, ["user_id", "ts_s"], num_files=32, block_size=64 * 1024)
    (
        ev.repartitionByRange(32, "ts_s")
        .sortWithinPartitions("ts_s")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(lpath)
    )
    assert spark.read.parquet(zpath).count() == ev.count()

    b = ev.select(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).collect()[0]
    mid_u = (b[0] + b[1]) // 2
    t_lo = b[2] + (b[3] - b[2]) * 49 // 100
    t_hi = b[2] + (b[3] - b[2]) * 51 // 100  # 2% time window

    def touched(path, col, lo, hi):
        gs = rowgroup_stats(path, ["user_id", "ts_s"])
        assert len(gs) >= 16, f"expected many row groups, got {len(gs)}"
        hit = sum(
            1 for g in gs if not (g[f"{col}_max"] < lo or g[f"{col}_min"] > hi)
        )
        return hit / len(gs)

    lin_user = touched(lpath, "user_id", mid_u, mid_u)
    lin_ts = touched(lpath, "ts_s", t_lo, t_hi)
    z_user = touched(zpath, "user_id", mid_u, mid_u)
    z_ts = touched(zpath, "ts_s", t_lo, t_hi)
    # ts-sorted layout cannot prune the user query at all
    assert lin_user > 0.9, lin_user
    assert lin_ts < 0.3, lin_ts
    # z-order prunes substantially on BOTH dimensions: worst case bounded
    assert max(z_user, z_ts) < 0.6, (z_user, z_ts)
    assert max(z_user, z_ts) < 0.6 * max(lin_user, lin_ts), (z_user, z_ts)
