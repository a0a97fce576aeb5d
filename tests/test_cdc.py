"""Unit tests for ddsparkle.spark.cdc (snapshot diff / change-log merge /
SCD2 history) against hand-computed expectations, including the NULL-safe
compare matrix, delete/tie semantics, and collapse induction."""

import datetime as dt

import pytest

from ddsparkle.spark.cdc import apply_changes, scd2_history, snapshot_diff

pytestmark = pytest.mark.spark


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_snapshot_diff_iud_matrix(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),   # unchanged
            (2, "b", 20),   # value update
            (3, None, 30),  # NULL -> value update
            (4, "d", 40),   # deleted
            (5, "e", None), # NULL value on both sides: unchanged
            (6, None, 60),  # NULL string on both sides: unchanged
        ],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 21),
            (3, "c", 30),
            (5, "e", None),
            (6, None, 60),
            (7, "g", 70),   # inserted
        ],
        "k int, s string, v int",
    )
    out = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert set(out) == {2, 3, 4, 7}
    assert out[2]["op"] == "U" and out[2]["changed_cols"] == "v"
    assert out[3]["op"] == "U" and out[3]["changed_cols"] == "s"
    assert out[3]["old_s"] is None and out[3]["new_s"] == "c"
    assert out[4]["op"] == "D" and out[4]["changed_cols"] == ""
    assert out[4]["new_s"] is None and out[4]["old_s"] == "d"
    assert out[7]["op"] == "I" and out[7]["old_v"] is None


def test_snapshot_diff_value_to_null_is_update(spark):
    old = spark.createDataFrame([(1, "x")], "k int, s string")
    new = spark.createDataFrame([(1, None)], "k int, s string")
    rows = snapshot_diff(old, new, ["k"], ["s"]).collect()
    assert len(rows) == 1 and rows[0]["op"] == "U"
    assert rows[0]["changed_cols"] == "s"


def test_snapshot_diff_multi_change_cols_schema_order(spark):
    old = spark.createDataFrame([(1, "x", 1, 1.0)], "k int, s string, v int, w double")
    new = spark.createDataFrame([(1, "y", 1, 2.0)], "k int, s string, v int, w double")
    rows = snapshot_diff(old, new, ["k"], ["s", "v", "w"]).collect()
    assert rows[0]["changed_cols"] == "s,w"


def test_snapshot_diff_hash_compare_mode(spark):
    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, None, 3)], "k int, s string, v int"
    )
    new = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 9), (4, "d", 4)], "k int, s string, v int"
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["s", "v"], hash_compare=True).collect()}
    assert set(out) == {2, 3, 4}
    assert out[2]["op"] == "U" and out[2]["changed_cols"] == "*"
    assert out[3]["op"] == "D" and out[4]["op"] == "I"
    # hash mode carries no per-column payloads
    assert "old_s" not in snapshot_diff(old, new, ["k"], ["s"], hash_compare=True).columns


def test_snapshot_diff_null_distinct_from_empty_in_hash(spark):
    # NULL and '' must hash differently (the \x00 sentinel)
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "")], "k int, s string")
    rows = snapshot_diff(old, new, ["k"], ["s"], hash_compare=True).collect()
    assert len(rows) == 1 and rows[0]["op"] == "U"


def test_apply_changes_upsert_delete_untouched(spark):
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, 21.0, _ts("2024-01-01T00:00:01"), 1, "U"),
            (2, 22.0, _ts("2024-01-01T00:00:02"), 2, "U"),  # later wins
            (3, 0.0, _ts("2024-01-01T00:00:01"), 3, "D"),   # delete
            (4, 40.0, _ts("2024-01-01T00:00:01"), 4, "I"),  # new key
        ],
        "k int, v double, ts timestamp, seq long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changes(base, changes, ["k"], ["v"], seq_col="seq").collect()
    }
    assert got == {1: 10.0, 2: 22.0, 4: 40.0}


def test_apply_changes_same_ts_seq_breaks_tie(spark):
    base = spark.createDataFrame([(1, 0.0)], "k int, v double")
    t = _ts("2024-01-01T00:00:00")
    changes = spark.createDataFrame(
        [(1, 5.0, t, 1, "U"), (1, 7.0, t, 2, "U")],
        "k int, v double, ts timestamp, seq long, op string",
    )
    got = apply_changes(base, changes, ["k"], ["v"], seq_col="seq").collect()
    assert len(got) == 1 and got[0]["v"] == 7.0


def test_apply_changes_delete_then_reinsert_latest_wins(spark):
    base = spark.createDataFrame([(1, 0.0)], "k int, v double")
    changes = spark.createDataFrame(
        [
            (1, 0.0, _ts("2024-01-01T00:00:01"), 1, "D"),
            (1, 9.0, _ts("2024-01-01T00:00:02"), 2, "U"),
        ],
        "k int, v double, ts timestamp, seq long, op string",
    )
    got = apply_changes(base, changes, ["k"], ["v"], seq_col="seq").collect()
    assert len(got) == 1 and got[0]["v"] == 9.0


def test_scd2_collapse_and_intervals(spark):
    changes = spark.createDataFrame(
        [
            ("c1", "open", _ts("2024-01-01T00:00:00")),
            ("c1", "open", _ts("2024-01-01T00:01:00")),   # collapsed
            ("c1", "closed", _ts("2024-01-01T00:02:00")),
            ("c1", "open", _ts("2024-01-01T00:03:00")),   # re-open kept
            ("c2", None, _ts("2024-01-01T00:00:00")),     # first row, NULL attr
            ("c2", None, _ts("2024-01-01T00:01:00")),     # collapsed (NULL==NULL)
            ("c2", "x", _ts("2024-01-01T00:02:00")),
        ],
        "k string, state string, ts timestamp",
    )
    out = scd2_history(changes, ["k"], ["state"], ts_col="ts")
    rows = sorted(out.collect(), key=lambda r: (r["k"], r["valid_from_us"]))
    c1 = [r for r in rows if r["k"] == "c1"]
    assert [r["state"] for r in c1] == ["open", "closed", "open"]
    # intervals chain: each valid_to == next valid_from; last open
    assert c1[0]["valid_to_us"] == c1[1]["valid_from_us"]
    assert c1[1]["valid_to_us"] == c1[2]["valid_from_us"]
    assert c1[2]["valid_to_us"] is None and c1[2]["is_current"]
    assert not c1[0]["is_current"] and not c1[1]["is_current"]
    c2 = [r for r in rows if r["k"] == "c2"]
    assert [r["state"] for r in c2] == [None, "x"]  # NULL first row kept once


def test_scd2_no_collapse_keeps_every_change(spark):
    changes = spark.createDataFrame(
        [
            ("c1", "a", _ts("2024-01-01T00:00:00"), 0),
            ("c1", "a", _ts("2024-01-01T00:00:00"), 1),  # same ts, seq orders
            ("c1", "b", _ts("2024-01-01T00:01:00"), 2),
        ],
        "k string, state string, ts timestamp, seq int",
    )
    out = scd2_history(changes, ["k"], ["state"], seq_col="seq", collapse=False)
    rows = sorted(out.collect(), key=lambda r: (r["valid_from_us"], r["valid_to_us"] or 1 << 62))
    assert len(rows) == 3
    assert rows[0]["valid_to_us"] == rows[0]["valid_from_us"]  # zero-width dup
    assert rows[-1]["is_current"]


def test_scd2_matches_duckdb_twin_on_synthetic(spark, tmp_path):
    """Operator vs oracle.scd2_history_sql on a written parquet (the same
    comparison shape the entry gate uses)."""
    import duckdb

    from ddsparkle.oracle import scd2_history_sql

    changes = spark.createDataFrame(
        [
            ("c1", "a", "t1", _ts("2024-01-01T00:00:00"), 0),
            ("c1", "a", "t1", _ts("2024-01-01T00:05:00"), 1),
            ("c1", "b", "t1", _ts("2024-01-01T00:10:00"), 2),
            ("c1", "b", None, _ts("2024-01-01T00:15:00"), 3),
            ("c2", None, None, _ts("2024-01-01T00:00:00"), 0),
            ("c2", "z", None, _ts("2024-01-01T00:30:00"), 1),
        ],
        "k string, a string, b string, ts timestamp_ntz, seq int",
    )
    path = str(tmp_path / "chg.parquet")
    changes.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    got = (
        scd2_history(df, ["k"], ["a", "b"], seq_col="seq")
        .orderBy("k", "valid_from_us")
        .toPandas()
    )
    sql = scd2_history_sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')",
        ["k"], ["a", "b"], seq_col="seq",
    )
    want = duckdb.sql(sql + " ORDER BY k, valid_from_us").df()
    assert got["valid_from_us"].tolist() == want["valid_from_us"].tolist()
    assert got["a"].tolist() == want["a"].tolist()
    assert (
        got["valid_to_us"].fillna(-1).astype("int64").tolist()
        == want["valid_to_us"].fillna(-1).astype("int64").tolist()
    )
    assert got["is_current"].tolist() == want["is_current"].tolist()
