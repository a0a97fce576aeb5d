"""asof_join (union-window pattern) and range_join (interval binning)."""

import pytest

pytestmark = pytest.mark.spark


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "a"),
            ("u1", 20, "b"),
            ("u1", 5, "c"),
            ("u2", 7, "d"),
            ("u3", 99, "e"),  # key with no right rows
        ],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 100),
            ("u1", 15, 150),
            ("u2", 7, 70),
            ("u2", 8, 80),
        ],
        "k string, ts long, val int",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    from ddsparkle.spark.dataops import asof_join

    left, right = _frames(spark)
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(left, right, ["k"], "ts", "ts").collect()
    }
    assert out[("u1", 10)] == 100  # equal ts matches when not strict
    assert out[("u1", 20)] == 150
    assert out[("u1", 5)] is None
    assert out[("u2", 7)] == 70
    assert out[("u3", 99)] is None


def test_asof_backward_strict(spark):
    from ddsparkle.spark.dataops import asof_join

    left, right = _frames(spark)
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(left, right, ["k"], "ts", "ts", strict=True).collect()
    }
    assert out[("u1", 10)] is None  # equal ts excluded
    assert out[("u1", 20)] == 150
    assert out[("u2", 7)] is None


def test_asof_forward(spark):
    from ddsparkle.spark.dataops import asof_join

    left, right = _frames(spark)
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(left, right, ["k"], "ts", "ts", direction="forward").collect()
    }
    assert out[("u1", 5)] == 100  # nearest following
    assert out[("u1", 10)] == 100  # inclusive
    assert out[("u1", 20)] is None
    assert out[("u2", 7)] == 70


def test_asof_left_columns_survive(spark):
    from ddsparkle.spark.dataops import asof_join

    left, right = _frames(spark)
    rows = asof_join(left, right, ["k"], "ts", "ts").collect()
    assert {r["tag"] for r in rows} == {"a", "b", "c", "d", "e"}
    assert set(rows[0].asDict()) == {"k", "ts", "tag", "val"}


def test_asof_validation(spark):
    from ddsparkle.spark.dataops import asof_join

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right.select("k", "ts"), ["k"])
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("val", "tag"), ["k"])


def test_asof_matches_exhaustive_reference(spark):
    """Union-window result == the naive per-row max-ts reference on a
    random-ish grid, all three modes."""
    from ddsparkle.spark.dataops import asof_join

    lrows = [("k%d" % (i % 3), (i * 37) % 101, i) for i in range(60)]
    rrows = [("k%d" % (i % 3), (i * 53) % 101, 1000 + i) for i in range(45)]
    # dedupe right per (k, ts) keeping max payload (operator contract)
    best = {}
    for k, ts, v in rrows:
        best[(k, ts)] = max(best.get((k, ts), -1), v)
    rrows = [(k, ts, v) for (k, ts), v in best.items()]
    left = spark.createDataFrame(lrows, "k string, ts long, i long")
    right = spark.createDataFrame(rrows, "k string, ts long, val long")

    def ref(strict, forward):
        out = {}
        for k, ts, i in lrows:
            cand = [
                (rts, v)
                for (rk, rts, v) in rrows
                if rk == k
                and (
                    (rts < ts or (not strict and rts == ts))
                    if not forward
                    else (rts > ts or (not strict and rts == ts))
                )
            ]
            if not cand:
                out[i] = None
            elif forward:
                out[i] = min(cand)[1]
            else:
                out[i] = max(cand)[1]
        return out

    for strict in (False, True):
        for direction in ("backward", "forward"):
            got = {
                r["i"]: r["val"]
                for r in asof_join(
                    left, right, ["k"], strict=strict, direction=direction
                ).collect()
            }
            assert got == ref(strict, direction == "forward"), (strict, direction)


def test_range_join_basic(spark):
    from ddsparkle.spark.dataops import range_join

    pts = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 19), ("a", 20), ("b", 5), ("a", -3)],
        "k string, p long",
    )
    iv = spark.createDataFrame(
        [("a", 5, 20, "w1"), ("a", 18, 25, "w2"), ("b", 0, 4, "w3"), ("a", 9, 9, "empty")],
        "k string, s long, e long, wid string",
    )
    got = sorted(
        (r["k"], r["p"], r["wid"])
        for r in range_join(pts, iv, "p", "s", "e", ["k"], bin_width=7).collect()
    )
    assert got == [("a", 5, "w1"), ("a", 10, "w1"), ("a", 19, "w1"), ("a", 19, "w2"), ("a", 20, "w2")]


@pytest.mark.parametrize("bw", [1, 3, 7, 100])
def test_range_join_bin_width_invariant(spark, bw):
    """Every bin width yields the identical pair set (and no duplicates)."""
    from ddsparkle.spark.dataops import range_join

    pts = spark.createDataFrame(
        [(i % 4, (i * 13) % 50 - 10) for i in range(40)], "k long, p long"
    )
    iv = spark.createDataFrame(
        [(i % 4, (i * 7) % 40 - 5, (i * 7) % 40 - 5 + (i % 9)) for i in range(25)],
        "k long, s long, e long",
    )
    iv = iv.withColumn("wid", iv.s * 1000 + iv.e)
    rows = [
        (r["k"], r["p"], r["wid"])
        for r in range_join(pts, iv, "p", "s", "e", ["k"], bin_width=bw).collect()
    ]
    ref = sorted(
        (k, p, s * 1000 + e)
        for k, p, _ in [(r["k"], r["p"], None) for r in pts.collect()]
        for kk, s, e in [(r["k"], r["s"], r["e"]) for r in iv.collect()]
        if k == kk and s <= p < e
    )
    assert len(rows) == len(set(rows)), "duplicate pairs"
    assert sorted(rows) == ref


def test_range_join_validation(spark):
    from ddsparkle.spark.dataops import range_join

    pts = spark.createDataFrame([(1, 1)], "k long, p long")
    iv = spark.createDataFrame([(1, 0, 2)], "k long, s long, e long")
    with pytest.raises(ValueError):
        range_join(pts, iv, "p", "s", "e", ["k"], bin_width=0)
    with pytest.raises(ValueError):
        range_join(
            pts.withColumnRenamed("p", "s"), iv, "s", "s", "e", ["k"], bin_width=1
        )


def test_asof_null_timestamps(spark):
    """NULL-ts right rows are dropped (they'd sort NULLS-FIRST and 'match'
    everyone); NULL-ts left rows match nothing, in BOTH directions."""
    from ddsparkle.spark.dataops import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", None, "b")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame(
        [("u1", 5, 50), ("u1", None, 999)], "k string, ts long, val int"
    )
    for direction in ("backward", "forward"):
        got = {
            r["tag"]: r["val"]
            for r in asof_join(left, right, ["k"], direction=direction).collect()
        }
        assert got["b"] is None, direction
        assert got["a"] == (50 if direction == "backward" else None), direction
