"""Sketch-informed join planner: decision rules, result invariance across
strategies, plan shape, and the deterministic hot-set contract."""

import pytest
from pyspark.sql import functions as F

from ddsparkle.spark.planner import (
    join_cost_probe,
    portable_key60,
    sketch_informed_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows, key 'hot' holds 20%; dim side unique
    fact = spark.range(0, 50_000).select(
        F.when(F.col("id") % 5 == 0, F.lit("hot"))
        .otherwise(F.col("id").cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = fact.select("k").distinct().withColumn("attr", F.length("k"))
    return fact, dim


def _plain(fact, dim):
    return fact.join(dim, fact["k"] == dim["k"]).count()


def test_probe_counts_exact(spark, skewed):
    fact, dim = skewed
    p = join_cost_probe(fact, "k", dim, "k")
    assert p["rows_a"] == 50_000
    assert p["rows_b"] == 40_001  # 40k distinct non-hot + 'hot'
    # integer numerators are Python ints (bigint-safe)
    assert isinstance(p["join_est_num"], int)
    assert isinstance(p["f2_a_num"], int)


def test_probe_deterministic_across_partitionings(spark, skewed):
    fact, _ = skewed
    p1 = join_cost_probe(fact, "k", fact.repartition(13), "k")
    p2 = join_cost_probe(fact.repartition(3), "k", fact.coalesce(1), "k")
    # AMS counters merge by vector addition: any task layout, same sketch
    assert p1["join_est_num"] == p2["join_est_num"]
    assert p1["f2_a_num"] == p2["f2_a_num"]


def test_all_strategies_same_rows(spark, skewed):
    fact, dim = skewed
    want = _plain(fact, dim)
    assert want == 50_000
    for strat in ("broadcast", "salted", "smj"):
        j, d = sketch_informed_join(
            fact, dim, left_on="k", right_on="k", strategy=strat, parts=8
        )
        assert d["strategy"] == strat
        assert j.count() == want, strat
        # payload survives: every fact row keeps its v, dim attr joined in
        s = j.agg(F.sum("v").alias("s")).collect()[0]["s"]
        assert s == sum(range(50_000))


def test_auto_decision_broadcast(spark, skewed):
    fact, dim = skewed
    j, d = sketch_informed_join(
        fact, dim, left_on="k", right_on="k", broadcast_rows=100_000
    )
    assert d["strategy"] == "broadcast"
    assert d["broadcast_side"] == "b"  # dim is the smaller side
    assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()


def test_auto_decision_salted_on_hot_key(spark, skewed):
    fact, dim = skewed
    j, d = sketch_informed_join(
        fact, dim, left_on="k", right_on="k", broadcast_rows=0, skew_factor=4, parts=8
    )
    # 'hot' holds 20% of output >= skew_factor/parts = 50% of a task's fair
    # share * 4 -> salted with exactly that key
    assert d["strategy"] == "salted"
    assert d["hot_keys"] == ["hot"]
    assert j.count() == 50_000
    # the salted plan joins on the composite (salt, key)
    plan = j._jdf.queryExecution().analyzed().toString()
    assert "__salt_a" in plan and "__salt_b" in plan


def test_auto_decision_smj_when_uniform(spark):
    a = spark.range(0, 20_000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(0, 20_000).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    j, d = sketch_informed_join(
        a, b, left_on="k", right_on="k", broadcast_rows=0, parts=8
    )
    assert d["strategy"] == "smj"
    assert d["hot_keys"] == []
    assert j.count() == 20_000


def test_left_join_salted_keeps_unmatched(spark):
    a = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("lonely", 0)], "k string, v int"
    )
    b = spark.createDataFrame([("hot", "attr")], "k string, w string")
    j, d = sketch_informed_join(
        a, b, left_on="k", right_on="k", how="left", strategy="salted", salt=4
    )
    rows = j.count()
    assert rows == 101  # 100 hot matches + 1 null-extended 'lonely'
    assert j.filter(F.col("w").isNull()).count() == 1


def test_left_broadcast_only_right_side(spark):
    # left join can only broadcast the right side even when left is smaller
    a = spark.createDataFrame([("a", 1)], "k string, v int")
    b = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    j, d = sketch_informed_join(
        a, b, left_on="k", right_on="k", how="left", broadcast_rows=2000
    )
    assert d["strategy"] == "broadcast" and d["broadcast_side"] == "b"
    assert j.count() == 1


def test_hot_set_needs_mg_floor(spark):
    # a key can dominate the OUTPUT while being rare on the probe side:
    # the MG floor (cnt_a*(mg_k+1) > rows_a) must gate it out, because MG
    # retention is only guaranteed above the error bound
    a = spark.range(0, 100_000).select(F.col("id").cast("string").alias("k"))
    a = a.union(spark.createDataFrame([("dup",)] * 10, "k string"))
    b = spark.createDataFrame([("dup",)] * 500, "k string")
    j, d = sketch_informed_join(
        a, b, left_on="k", right_on="k", broadcast_rows=0, skew_factor=1, parts=64
    )
    # cnt_a('dup') = 10, rows_a ~ 100k: 10*65 <= 100_010 -> not eligible
    assert d["hot_keys"] == []
    assert d["strategy"] == "smj"
    assert j.count() == 10 * 500


def test_probe_reuse(spark, skewed):
    fact, dim = skewed
    p = join_cost_probe(fact, "k", dim, "k")
    j, d = sketch_informed_join(
        fact, dim, left_on="k", right_on="k", probe=p, broadcast_rows=100_000
    )
    assert d["strategy"] == "broadcast"
    assert d["rows_a"] == p["rows_a"]


def test_portable_key60_matches_duckdb(spark):
    import duckdb

    vals = ["conv0000000001", "x", "42"]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select(portable_key60(F.col("s")).alias("k"))
        .collect()
    )
    want = [
        duckdb.sql(f"SELECT ('0x' || substr(md5('{v}'), 1, 15))::BIGINT").fetchone()[0]
        for v in vals
    ]
    assert [r["k"] for r in got] == want
