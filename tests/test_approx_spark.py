"""Spark tests for the HLL/CMS/Bloom aggregation layer: estimates vs exact,
partition invariance, grouped paths.
"""

import pytest

from ddsparkle.spark.approx import bloom_membership, cms_frequencies, hll_distinct

pytestmark = pytest.mark.spark


def test_hll_distinct_global(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = hll_distinct(df, "o_custkey", p=14).collect()[0]
    exact = df.select("o_custkey").distinct().count()
    assert abs(res["distinct_est"] - exact) / exact < 5 * res["rse"]


def test_hll_partition_invariance(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = hll_distinct(df.repartition(1), "o_custkey").collect()[0]["distinct_est"]
    b = hll_distinct(df.repartition(11), "o_custkey").collect()[0]["distinct_est"]
    assert a == b  # register-max merge is exactly partition-independent


def test_hll_grouped(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = hll_distinct(df, "user_id", by="event_type", p=14).collect()
    exact = {
        r["event_type"]: r["cnt"]
        for r in df.groupBy("event_type")
        .agg({"user_id": "approx_count_distinct"})
        .withColumnRenamed("approx_count_distinct(user_id)", "cnt")
        .collect()
    }
    # compare to Spark's own HLL++ within combined tolerance
    for r in rows:
        ours, theirs = r["distinct_est"], exact[r["event_type"]]
        assert abs(ours - theirs) / max(theirs, 1) < 0.1


def test_cms_frequencies(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = ["click", "signup", "error", "nosuchtype"]
    res = {r["probe"]: r["est_freq"] for r in cms_frequencies(df, "event_type", probes).collect()}
    exact = {r["event_type"]: r["count"] for r in df.groupBy("event_type").count().collect()}
    n = df.count()
    for p in probes[:3]:
        assert res[p] >= exact[p] - 1e-9  # overestimate only
        assert res[p] - exact[p] <= (2.718 / 8192) * n + 1e-9
    assert res["nosuchtype"] <= (2.718 / 8192) * n + 1e-9


def test_bloom_membership(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # who among all customers placed an order?
    res = bloom_membership(orders, "o_custkey", customers, "c_custkey", n_bits=1 << 20)
    rows = res.collect()
    truth = {r[0] for r in orders.select("o_custkey").distinct().collect()}
    members = {r["c_custkey"] for r in rows if r["member"]}
    non_members = {r["c_custkey"] for r in rows if not r["member"]}
    assert truth <= members  # no false negatives
    fp = len(members - truth)
    assert fp / max(len(rows), 1) < 0.02
    assert non_members.isdisjoint(truth)


def test_kll_quantiles_spark(spark, sf_dir):
    import numpy as np
    from ddsparkle.spark.approx import kll_quantiles

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = kll_quantiles(df, "value", qs=(0.5, 0.95)).collect()[0]
    vals = np.sort(df.select("value").toPandas()["value"].to_numpy())
    n = len(vals)
    assert res["count"] == n
    for q, col in [(0.5, "q50"), (0.95, "q95")]:
        true_rank = np.searchsorted(vals, res[col], side="right") / n
        assert abs(true_rank - q) < 0.05


def test_tdigest_quantiles_spark(spark, sf_dir):
    import numpy as np
    from ddsparkle.spark.approx import tdigest_quantiles

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = tdigest_quantiles(df, "l_extendedprice", by="l_returnflag", qs=(0.5, 0.99)).collect()
    pdf = df.select("l_returnflag", "l_extendedprice").toPandas()
    for r in res:
        vals = np.sort(
            pdf[pdf["l_returnflag"] == r["l_returnflag"]]["l_extendedprice"].to_numpy()
        )
        assert r["count"] == len(vals)
        for q, col in [(0.5, "q50"), (0.99, "q99")]:
            true_rank = np.searchsorted(vals, r[col], side="right") / len(vals)
            assert abs(true_rank - q) < 0.05


def test_heavy_hitters_exact_two_pass(spark, sf_dir):
    from ddsparkle.spark.approx import heavy_hitters

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = heavy_hitters(df, "event_type", k=3, mg_k=64).collect()
    truth = (
        df.groupBy("event_type").count().orderBy("count", ascending=False).collect()
    )
    assert [r["value"] for r in got] == [r["event_type"] for r in truth[:3]]
    assert [r["freq"] for r in got] == [float(r["count"]) for r in truth[:3]]


def test_validate_quantiles_self_check(spark, sf_dir):
    """The at-scale accuracy monitor: sample-based validation of a
    quantiles() result stays within alpha + sampling slack."""
    from ddsparkle.spark.agg import quantiles
    from ddsparkle.spark.approx import validate_quantiles

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = quantiles(df, "l_extendedprice", qs=(0.5, 0.95)).collect()[0]
    errs = validate_quantiles(
        df, "l_extendedprice", res, {0.5: "q50", 0.95: "q95"}, alpha=0.01, m=20_000
    )
    for col, e in errs.items():
        assert e <= 0.01 + 0.05, (col, e)  # alpha + generous sampling slack


def test_kmv_overlap_matrix_exact_when_unsaturated(spark):
    """Grouped KMV overlap matrix vs exact pairwise set arithmetic: with
    k >= every pair's distinct union the matrix is EXACT (the regime the
    driver gate pins); all unordered pairs appear, including
    zero-intersection ones."""
    from ddsparkle.spark.approx import kmv_overlap_matrix

    rows = (
        [("a", f"v{i}") for i in range(40)]  # a: v0..v39
        + [("b", f"v{i}") for i in range(20, 70)]  # b: v20..v69 (|a&b|=20)
        + [("c", f"w{i}") for i in range(10)]  # c: disjoint
        + [("a", "v0"), ("b", "v20")]  # duplicates must not count twice
    )
    df = spark.createDataFrame(rows, "g string, v string").repartition(5)
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_overlap_matrix(df, "v", "g", k=256).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["distinct_a"], ab["distinct_b"], ab["intersection"]) == (40, 50, 20)
    assert ab["jaccard"] == 20 / 70
    ac = out[("a", "c")]
    assert (ac["intersection"], ac["jaccard"]) == (0.0, 0.0)
    # saturated regime: still within the documented rse bound
    big = spark.createDataFrame(
        [("x", f"u{i}") for i in range(3000)] + [("y", f"u{i}") for i in range(1500, 4500)],
        "g string, v string",
    )
    m = kmv_overlap_matrix(big, "v", "g", k=64).collect()[0]
    assert abs(m["distinct_a"] - 3000) <= 4 * m["rse"] * 3000
    assert abs(m["intersection"] - 1500) <= 0.5 * 1500 + 64  # coarse sanity
