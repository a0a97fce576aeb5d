"""Integer fixed-point PageRank: distributed result vs an independent
pure-Python replica (dict arithmetic, no Spark/SQL shared code), dangling
redistribution, partition invariance, NULL-endpoint hygiene."""

import pytest

from ddsparkle.spark.graph import pagerank

pytestmark = pytest.mark.spark


def _py_pagerank(edges, iters=5, scale_bits=32, num=17, den=20):
    """Independent driver-side replica of the operator's integer contract."""
    scale = 1 << scale_bits
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {n: 0 for n in nodes}
    for u, _ in edges:
        deg[u] += 1
    n = len(nodes)
    base = ((den - num) * scale) // den
    r = {v: scale for v in nodes}
    for _ in range(iters):
        ds = sum(r[v] for v in nodes if deg[v] == 0) // n
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] // deg[u]
        r = {v: base + (num * (contrib[v] + ds)) // den for v in nodes}
    return r


@pytest.fixture(scope="module")
def edges(spark):
    # 12-node graph: a hub, a chain, a 3-cycle, two pure sinks, and one
    # source-only node — exercises dangling mass, asymmetric in-degree,
    # and deg>1 share splitting
    pairs = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
        ("hub", "x"), ("hub", "y"),
        ("x", "y"), ("y", "z"),              # chain into sink z
        ("p", "q"), ("q", "s"), ("s", "p"),  # 3-cycle
        ("src_only", "a"),
    ]
    return pairs, spark.createDataFrame(pairs, "src string, dst string")


def test_matches_independent_replica(edges):
    pairs, df = edges
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=5).collect()}
    assert got == _py_pagerank(pairs, iters=5)


def test_partition_invariance(edges):
    pairs, df = edges
    a = sorted(map(tuple, pagerank(df.repartition(1), iters=4).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(7), iters=4).collect()))
    assert a == b  # bit-exact incl. the double display column


def test_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b"), (None, "c"), ("c", None)], "src string, dst string"
    )
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=3).collect()}
    assert set(got) == {"a", "b"}  # c only ever appears via NULL edges
    assert got == _py_pagerank([("a", "b")], iters=3)


def test_rank_display_is_exact_power_of_two_division(edges):
    _, df = edges
    for row in pagerank(df, iters=2, scale_bits=16).collect():
        assert row["rank"] == row["rank_scaled"] / 65536.0


def test_bad_params_raise(edges):
    _, df = edges
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_num=21, damping_den=20)


def test_oracle_twin_matches(edges, tmp_path):
    import duckdb

    pairs, df = edges
    from ddsparkle.oracle import pagerank_sql

    pq = str(tmp_path / "edges.parquet")
    df.write.parquet(pq)
    sql = pagerank_sql(
        f"SELECT src, dst FROM read_parquet('{pq}/*.parquet')", iters=5
    )
    want = {
        r["node"]: r["rank_scaled"] for r in pagerank(df, iters=5).collect()
    }
    got = {n: rs for n, rs, _ in duckdb.sql(sql).fetchall()}
    assert got == want
