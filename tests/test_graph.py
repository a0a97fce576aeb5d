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


class TestFrequentPairs:
    """frequent_pairs vs an independent itertools replica on planted
    baskets, a-priori pruning semantics, mega-basket guard."""

    BASKETS = {
        1: ["milk", "bread", "eggs"],
        2: ["milk", "bread"],
        3: ["milk", "eggs", "beer"],
        4: ["bread", "eggs"],
        5: ["milk", "bread", "eggs", "beer"],
        6: ["beer"],
        7: ["milk", "milk", "bread"],  # duplicate item collapses
    }

    @staticmethod
    def _py_pairs(baskets, min_support):
        from collections import Counter
        from itertools import combinations

        sets = {b: sorted(set(items)) for b, items in baskets.items()}
        sup = Counter(i for items in sets.values() for i in items)
        keep = {i for i, s in sup.items() if s >= min_support}
        psup = Counter(
            p
            for items in sets.values()
            for p in combinations(sorted(set(items) & keep), 2)
        )
        n = len(sets)
        return {
            p: (
                s,
                sup[p[0]],
                sup[p[1]],
                n,
                s / sup[p[0]],
                (s * n) / (sup[p[0]] * sup[p[1]]),
            )
            for p, s in psup.items()
            if s >= min_support
        }

    def _df(self, spark):
        rows = [(b, i) for b, items in self.BASKETS.items() for i in items]
        return spark.createDataFrame(rows, "basket long, item string")

    def test_matches_replica(self, spark):
        from ddsparkle.spark.dataops import frequent_pairs

        got = {
            (r["item_a"], r["item_b"]): (
                r["support"], r["sup_a"], r["sup_b"], r["n_baskets"],
                r["confidence"], r["lift"],
            )
            for r in frequent_pairs(
                self._df(spark), "basket", "item", min_support=2
            ).collect()
        }
        assert got == self._py_pairs(self.BASKETS, 2)

    def test_apriori_prune_is_lossless(self, spark):
        # min_support=3: 'beer' (sup 3) stays, its pairs all fall below 3
        from ddsparkle.spark.dataops import frequent_pairs

        got = {
            (r["item_a"], r["item_b"]): r["support"]
            for r in frequent_pairs(
                self._df(spark), "basket", "item", min_support=3
            ).collect()
        }
        want = {k: v[0] for k, v in self._py_pairs(self.BASKETS, 3).items()}
        assert got == want and ("bread", "milk") in got

    def test_mega_basket_guard(self, spark):
        from ddsparkle.spark.dataops import frequent_pairs

        trimmed = {b: i for b, i in self.BASKETS.items() if len(set(i)) <= 2}
        got = {
            (r["item_a"], r["item_b"]): (r["support"], r["n_baskets"])
            for r in frequent_pairs(
                self._df(spark), "basket", "item",
                min_support=1, max_basket_items=2,
            ).collect()
        }
        want = {
            k: (v[0], v[3]) for k, v in self._py_pairs(trimmed, 1).items()
        }
        assert got == want  # n_baskets excludes dropped mega-baskets


class TestTriangleCounts:
    """triangle_counts vs an independent itertools brute force, edge
    hygiene (NULLs, self-loops, duplicates in both orientations),
    partition invariance, and the DuckDB twin."""

    @staticmethod
    def _brute(pairs):
        from itertools import combinations

        adj = {}
        es = set()
        for a, b in pairs:
            if a is None or b is None or a == b:
                continue
            x, y = (a, b) if a < b else (b, a)
            es.add((x, y))
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        counts = {}
        for u, v, w in combinations(sorted(adj), 3):
            if v in adj[u] and w in adj[u] and w in adj[v]:
                for n in (u, v, w):
                    counts[n] = counts.get(n, 0) + 1
        return counts

    @pytest.fixture(scope="class")
    def k4_plus(self, spark):
        # K4 (every node in 3 triangles) + a pendant edge + a duplicate
        # edge in BOTH orientations + a self-loop + a NULL edge
        pairs = [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (4, 5),            # pendant: 5 in no triangle
            (2, 1), (1, 2),    # duplicates, reversed + repeated
            (3, 3),            # self-loop
            (None, 1), (2, None),
        ]
        return pairs, spark.createDataFrame(pairs, "a int, b int")

    def test_k4(self, k4_plus):
        pairs, df = k4_plus
        from ddsparkle.spark.graph import triangle_counts

        got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}
        assert got == self._brute(pairs)

    def test_random_graph_vs_brute(self, spark):
        import random

        from ddsparkle.spark.graph import triangle_counts

        rng = random.Random(7)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(220)]
        df = spark.createDataFrame(pairs, "a int, b int")
        got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
        assert got == self._brute(pairs)

    def test_partition_invariance(self, spark):
        import random

        from ddsparkle.spark.graph import triangle_counts

        rng = random.Random(11)
        pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
        df = spark.createDataFrame(pairs, "a int, b int")
        a = sorted(map(tuple, triangle_counts(df.repartition(1)).collect()))
        b = sorted(map(tuple, triangle_counts(df.repartition(9)).collect()))
        assert a == b

    def test_oracle_twin_matches(self, spark, tmp_path):
        import random

        import duckdb

        from ddsparkle.oracle import triangle_counts_sql
        from ddsparkle.spark.graph import triangle_counts

        rng = random.Random(3)
        pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(400)]
        df = spark.createDataFrame(pairs, "a int, b int")
        pq = str(tmp_path / "tri_edges.parquet")
        df.write.parquet(pq)
        sql = triangle_counts_sql(
            f"SELECT a, b FROM read_parquet('{pq}/*.parquet')"
        )
        want = sorted(
            (r["node"], r["triangles"]) for r in triangle_counts(df).collect()
        )
        got = sorted(duckdb.sql(sql).fetchall())
        assert got == want


class TestKCore:
    def test_triangle_with_tails(self, spark):
        """Triangle {1,2,3} + tails 4-5: the 2-core is exactly the
        triangle (tails peel in two rounds: 5 first, then 4)."""
        from ddsparkle.spark.graph import kcore

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
        )
        got = sorted(map(tuple, kcore(edges, k=2).collect()))
        assert got == [(1, 2), (2, 2), (3, 2)]

    def test_normalization_and_empty_core(self, spark):
        """Self-loops, NULLs, duplicate + reversed edges collapse to one
        undirected edge each; a path graph has an empty 2-core."""
        from ddsparkle.spark.graph import kcore

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (2, 3), (3, 3), (None, 1)],
            "a long, b long",
        )
        assert kcore(edges, k=2).count() == 0
        # and the 1-core keeps the path with true undirected degrees
        got = sorted(map(tuple, kcore(edges, k=1).collect()))
        assert got == [(1, 1), (2, 2), (3, 1)]

    def test_unconverged_raises(self, spark):
        """A long path peels one layer per round from each end — with
        max_rounds too small for the peel depth, kcore must raise rather
        than silently return a truncated peel."""
        import pytest as _pytest

        from ddsparkle.spark.graph import kcore

        path = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "a long, b long"
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            kcore(path, k=2, max_rounds=2)

    def test_matches_duckdb_twin(self, spark):
        """Fixed-round unrolled twin == early-exit operator on a graph
        whose peel terminates well before the unroll bound."""
        import duckdb

        from ddsparkle.oracle import kcore_sql
        from ddsparkle.spark.graph import kcore

        rows = [(i * 7919 % 23, i * 104729 % 23) for i in range(60)]
        edges = spark.createDataFrame(rows, "a long, b long")
        got = sorted(map(tuple, kcore(edges, k=3).collect()))
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE raw AS SELECT * FROM (VALUES "
            + ", ".join(f"({a}, {b})" for a, b in rows)
            + ") t(a, b)"
        )
        want = [
            tuple(r)
            for r in con.sql(
                kcore_sql("SELECT a, b FROM raw", k=3, rounds=10)
            ).fetchall()
        ]
        assert got == sorted(want)
