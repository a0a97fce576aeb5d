"""Distributed graph analytics over edge-list DataFrames.

PageRank in deterministic integer fixed-point: every rank, share, and
dangling redistribution is an int64 floor-division expression, so results
are partition-order-free and bit-identical across engines (the
``dataops.kmeans_embeddings`` algebra family — see CLAUDE.md "Bit-exact
distributed k-means recipe"). The reference repo (DataDog/sketches-java)
has no graph surface; this module is brief-driven 100-TB pipeline tooling
(link-graph ranking for crawl prioritization / dedup canonical election),
not reference parity.

Scale notes: per iteration the corpus-sized frames are ONE edge join +
ONE groupBy(dst) aggregation; ranks (one int64 per node) are the only
state that shuffles. Dangling mass is a single scalar reduce per round.
The rank frame is referenced twice per round (share join + dangling sum),
so each round localCheckpoints — the ``connected_components`` lineage
discipline (a lazy loop doubles the logical plan per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "triangle_counts", "kcore"]


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    scale_bits: int = 32,
    damping_num: int = 17,
    damping_den: int = 20,
):
    """Deterministic integer fixed-point PageRank over a directed edge list.

    ``edges`` must have columns ``src`` and ``dst`` (any orderable type;
    rows with a NULL endpoint are dropped) and should be DISTINCT — parallel
    edges count double, exactly as written. Nodes = distinct endpoints.

    Arithmetic contract (all int64, floor division, no floats until the
    final display column):

    - ``r0(v) = S`` where ``S = 2**scale_bits`` (per-node initial mass).
    - ``share(u) = r(u) DIV out_deg(u)`` for nodes with out-edges.
    - ``contrib(v) = SUM(share(u))`` over in-edges — an order-free integer
      sum, so the result is independent of partitioning/merge order.
    - ``dangling = SUM(r(u))`` over out-degree-0 nodes; ``ds = dangling
      DIV n_nodes`` (one scalar per round).
    - ``r'(v) = ((den-num)*S) DIV den + (num * (contrib(v) + ds)) DIV den``
      with damping ``d = damping_num/damping_den`` (default 17/20 = 0.85).

    Floor divisions shave at most 1 ULP-of-S per term per round, so ranks
    are within ``iters * 2**-scale_bits`` of the real-arithmetic PageRank
    iterate — a deterministic variant, not an approximation gamble: the
    SAME integers come out of any engine that applies the same rules
    (DuckDB twin: ``oracle.pagerank_sql``).

    Overflow headroom: total mass never exceeds ``n_nodes * S`` and the
    widest intermediate is ``damping_num * total``; keep
    ``n_nodes * 2**scale_bits * damping_num < 2**63`` (at the default 32
    bits that allows ~1.2e8 nodes; drop to ``scale_bits=16`` for ~8e12 —
    rank resolution trades directly against node-count headroom).

    Returns ``[node, rank_scaled, rank]`` where ``rank = rank_scaled / S``
    (an exact power-of-two division, bit-equal in any IEEE engine).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_num < damping_den:
        raise ValueError("damping must satisfy 0 < num < den")
    scale = 1 << scale_bits
    e = edges.select("src", "dst").filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    # edges feed every round (share join) — materialize once
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    # out-degree per node for EVERY node (0 for sinks) — static across
    # rounds, one small int per node
    degn = (
        nodes.join(deg, "node", "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist()
        nodes.unpersist()
        degn.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank_scaled long, rank double"
        )
    base = ((damping_den - damping_num) * scale) // damping_den
    ranks = degn.select(
        "node", "deg", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        # one scalar per round: total rank parked on out-degree-0 nodes,
        # redistributed uniformly (floor). r6 (guide §2.4): computed as a
        # broadcast single-row aggregate INSIDE the round's plan instead of
        # a separate driver collect — one job per round instead of two (the
        # dangling scan reads the same checkpointed rank leaf either way,
        # and `s DIV n_nodes` is the identical int64 floor division, so
        # every rank integer is unchanged).
        dang = ranks.filter(F.col("deg") == 0).agg(
            F.expr(f"coalesce(sum(r), 0L) DIV {n_nodes}L").alias("__ds")
        )
        contrib = (
            e.join(
                ranks.filter(F.col("deg") > 0).select(
                    F.col("node").alias("src"),
                    F.expr("r DIV deg").alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            degn.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_num}L * (coalesce(contrib, 0L) + __ds)) "
                        f"DIV {damping_den}L"
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    # no final checkpoint needed: `out` is a pure projection of the last
    # round's checkpointed ranks, so the unpersists below cannot force a
    # recompute (r6: one fewer job)
    out = ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
    )
    e.unpersist()
    nodes.unpersist()
    degn.unpersist()
    return out


def triangle_counts(edges: DataFrame, a_col: str = "a", b_col: str = "b"):
    """Exact per-node triangle counts over an undirected edge list via
    degree-ordered edge orientation (the Cohen / "compact-forward" scheme,
    cf. Suri & Vassilvitskii WWW'11 MapReduce formulation). Brief-driven
    graph analytics (the reference repo has no graph surface): triangle
    participation is the standard local-clustering / spam-farm signal over
    link and co-occurrence graphs.

    Semantics: edges are undirected; NULL endpoints and self-loops are
    dropped, parallel edges and both orientations of the same pair count
    once. A node's count is the number of distinct triangles containing
    it; the global triangle count is ``sum(triangles) / 3``. Nodes in no
    triangle are absent from the output.

    Algorithm (why it scales): orient every edge from the endpoint with the
    smaller ``(degree, node)`` to the larger — a total order, so each
    triangle {u,v,w} is generated EXACTLY once, as a wedge at its
    smallest-degree corner closed by the oriented edge between the other
    two. Orientation bounds every out-degree by O(sqrt(m)) (a node of
    degree d only keeps neighbors of degree >= d, and there are at most
    2m/d of those), so the wedge join's per-key fanout — the quadratic
    term that makes naive triangle listing explode on skewed graphs — is
    capped at O(m) per node and O(m^1.5) overall, the optimal listing
    bound. No salting needed: the orientation IS the skew bound.

    Shuffle shape: one distinct on the normalized pair, two node-keyed
    degree joins, one self-join on ``src`` (the wedge join), one closure
    join on the oriented pair, one final groupBy — all integer keys and
    counts, partition-order-free, bit-identical to the DuckDB replay
    (``oracle.triangle_counts_sql``).

    Returns ``[node, triangles]``.
    """
    xa, xb = F.col(a_col), F.col(b_col)
    und = (
        edges.select(xa.alias("__a"), xb.alias("__b"))
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .filter(F.col("__a") != F.col("__b"))
        .select(
            F.least("__a", "__b").alias("x"), F.greatest("__a", "__b").alias("y")
        )
        .distinct()
    )
    # degree frame feeds two joins; the undirected frame feeds the degree
    # count and the orientation join — materialize both once
    und = und.persist()
    deg = (
        und.select(F.col("x").alias("node"))
        .unionAll(und.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("dg"))
        .persist()
    )
    d2 = (
        und.join(deg.select(F.col("node").alias("x"), F.col("dg").alias("dx")), "x")
        .join(deg.select(F.col("node").alias("y"), F.col("dg").alias("dy")), "y")
    )
    lower_first = F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    oriented = d2.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.when(lower_first, F.col("dy")).otherwise(F.col("dx")).alias("dst_dg"),
    ).persist()
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            F.struct(F.col("o1.dst_dg"), F.col("o1.dst"))
            < F.struct(F.col("o2.dst_dg"), F.col("o2.dst"))
        ),
    ).select(
        F.col("o1.src").alias("u"), F.col("o1.dst").alias("v"), F.col("o2.dst").alias("w")
    )
    tri = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).select("u", "v", "w")
    out = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    deg.unpersist()
    oriented.unpersist()
    return out


def kcore(
    edges: DataFrame,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 30,
):
    """Nodes of the ``k``-core (the maximal subgraph where every node has
    degree >= k) of an undirected graph, with their in-core degrees —
    iterative peeling: drop every node whose current degree is below ``k``
    (and its edges), repeat until a fixpoint. The standard
    cohesive-subgraph / spam-farm / boilerplate-hub filter over link and
    co-occurrence graphs; brief-driven (the reference repo has no graph
    surface).

    Semantics: NULL endpoints, self-loops, duplicate and reversed-duplicate
    edges are normalized away exactly as in ``triangle_counts``. Returns
    ``[node, degree]`` for k-core members only (empty frame if the core is
    empty). Raises ``RuntimeError`` if the peel has not converged after
    ``max_rounds`` rounds — the DuckDB twin unrolls a FIXED number of
    rounds (peeling is idempotent at the fixpoint, so extra unrolled
    rounds are no-ops), and the raise is what keeps "operator converged"
    and "twin replayed enough rounds" the same statement.

    Scale shape: per round ONE degree groupBy over the surviving edges and
    two semi-joins of edges against surviving nodes — integer keys only.
    Rounds are O(peel depth), not O(diameter); each round's edge frame is
    localCheckpointed because it feeds three consumers (degree count + two
    semi-joins) and a lazy loop would double lineage per round (the
    ``connected_components`` discipline).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    xa, xb = F.col(a_col), F.col(b_col)
    cur = (
        edges.select(xa.alias("__a"), xb.alias("__b"))
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .filter(F.col("__a") != F.col("__b"))
        .select(
            F.least("__a", "__b").alias("x"), F.greatest("__a", "__b").alias("y")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def degrees(e):
        return (
            e.select(F.col("x").alias("node"))
            .unionAll(e.select(F.col("y").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )

    prev_nodes = None  # unknown before the first degree pass
    for _ in range(max_rounds):
        deg = degrees(cur)
        keep = deg.filter(F.col("degree") >= k).persist()
        n_keep = keep.count()
        if prev_nodes is not None and n_keep == prev_nodes:
            out = keep.localCheckpoint(eager=True)
            keep.unpersist()
            return out
        prev_nodes = n_keep
        if n_keep == 0:
            # empty core: reuse keep's schema so the node type follows the
            # input endpoint type (long part keys, string "c:..." ids, ...)
            out = edges.sparkSession.createDataFrame([], keep.schema)
            keep.unpersist()
            return out
        nodes = keep.select("node")
        cur = (
            cur.join(nodes.withColumnRenamed("node", "x"), "x", "semi")
            .join(nodes.withColumnRenamed("node", "y"), "y", "semi")
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
        keep.unpersist()
    raise RuntimeError(
        f"kcore(k={k}) did not converge within max_rounds={max_rounds}"
    )
