"""Same-epoch interleaved A/B for the round-3 scale fixes (BENCH policy:
the shared host drifts ~2x between epochs, so NEVER compare absolute totals
across runs — only interleaved legs from the same epoch, per-leg minima).

    python BENCH/ab_r03.py [--rounds 3] [--out BENCH/ab_r03.json]

Legs:

1. connected_components scoped propagation — fixture where edges touch 1%
   of a 2M-node corpus, distributed path pinned (local_threshold=0).
   A = the round-2 loop (labels frame = ALL nodes, shuffled every round);
   B = the round-3 loop (labels = edge-touching nodes via semi-join;
   singletons emitted by one anti-join at the end).

2. exact_dedup hash-first — long-document fixture (20k docs x ~19 KB,
   30% duplicate rows over 2k distinct dup texts).
   A = the round-2 plan (groupBy(full text) — also what strategy='auto'
   correctly picks at this sub-4-GiB size, where job count dominates);
   B = the round-3 hash-first plan pinned via strategy='broadcast'
   (groupBy(xxhash64, length) singleton short-circuit + broadcast-
   prefiltered exact verify). B trades 2 extra jobs (slower wall at this
   scale) for a 2.5x shuffle-byte reduction (378 MB -> 151 MB measured
   here; the dominant cost at corpus scale, where auto picks it).

Both A legs are inline replicas of the round-2 code (see git history);
answers are asserted identical to the B legs before any timing counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-r03", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            # the OLD loop's 2M-node iterative lineage produces plan strings
            # so large that AQE's plan-change stringification OOMs the
            # default driver heap — in itself a cost of the old design, but
            # the A leg has to run to be timed
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# -- fixtures ---------------------------------------------------------------


def cc_fixture(spark, n_nodes=2_000_000, n_edge_nodes=20_000):
    from pyspark.sql import functions as F

    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    # clusters of 4 among the first n_edge_nodes ids (~1% of the corpus):
    # edge (a, a - a%4) — star shape, diameter <= 2, like real dup clusters.
    # (A random edge set would need ~12+ rounds, which the OLD loop cannot
    # even plan: its lazy lineage doubles per round — see the r3 fix.)
    edges = (
        spark.range(n_edge_nodes)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") - F.col("id") % 4).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    nodes = nodes.persist()
    edges = edges.persist()
    nodes.count(), edges.count()
    return edges, nodes


def cc_old(edges, nodes, id_col="doc_id", max_iter=50):
    """Round-2 distributed loop: label frame spans EVERY node, re-shuffled
    each propagation round (replica of dataops.connected_components before
    the edge-node semi-join scoping; see git history)."""
    from pyspark.sql import functions as F

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.persist()
    sym.count()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    cached = labels = labels.persist()
    converged = False
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("nbr_min"))
        )
        joined = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.coalesce(F.col("nbr_min") < F.col("component"), F.lit(False)).alias(
                    "__changed"
                ),
            )
            .persist()
        )
        n_changed = joined.agg(F.sum(F.col("__changed").cast("long"))).collect()[0][0]
        cached.unpersist()
        cached = joined
        labels = joined.select("id", "component")
        if not n_changed:
            converged = True
            break
    assert converged
    out = labels.withColumnRenamed("id", id_col).localCheckpoint(eager=True)
    cached.unpersist()
    sym.unpersist()
    return out


def dedup_fixture(spark, n_docs=20_000, n_dup_texts=2_000, dup_rows=6_000, words=600):
    from pyspark.sql import functions as F

    n_unique = n_docs - dup_rows
    uid = F.when(
        F.col("id") >= n_unique, (F.col("id") % n_dup_texts)
    ).otherwise(F.col("id"))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda j: F.md5(F.concat(uid.cast("string"), F.lit("-"), j.cast("string"))),
        ),
        " ",
    )
    df = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(64)
        .persist()
    )
    df.count()
    return df


def dedup_old(df, text_col="text", id_col="doc_id"):
    """Round-2 default plan: groupBy(full text) — map-side combined, but the
    shuffle keys/rows carry whole documents."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.col(text_col).alias("__t"))
        .agg(F.min(id_col).alias(id_col), F.count("*").cast("double").alias("n_copies"))
        .drop("__t")
    )


# -- driver -----------------------------------------------------------------


def run(rounds: int) -> dict:
    from ddsparkle.spark.dataops import connected_components, exact_dedup

    spark = _spark()
    edges, nodes = cc_fixture(spark)
    docs = dedup_fixture(spark)

    legs = {
        "cc_old": lambda: cc_old(edges, nodes).count(),
        "cc_new": lambda: connected_components(
            edges, nodes, "doc_id", local_threshold=0
        ).count(),
        "dedup_old": lambda: dedup_old(docs).count(),
        "dedup_new": lambda: exact_dedup(docs, strategy="broadcast").count(),
    }

    # answers identical before timing counts (join-based: 2M rows need not
    # land on the driver)
    from pyspark.sql import functions as F

    a = cc_old(edges, nodes).withColumnRenamed("component", "ca")
    b = connected_components(edges, nodes, "doc_id", local_threshold=0).withColumnRenamed(
        "component", "cb"
    )
    joined = a.join(b, "doc_id", "full")
    n_bad = joined.filter(
        ~F.col("ca").eqNullSafe(F.col("cb"))
    ).count()
    assert n_bad == 0, f"CC answers diverge on {n_bad} nodes"
    pa = dedup_old(docs).orderBy("doc_id").toPandas()
    pb = exact_dedup(docs, strategy="broadcast").orderBy("doc_id").toPandas().reset_index(drop=True)
    assert pa.equals(pb), "dedup answers diverge"

    times: dict[str, list] = {k: [] for k in legs}
    for _ in range(rounds):
        for name, fn in legs.items():  # interleaved: A,B,A,B within each round
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 3))
    spark.stop()

    mins = {k: min(v) for k, v in times.items()}
    return {
        "protocol": f"{rounds} interleaved rounds, per-leg minima, one session",
        "times": times,
        "min_sec": mins,
        "cc_speedup_old_over_new": round(mins["cc_old"] / mins["cc_new"], 2),
        "dedup_speedup_old_over_new": round(mins["dedup_old"] / mins["dedup_new"], 2),
        "fixtures": {
            "cc": "2M nodes, 4-star clusters over the first 20k ids (1% edge-touching, diameter <=2), distributed path",
            "dedup": "20k docs x ~19KB, 6k dup rows over 2k distinct dup texts; dedup_new pins strategy=broadcast (auto picks direct at this size)",
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run(args.rounds)
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_r03.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
