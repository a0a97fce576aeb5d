"""Same-epoch interleaved A/B for the r6 wave-1 operator optimizations
(guide §1 discipline: per-leg minima over interleaved rounds, output
equality asserted every round; the host drifts ~2x, so absolute totals are
never evidence — CLAUDE.md).

Legs (A = r5 replica inline below, B = shipped r6 operator):

- pmi:      pmi_pairs — A: groupBy(term)+broadcast-join df (double subtree
            evaluation, single-split explode); B: window df over one
            parallelized subtree.
- tfidf:    tfidf_top_terms — same restructure.
- semdedup: A: interpreted Catalyst HOF cosine folds (16x64 literal seed
            arrays); B: Arrow-batched numpy with the identical IEEE fold.
- ams:      orders join-size probe — A: 1-task sketch builds + three
            aggregate jobs; B: _ensure_parallelism builds + ONE full-outer
            stats job.

    python BENCH/ab_r06_ops.py [--rounds 3] [--out BENCH/ab_r06_ops.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# A-leg replicas (verbatim r5 bodies, minus docstrings)
# ---------------------------------------------------------------------------


def _pmi_pairs_r5(df, ngram=2, min_df=3, max_df_den=10, min_pair=2, k=40,
                  scale_bits=20, text_col="text", id_col="doc_id"):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import ngram_shingles_expr

    t = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.explode(ngram_shingles_expr(text_col, ngram)).alias("term"),
        )
        .distinct()
    )
    n_docs = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.countDistinct(id_col).alias("__n"))
    )
    band = (
        t.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= int(min_df))
            & (F.col("df") * int(max_df_den) <= F.col("__n"))
        )
        .select("term", "df")
    )
    tb = t.join(F.broadcast(band), "term").select("__id", "term", "df")
    a, b = tb.alias("a"), tb.alias("b")
    pairs = (
        a.join(b, (F.col("a.__id") == F.col("b.__id")) & (F.col("a.term") < F.col("b.term")))
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("b.term").alias("term_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= int(min_pair))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.expr(
                f"(n_pairs * __n * {1 << scale_bits}L) DIV (df_a * df_b)"
            ).cast("long"),
        )
    )
    top = pairs.orderBy(
        F.col("score").desc(), F.col("n_pairs").desc(), "term_a", "term_b"
    ).limit(int(k))
    w = Window.orderBy(
        F.col("score").desc(), F.col("n_pairs").desc(), "term_a", "term_b"
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term_a", "term_b", "n_pairs", "df_a", "df_b", "score", "rank"
    )


def _tfidf_r5(df, text_col="text", id_col="doc_id", k=3, ngram=2):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = F.split(F.col(text_col), " ")

    def gram(i):
        return F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(ngram)])

    grams = F.when(
        F.size(toks) < ngram, F.array().cast("array<string>")
    ).otherwise(F.transform(F.sequence(F.lit(1), F.size(toks) - F.lit(ngram - 1)), gram))
    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(grams).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.countDistinct(id_col).alias("__n"))
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (
                F.col("tf")
                * F.length(F.bin(F.expr("__n DIV df"))).cast("long")
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def _semdedup_r5(df, emb_col="embedding", id_col="vec_id", n_clusters=16,
                 threshold=0.9, salt="semdedup"):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import _cosine_fold, _portable_line_key

    seeds = (
        df.select(id_col, emb_col)
        .withColumn(
            "__h",
            _portable_line_key(
                F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
            ),
        )
        .orderBy("__h", id_col)
        .limit(n_clusters)
        .collect()
    )
    seeds = sorted((r[0], list(r[1])) for r in seeds)
    scored = df.select(
        id_col,
        emb_col,
        F.array(
            *[
                F.struct(
                    _cosine_fold(
                        F.col(emb_col),
                        F.array(*[F.lit(float(v)) for v in vec]),
                    ).alias("s"),
                    F.lit(-int(sid)).alias("negid"),
                )
                for sid, vec in seeds
            ]
        ).alias("__sc"),
    )
    asg = scored.select(
        id_col, emb_col, (-F.array_max("__sc")["negid"]).cast("long").alias("cluster")
    )
    a = asg.select(
        F.col(id_col).alias("__ia"), F.col(emb_col).alias("__ea"), "cluster"
    )
    b = asg.select(
        F.col(id_col).alias("__ib"), F.col(emb_col).alias("__eb"), "cluster"
    )
    pairs = a.join(b, "cluster").filter(F.col("__ia") < F.col("__ib"))
    dropped = (
        pairs.filter(_cosine_fold(F.col("__ea"), F.col("__eb")) >= threshold)
        .select(F.col("__ib").alias(id_col))
        .distinct()
    )
    flagged = asg.join(
        dropped.withColumn("__drop", F.lit(True)), id_col, "left"
    )
    return flagged.select(
        id_col, "cluster", F.col("__drop").isNull().alias("is_kept")
    )


def _semdedup_input(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    planted = d.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("e", 1) * F.lit(1.5)),
            F.slice("e", F.lit(2), F.size("e") - F.lit(1)),
        ).alias("e"),
    )
    return d.unionByName(planted)


def _ams_r5(spark, sf_dir):
    """r5 q_orders_join_size_ams: 1-task sketch builds (no repartition) +
    three separate aggregate jobs."""
    from pyspark.sql import functions as F

    from ddsparkle.sketches.ams import AMSSketch
    from ddsparkle.spark.approx import _build_payload_partials, _reduce_payloads

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey").isNotNull()
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey").isNotNull()
    )

    def key(c):
        return (
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("k")
        )

    def sketch(d):
        partials = _build_payload_partials(
            d, "k", [],
            make=lambda: AMSSketch(n_counters=256, seed=0),
            update=lambda sk, v: sk.update(v.to_numpy(np.int64)),
        )
        return _reduce_payloads(partials, AMSSketch.from_bytes) or AMSSketch(
            n_counters=256, seed=0
        )

    ska = sketch(orders.select(key("o_custkey")))
    skb = sketch(cust.select(key("c_custkey")))
    dot = ska.inner_product_numerator(skb)
    ca = orders.groupBy("o_custkey").agg(F.count("*").alias("na"))
    cb = cust.groupBy("c_custkey").agg(F.count("*").alias("nb"))
    exact = int(
        ca.join(cb, ca["o_custkey"] == cb["c_custkey"])
        .agg(F.sum(F.col("na") * F.col("nb")).alias("j"))
        .collect()[0]["j"]
        or 0
    )
    f2a = int(ca.agg(F.sum(F.col("na") * F.col("na"))).collect()[0][0] or 0)
    f2b = int(cb.agg(F.sum(F.col("nb") * F.col("nb"))).collect()[0][0] or 0)
    err = dot - 256 * exact
    within = err * err <= 32 * 256 * f2a * f2b
    return (256, exact, dot, bool(within))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH/ab_r06_ops.json")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ddsparkle.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "ddsparkle-ab-r06-ops",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf_dir
    queries = entry_mod.queries()

    def docs():
        return spark.read.parquet(f"{sf}/documents.parquet")

    legs = {
        "pmi": {
            "A": lambda: _pmi_pairs_r5(docs()).collect(),
            "B": lambda: queries["doc_pmi_pairs"](spark, sf).collect(),
        },
        "tfidf": {
            "A": lambda: _tfidf_r5(docs()).orderBy("doc_id", "rank").collect(),
            "B": lambda: queries["doc_tfidf_terms"](spark, sf).collect(),
        },
        "semdedup": {
            "A": lambda: sorted(
                map(tuple, _semdedup_r5(_semdedup_input(spark, sf), emb_col="e")
                    .collect())
            ),
            "B": lambda: sorted(
                map(tuple, queries["emb_semdedup"](spark, sf).collect())
            ),
        },
        "ams": {
            "A": lambda: _ams_r5(spark, sf),
            "B": lambda: tuple(
                queries["orders_join_size_ams"](spark, sf).collect()[0]
            ),
        },
    }

    results = {name: {"A": [], "B": []} for name in legs}
    for rnd in range(args.rounds):
        for name, pair in legs.items():
            for leg in ("A", "B"):
                t0 = time.perf_counter()
                out = pair[leg]()
                dt = time.perf_counter() - t0
                results[name][leg].append(round(dt, 4))
                results[name][f"out_{leg}"] = out
        # output equality every round
        for name in legs:
            a, b = results[name]["out_A"], results[name]["out_B"]
            if name in ("pmi", "tfidf"):
                a = sorted(map(tuple, a))
                b = sorted(map(tuple, b))
            assert a == b, f"{name}: A/B outputs differ in round {rnd}"
        print(f"round {rnd}: " + ", ".join(
            f"{n} A={results[n]['A'][-1]} B={results[n]['B'][-1]}" for n in legs
        ))

    summary = {}
    for name in legs:
        mina, minb = min(results[name]["A"]), min(results[name]["B"])
        summary[name] = {
            "A_min": mina,
            "B_min": minb,
            "speedup": round(mina / minb, 3),
            "A": results[name]["A"],
            "B": results[name]["B"],
        }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v["speedup"] for k, v in summary.items()}))


if __name__ == "__main__":
    main()
