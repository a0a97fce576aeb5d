"""Same-epoch interleaved A/B for the document near-dup VERIFY rework
(BENCH policy: the shared host drifts ~2x between epochs, so never compare
absolute totals across runs — only interleaved legs from one epoch,
per-leg minima).

    python BENCH/ab_r04_verify.py [--rounds 3] [--out BENCH/ab_r04_verify.json]

  A = the pre-rework ``near_duplicates`` verify, replicated inline: join
      BOTH full texts onto every candidate pair, then a mapInPandas stage
      re-shingles and re-hashes both texts of every pair in Python
      (``_batch_shingle_hashes`` + per-pair np.unique/intersect1d);
  B = the shipped verify: each candidate-TOUCHING document (semi-join on
      the candidate ids) reduces ONCE to its distinct shingle-hash set via
      the same vectorized ``_batch_shingle_hashes`` pass, then a lossless
      size-bound prune (J <= min/max over an 8-byte-per-side sizes join)
      before any array moves, then one JVM ``array_intersect`` with J from
      the set-size identity — text never shuffles, and a document in p
      pairs is hashed once instead of p times.

Both legs consume the SAME precomputed candidate frame (banded MinHash,
materialized once), so the A/B isolates the verify. Pair sets are compared
per round and must be identical (same hash function on both legs, so J
values are bit-equal).

An end-to-end leg additionally times ``dataprep.curate`` (the top-cost
extra query) with the verify swapped the same way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-ab-r04-verify", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _verify_r3(df, cands, text_col="text", id_col="doc_id", shingle_n=3,
               jaccard_threshold=0.7):
    """Inline replica of the pre-rework verify (git history c77b2b7^:
    text join + mapInPandas re-shingling both sides per pair)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ddsparkle.spark.dataops import _batch_shingle_hashes

    texts = df.select(F.col(id_col), F.col(text_col))
    paired = (
        cands.join(
            texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(
                text_col, "text_a"
            ),
            "id_a",
        ).join(
            texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(
                text_col, "text_b"
            ),
            "id_b",
        )
    )
    out_schema = T.StructType(
        [
            paired.schema["id_a"],
            paired.schema["id_b"],
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def verify(batches):
        for pdf in batches:
            ha, sa, ca = _batch_shingle_hashes(pdf["text_a"].tolist(), shingle_n)
            hb, sb, cb = _batch_shingle_hashes(pdf["text_b"].tolist(), shingle_n)
            jac = np.empty(len(pdf), np.float64)
            for i in range(len(pdf)):
                a = np.unique(ha[sa[i] : sa[i] + ca[i]])
                b = np.unique(hb[sb[i] : sb[i] + cb[i]])
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                jac[i] = inter / union if union else 1.0
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac}
            )

    verified = paired.mapInPandas(verify, schema=out_schema)
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


def _verify_r4(df, cands, **kw):
    """The shipped verify, driven through near_duplicates with the candidate
    stage bypassed by monkey-free recomposition: replicate its body on the
    given candidate frame (kept in sync with dataops.near_duplicates)."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import _ensure_parallelism

    text_col = kw.get("text_col", "text")
    id_col = kw.get("id_col", "doc_id")
    shingle_n = kw.get("shingle_n", 3)
    thr = kw.get("jaccard_threshold", 0.7)
    touched = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ddsparkle.spark.dataops import _batch_shingle_hashes

    digest_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("__hs", T.ArrayType(T.LongType())),
            T.StructField("__sz", T.IntegerType()),
        ]
    )

    def digest(batches):
        for pdf in batches:
            h, st, ct = _batch_shingle_hashes(pdf[text_col].tolist(), shingle_n)
            hs = [
                np.unique(h[st[i] : st[i] + ct[i]]).view(np.int64).tolist()
                for i in range(len(pdf))
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "__hs": hs, "__sz": [len(x) for x in hs]}
            )

    per = (
        _ensure_parallelism(
            df.join(touched, id_col, "left_semi").select(id_col, text_col)
        )
        .mapInPandas(digest, schema=digest_schema)
        .persist()
    )
    sized = (
        cands.join(
            per.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__za")),
            "id_a",
        )
        .join(
            per.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__zb")),
            "id_b",
        )
        .filter(
            F.least("__za", "__zb").cast("double")
            >= F.lit(thr) * F.greatest("__za", "__zb")
        )
    )
    paired = sized.join(
        per.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("__sa")), "id_a"
    ).join(
        per.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("__sb")), "id_b"
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    jac = inter / (F.col("__za") + F.col("__zb") - inter)
    out = (
        paired.filter(jac >= thr)
        .select("id_a", "id_b", jac.alias("jaccard"))
        .localCheckpoint(eager=True)
    )
    per.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r04_verify.json")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from ddsparkle.spark import dataops as dops
    from ddsparkle.spark.dataprep import curate

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # long-document / high-multiplicity fixture — the regime the rework
    # targets (the sf0.1 gate table's ~300 B docs and multiplicity-1
    # candidates are fixed-overhead-dominated): every 25th document becomes
    # a 6-member near-dup cluster (15 pairs per cluster) of 64x-tiled text
    # (~19 KB/doc), so the old verify ships ~19 KB per pair side and
    # re-shingles each member's full text ~5 times, while the new verify
    # digests each touched document once and ships 8-byte set elements.
    from pyspark.sql import functions as FX

    tiled = docs.select(
        FX.col("doc_id").cast("string").alias("doc_id"),
        FX.concat_ws(" ", FX.array_repeat(FX.col("text"), 64)).alias("text"),
    )
    members = tiled.filter(FX.col("doc_id").cast("long") % 25 == 0)
    clones = members.select(
        FX.explode(FX.sequence(FX.lit(1), FX.lit(5))).alias("__i"),
        "doc_id",
        "text",
    ).select(
        FX.concat_ws("_", "doc_id", "__i").alias("doc_id"),
        FX.concat(FX.col("text"), FX.lit(" zq"), FX.col("__i").cast("string")).alias(
            "text"
        ),
    )
    long_docs = tiled.unionByName(clones).repartition(64)
    long_path = "/tmp/ab_r04_verify_longdocs"
    if not os.path.exists(f"{long_path}/_SUCCESS"):
        long_docs.write.mode("overwrite").parquet(long_path)
    long_docs = spark.read.parquet(long_path)
    lsigs = minhash_signatures(long_docs, "text", "doc_id", num_perm=64, shingle_n=3)
    lcands = minhash_lsh_candidates(lsigs, "doc_id", bands=16, num_perm=64)
    lcands = lcands.localCheckpoint(eager=True)
    n_lcands = lcands.count()

    # materialize the shared candidate frame once (identical input to both
    # verify legs; not part of the timed region)
    sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, "doc_id", bands=16, num_perm=64)
    cands = cands.localCheckpoint(eager=True)
    n_cands = cands.count()

    results: dict = {
        "sf_dir": SF_DIR, "n_docs": docs.count(), "n_candidates": n_cands,
        "n_long_docs": long_docs.count(), "n_long_candidates": n_lcands,
        "rounds": [],
    }
    verify_mins = {"A": float("inf"), "B": float("inf")}
    long_mins = {"A": float("inf"), "B": float("inf")}
    curate_mins = {"A": float("inf"), "B": float("inf")}
    pair_counts = set()
    long_pair_counts = set()
    # MEMBERSHIP equality, not just count equality: two legs could emit
    # different pairs with equal counts (r4 ADVICE finding)
    sets_equal = True
    long_sets_equal = True

    orig_near_duplicates = dops.near_duplicates

    def near_dup_r3(df, text_col="text", id_col="doc_id", num_perm=64,
                    bands=16, shingle_n=3, jaccard_threshold=0.7,
                    max_bucket_size=1000):
        sg = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
        cd = minhash_lsh_candidates(
            sg, id_col, bands, num_perm=num_perm, max_bucket_size=max_bucket_size
        )
        return _verify_r3(df, cd, text_col, id_col, shingle_n, jaccard_threshold)

    for r in range(args.rounds):
        rnd = {}
        rnd_sets = {}
        for leg, fn in (("A", _verify_r3), ("B", _verify_r4)):
            t0 = time.monotonic()
            got = fn(docs, cands).select("id_a", "id_b").toPandas()
            dt = time.monotonic() - t0
            rnd[f"verify_{leg}"] = round(dt, 3)
            verify_mins[leg] = min(verify_mins[leg], dt)
            pairs = set(map(tuple, got.itertuples(index=False)))
            rnd_sets[leg] = pairs
            pair_counts.add((leg, len(pairs)))
            rnd[f"verify_{leg}_pairs"] = len(pairs)
        sets_equal = sets_equal and (rnd_sets["A"] == rnd_sets["B"])
        rnd["pair_sets_equal"] = rnd_sets["A"] == rnd_sets["B"]
        long_sets = {}
        for leg, fn in (("A", _verify_r3), ("B", _verify_r4)):
            t0 = time.monotonic()
            got = fn(long_docs, lcands).select("id_a", "id_b").toPandas()
            dt = time.monotonic() - t0
            rnd[f"verify_long_{leg}"] = round(dt, 3)
            long_mins[leg] = min(long_mins[leg], dt)
            long_sets[leg] = set(map(tuple, got.itertuples(index=False)))
            long_pair_counts.add((leg, len(got)))
            rnd[f"verify_long_{leg}_pairs"] = len(got)
        long_sets_equal = long_sets_equal and (long_sets["A"] == long_sets["B"])
        rnd["long_pair_sets_equal"] = long_sets["A"] == long_sets["B"]
        # end-to-end curate leg with the verify swapped
        for leg, nd in (("A", near_dup_r3), ("B", orig_near_duplicates)):
            dops.near_duplicates = nd
            try:
                t0 = time.monotonic()
                curated, stats = curate(docs)
                n = curated.count()
                dt = time.monotonic() - t0
            finally:
                dops.near_duplicates = orig_near_duplicates
            rnd[f"curate_{leg}"] = round(dt, 3)
            rnd[f"curate_{leg}_stats"] = stats
            curate_mins[leg] = min(curate_mins[leg], dt)
        results["rounds"].append(rnd)
        print(json.dumps(rnd))

    results["verify_min_A"] = round(verify_mins["A"], 3)
    results["verify_min_B"] = round(verify_mins["B"], 3)
    results["verify_speedup"] = round(verify_mins["A"] / verify_mins["B"], 2)
    results["verify_long_min_A"] = round(long_mins["A"], 3)
    results["verify_long_min_B"] = round(long_mins["B"], 3)
    results["verify_long_speedup"] = round(long_mins["A"] / long_mins["B"], 2)
    results["long_pair_counts"] = {leg: n for leg, n in long_pair_counts}
    results["long_pairs_equal"] = long_sets_equal
    results["curate_min_A"] = round(curate_mins["A"], 3)
    results["curate_min_B"] = round(curate_mins["B"], 3)
    results["curate_speedup"] = round(curate_mins["A"] / curate_mins["B"], 2)
    # pair-SET equality across legs, every round (the rework is plan shape,
    # not semantics); counts reported alongside for readability
    counts = {leg: n for leg, n in pair_counts}
    results["pair_counts"] = counts
    results["pairs_equal"] = sets_equal
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
