"""Large-scale training-data pipeline operators over document/embedding
tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN), and
text analysis (token counts, quality scores, fingerprints, language-id
heuristic).

Design for 100 TB: every candidate-generation step is a *bucket join* (hash
keys shuffle, never O(n^2) comparisons); exact verification runs only within
buckets; all hashing is the process-stable vectorized hashing from
``ddsparkle.sketches.hashing`` so shards agree across executors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from ..sketches.hashing import hash64

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "near_duplicates",
    "simhash64",
    "embedding_lsh_candidates",
    "text_quality",
    "language_id",
]

_WORD_SEED = 0x7E57DA7A


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """uint64 hashes of word n-gram shingles (vectorized per document)."""
    words = text.split()
    if len(words) < n:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return hash64(pd.Series(shingles), seed=_WORD_SEED)


def _bucket_pairs(exploded, id_col: str, band_col: str = "band", bucket_col: str = "bucket"):
    """Distinct candidate pairs (id_a < id_b) sharing any (band, bucket)."""
    from pyspark.sql import functions as F

    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{band_col}") == F.col(f"b.{band_col}"))
            & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df, text_col: str = "text", id_col: str = "doc_id", by_hash: bool = False):
    """Keep one representative (min id) per exact text.

    Default groups by the text itself — truly exact (Catalyst's map-side
    partial aggregation still reduces each task to one row per distinct
    text before the shuffle). ``by_hash=True`` groups by xxhash64(text)
    instead: shuffles 8-byte keys rather than documents, at the cost of a
    ~n^2/2^65 chance of silently merging two distinct documents — at 10^12
    docs that is tens of thousands of expected collisions, so the hash mode
    is a pre-filter, not an exact answer.
    """
    from pyspark.sql import functions as F

    key = F.xxhash64(F.col(text_col)).alias("__th") if by_hash else F.col(text_col).alias("__t")
    return (
        df.groupBy(key)
        .agg(F.min(id_col).alias(id_col), F.count("*").cast("double").alias("n_copies"))
        .drop("__th", "__t")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df, text_col: str = "text", id_col: str = "doc_id", num_perm: int = 64, shingle_n: int = 3):
    """(id, array<long> signature): per-document MinHash over word shingles.

    One mapInPandas pass; per row, num_perm mins of splitmix-rehashed shingle
    hashes (vectorized (num_perm x n_shingles) matrix per doc).
    """
    from pyspark.sql import types as T

    seeds = np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    schema = T.StructType(
        [df.schema[id_col], T.StructField("signature", T.ArrayType(T.LongType()))]
    )

    def sign(batches):
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                base = _shingle_hashes(text or "", shingle_n)
                # h_i(x) = splitmix-style mix of (x ^ seed_i); min over shingles
                mat = base.reshape(1, -1) ^ seeds.reshape(-1, 1)
                mat = (mat * np.uint64(0xBF58476D1CE4E5B9)) ^ (mat >> np.uint64(31))
                sigs.append(mat.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(sign, schema=schema)


def minhash_lsh_candidates(signatures, id_col: str = "doc_id", bands: int = 16, num_perm: int | None = None):
    """Candidate near-duplicate pairs via banded LSH: split each signature
    into ``bands`` bands, hash each band, group by (band, hash) — a bucket
    join, O(sum bucket^2) only within colliding buckets. ``bands`` must
    divide ``num_perm`` (silently ignoring trailing permutations would skew
    the tuned S-curve)."""
    from pyspark.sql import functions as F

    if num_perm is None:
        first = signatures.select("signature").first()
        if first is None:  # empty corpus -> no pairs, typed like the id column
            from pyspark.sql import types as T

            id_type = signatures.schema[id_col].dataType
            return signatures.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [T.StructField("id_a", id_type), T.StructField("id_b", id_type)]
                ),
            )
        num_perm = len(first[0])
    if num_perm % bands:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    rows_per_band = num_perm // bands
    exploded = signatures.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice("signature", i * rows_per_band + 1, rows_per_band)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    return _bucket_pairs(exploded, id_col)


def near_duplicates(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
):
    """MinHash/LSH candidates verified by exact n-gram Jaccard: returns
    (id_a, id_b, jaccard) pairs above threshold. Verification joins the two
    texts per candidate pair (only candidate pairs shuffle text)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_perm=num_perm)
    texts = df.select(F.col(id_col), F.col(text_col))
    paired = (
        cands.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "text_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "text_b"), "id_b")
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
            jac = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa = set(_shingle_hashes(ta or "", shingle_n).tolist())
                sb = set(_shingle_hashes(tb or "", shingle_n).tolist())
                union = len(sa | sb)
                jac.append(len(sa & sb) / union if union else 1.0)
            yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac})

    verified = paired.mapInPandas(verify, schema=out_schema)
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 1):
    """(id, simhash long): 64-bit SimHash of word (n-gram) hashes — documents
    within small Hamming distance are near-duplicates. Ship with a bucketed
    join on rotated prefixes for scale (same shape as minhash_lsh_candidates).
    """
    from pyspark.sql import types as T

    schema = T.StructType([df.schema[id_col], T.StructField("simhash", T.LongType())])
    bit_cols = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def sig(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                h = _shingle_hashes(text or "", shingle_n)
                # vote per bit: +1 if set, -1 otherwise
                bits = ((h.reshape(-1, 1) & bit_cols) != 0).sum(axis=0)
                votes = 2 * bits - len(h)
                val = (bit_cols[votes > 0]).sum(dtype=np.uint64)
                # view, not cast: np.int64(uint64 with bit 63 set) raises on
                # NumPy >= 2.0
                out.append(int(np.uint64(val).astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(sig, schema=schema)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup / ANN via random-hyperplane LSH
# ---------------------------------------------------------------------------


def embedding_lsh_candidates(
    df,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 0,
    dim: Optional[int] = None,
):
    """Candidate similar-vector pairs via random-hyperplane (sign) LSH:
    ``n_tables`` independent sets of ``n_planes`` hyperplanes; vectors
    sharing a sign-pattern bucket in any table become candidates. The scale
    path for cosine ANN — brute force within buckets only."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    schema = T.StructType(
        [df.schema[id_col], T.StructField("table", T.IntegerType()), T.StructField("bucket", T.LongType())]
    )

    def bucketize(batches):
        for pdf in batches:
            vecs = np.stack([np.asarray(v, np.float64) for v in pdf[emb_col]])
            rows = {id_col: [], "table": [], "bucket": []}
            for t in range(n_tables):
                signs = (vecs @ planes[t].T) > 0  # (n, n_planes)
                buckets = (signs @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)
                rows[id_col].extend(pdf[id_col].tolist())
                rows["table"].extend([t] * len(pdf))
                rows["bucket"].extend(buckets.tolist())
            yield pd.DataFrame(rows)

    bucketed = df.select(id_col, emb_col).mapInPandas(bucketize, schema=schema)
    return _bucket_pairs(bucketed, id_col, band_col="table")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "zu", "ein", "ist", "nicht", "mit", "sich"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "pas", "pour", "que"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
}


def text_quality(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document quality features, all Catalyst expressions (JVM-side):
    char count, token count, mean token length, space ratio, uppercase-start
    flag, and a 64-bit content fingerprint."""
    from pyspark.sql import functions as F

    n_chars = F.length(text_col)
    n_spaces = n_chars - F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    n_tokens = F.size(F.split(text_col, " "))
    return df.select(
        id_col,
        n_chars.cast("double").alias("n_chars"),
        n_tokens.cast("double").alias("n_tokens"),
        ((n_chars - n_spaces) / n_tokens).alias("mean_token_len"),
        (n_spaces / n_chars).alias("space_ratio"),
        F.xxhash64(text_col).alias("fingerprint"),
    )


def language_id(df, text_col: str = "text", id_col: str = "doc_id"):
    """Stopword-ratio language heuristic (the classic n-gram/stopword
    baseline): per document, the language whose stopword list covers the
    largest token fraction; 'und' (undetermined) when nothing matches.
    Pure Catalyst: one pass, no UDF."""
    from pyspark.sql import functions as F

    tokens = F.split(F.lower(F.col(text_col)), " ")
    scores = [
        F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in words]))).alias(lang)
        for lang, words in _STOPWORDS.items()
    ]
    scored = df.select(id_col, *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(l) for l in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pick = pick.when(F.col(l) == best, F.lit(l))
    return scored.select(id_col, pick.alias("lang_pred"))


def ivf_index(df, emb_col: str = "embedding", id_col: str = "vec_id", n_clusters: int = 16, seed: int = 0, sample: int = 10_000, iters: int = 3):
    """Build an IVF (inverted-file) ANN index: k-means centroids fitted on a
    driver-side sample (deterministic: seeded k-means++ init + fixed Lloyd
    iterations), then one mapInPandas pass assigns every vector to its
    nearest centroid. Returns (assignments DataFrame [id, cluster], centroids
    ndarray). At 100 TB the assignment pass is the only full scan; queries
    touch ``n_probe`` clusters only."""
    from pyspark.sql import types as T

    from pyspark.sql import functions as F

    # deterministic pseudo-random sample: order by a hash of the id, not
    # scan order — limit() alone would take one file's rows and collapse the
    # centroids onto a single region of a partitioned/sorted table
    sample_rows = (
        df.select(emb_col, id_col).orderBy(F.xxhash64(id_col)).limit(sample).collect()
    )
    X = np.stack([np.asarray(r[0], np.float64) for r in sample_rows])
    rng = np.random.default_rng(seed)
    # k-means++ init
    centroids = [X[rng.integers(len(X))]]
    for _ in range(n_clusters - 1):
        d2 = np.min(
            ((X[:, None, :] - np.stack(centroids)[None, :, :]) ** 2).sum(-1), axis=1
        )
        centroids.append(X[rng.choice(len(X), p=d2 / d2.sum())])
    C = np.stack(centroids)
    for _ in range(iters):  # Lloyd
        assign = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
        for c in range(n_clusters):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)

    schema = T.StructType([df.schema[id_col], T.StructField("cluster", T.IntegerType())])
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def assign_fn(batches):
        cents = bc.value
        for pdf in batches:
            V = np.stack([np.asarray(v, np.float64) for v in pdf[emb_col]])
            # nearest centroid by L2 (||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2)
            d = -2.0 * V @ cents.T + (cents**2).sum(axis=1)[None, :]
            yield pd.DataFrame({id_col: pdf[id_col], "cluster": d.argmin(axis=1).astype(np.int32)})

    return df.select(id_col, emb_col).mapInPandas(assign_fn, schema=schema), C


def ann_ivf_topk(
    df,
    probe_vec,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 0,
    assignments=None,
    centroids=None,
):
    """IVF approximate top-k by cosine: search only the ``n_probe`` clusters
    whose centroids are closest to the probe — the scan-pruning scale path
    vs the brute-force baseline (filter pushes the cluster predicate into the
    join/scan, so (n_clusters - n_probe)/n_clusters of vectors are skipped).
    """
    from pyspark.sql import functions as F

    if assignments is None or centroids is None:
        assignments, centroids = ivf_index(df, emb_col, id_col, n_clusters, seed)
    p = np.asarray(probe_vec, np.float64)
    d = ((centroids - p[None, :]) ** 2).sum(axis=1)
    probe_clusters = [int(c) for c in np.argsort(d)[:n_probe]]
    cand = df.join(assignments, id_col).filter(F.col("cluster").isin(probe_clusters))
    p_norm = float(np.sqrt((p**2).sum()))
    probe_arr = F.array(*[F.lit(float(x)) for x in p.tolist()])
    dot = F.aggregate(
        F.zip_with(F.col(emb_col), probe_arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(F.col(emb_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    sim = dot / (norm * F.lit(p_norm))
    return (
        cand.select(id_col, F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def simhash_candidates(df, text_col: str = "text", id_col: str = "doc_id", bands: int = 4, shingle_n: int = 1):
    """Candidate near-duplicate pairs from SimHash: split the 64-bit hash
    into ``bands`` bit-bands; pairs agreeing on any band become candidates —
    every pair within Hamming distance < bands shares at least one band
    (pigeonhole), so the bucket join has guaranteed recall for distances
    below the band count."""
    from pyspark.sql import functions as F

    sh = simhash64(df, text_col, id_col, shingle_n)
    width = 64 // bands
    exploded = sh.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    return _bucket_pairs(exploded, id_col)
