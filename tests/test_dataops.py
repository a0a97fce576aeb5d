"""Training-data ops tests on planted fixtures: exact dedup, MinHash/LSH
near-dup recall+precision, SimHash proximity, embedding LSH candidate recall,
text quality features, language-id heuristic.
"""

import numpy as np
import pandas as pd
import pytest

from ddsparkle.spark.dataops import (
    embedding_lsh_candidates,
    exact_dedup,
    language_id,
    minhash_lsh_candidates,
    minhash_signatures,
    near_duplicates,
    simhash64,
    text_quality,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    """Planted corpus: 30 random docs, 3 exact dup pairs, 3 near-dup pairs
    (one word changed), deterministic."""
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    did = 0
    originals = []
    for _ in range(30):
        words = rng.choice(vocab, 40).tolist()
        originals.append(words)
        rows.append((did, " ".join(words)))
        did += 1
    for i in range(3):  # exact duplicates of docs 0..2
        rows.append((did, " ".join(originals[i])))
        did += 1
    near_pairs = []
    for i in range(3, 6):  # near duplicates of docs 3..5 (one word changed)
        words = list(originals[i])
        words[20] = "CHANGED"
        near_pairs.append((i, did))
        rows.append((did, " ".join(words)))
        did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf).cache()
    df.count()
    yield df, near_pairs
    df.unpersist()


def test_exact_dedup(spark, docs):
    df, _ = docs
    out = exact_dedup(df).toPandas()
    assert len(out) == 33  # 36 docs, 3 exact dups folded
    assert out["n_copies"].sum() == 36
    assert (out[out["n_copies"] == 2]["doc_id"] < 3).all()  # representative = min id


def test_exact_dedup_strategies_identical(spark, docs):
    """Both phase-2 prefilter strategies (broadcast semi-join, bloom probe)
    and the auto route must produce identical exact answers; by_hash stays
    the collision-accepting prefilter."""
    df, _ = docs
    base = (
        exact_dedup(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    for strat in ("broadcast", "bloom"):
        got = (
            exact_dedup(df, strategy=strat)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, base), strat
    byh = exact_dedup(df, by_hash=True).toPandas()
    assert len(byh) == 33 and byh["n_copies"].sum() == 36


def test_exact_dedup_bloom_fp_no_double_report(spark):
    """Force a tiny, saturated bloom (every probe a false positive): phase-1
    singleton rows must defer to their phase-2 twin — one output row per
    distinct text, exact counts."""
    import ddsparkle.spark.dataops as dataops

    pdf = pd.DataFrame(
        {"doc_id": range(8), "text": [f"unique doc {i}" for i in range(4)] * 2}
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pdf)
    orig = dataops._bloom_member_udf
    try:
        # worst case: every probe returns True (fp rate 1.0)
        dataops._bloom_member_udf = lambda b, c, n, **kw: (lambda col: F.lit(True))
        out = dataops.exact_dedup(df, strategy="bloom").toPandas()
    finally:
        dataops._bloom_member_udf = orig
    assert len(out) == 4
    assert out["n_copies"].sum() == 8
    assert set(out["doc_id"]) == {0, 1, 2, 3}


def test_minhash_near_duplicates(spark, docs):
    df, near_pairs = docs
    found = near_duplicates(df, num_perm=64, bands=16, jaccard_threshold=0.5).toPandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(found["id_a"], found["id_b"])}
    # exact dups must be found with jaccard 1.0
    for i in range(3):
        assert (i, 30 + i) in got_pairs
    exact = found[(found["id_a"] < 3)]
    assert (exact["jaccard"] == 1.0).all()
    # planted near-dups must be found with high-but-not-1 jaccard
    for a, b in near_pairs:
        assert (a, b) in got_pairs
    near = found[found["id_b"] >= 33]
    assert ((near["jaccard"] >= 0.5) & (near["jaccard"] < 1.0)).all()
    # no spurious random-pair hits at this threshold
    assert len(got_pairs) == 6


def test_minhash_lsh_candidate_precision(spark, docs):
    df, _ = docs
    sigs = minhash_signatures(df, num_perm=64)
    cands = minhash_lsh_candidates(sigs, bands=16).toPandas()
    # candidates are a small superset of true pairs, not O(n^2)
    assert 6 <= len(cands) <= 40


def test_simhash_proximity(spark, docs):
    df, near_pairs = docs
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    for i in range(3):  # exact dup -> identical simhash
        assert sh[i] == sh[30 + i]
    for a, b in near_pairs:  # near dup -> small hamming distance
        d = bin((sh[a] ^ sh[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert d <= 12, (a, b, d)
    rng = np.random.default_rng(1)
    rand_d = [
        bin((sh[i] ^ sh[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
        for i, j in rng.integers(6, 30, (20, 2))
        if i != j
    ]
    assert np.mean(rand_d) > 20  # unrelated docs far apart


def test_embedding_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pyspark.sql.functions as F

    # plant: duplicate vec 0 as id 100000 (identical embedding -> must collide)
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding", "label"
    )
    df = emb.unionByName(dup)
    cands = embedding_lsh_candidates(df, n_planes=12, n_tables=4).toPandas()
    pairs = {(int(a), int(b)) for a, b in zip(cands["id_a"], cands["id_b"])}
    assert (0, 100000) in pairs  # identical vectors always collide
    n = df.count()
    assert len(pairs) < n * (n - 1) / 4  # far from all-pairs


def test_text_quality_features(spark, docs):
    df, _ = docs
    out = text_quality(df).toPandas()
    row = out[out["doc_id"] == 0].iloc[0]
    text = df.filter("doc_id = 0").collect()[0]["text"]
    assert row["n_chars"] == len(text)
    assert row["n_tokens"] == len(text.split(" "))
    assert 0 < row["space_ratio"] < 1
    # fingerprint of identical docs identical
    fp = {r["doc_id"]: r["fingerprint"] for _, r in out.iterrows()}
    assert fp[0] == fp[30] and fp[1] == fp[31]


def test_language_id(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat is in the house and it is warm",
                "der hund ist nicht zu hause und die katze",
                "le chat est pour la maison et une souris",
                "zzz qqq xxx",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_language_id_25_languages(spark):
    """One planted doc per supported language — stopword-scored and
    script-scored families both resolve; mixed Han+kana text must come out
    Japanese (the 3x kana weight), not Chinese."""
    samples = {
        "en": "the cat is in the house and it was warm for them",
        "de": "der hund ist nicht zu hause und die katze war im garten",
        "fr": "le chat est pour la maison et une souris dans le jardin",
        "es": "el que y los se no por su al lo como más",
        "pt": "o cão não está em casa para uma pessoa com mais de um",
        "it": "di il che è per non sono una con del le si ma lo ho",
        "nl": "de het een van ik te dat die in en niet is op aan met als",
        "pl": "nie się na że i z do to jest w jak po co tak ale za",
        "tr": "bu bir ne ve o için çok ama gibi daha sen var ki ile",
        "sv": "och det är inte en fråga att jag är på med om ett",
        "da": "og det er ikke en hund der var til af jeg har",
        "fi": "ja se on ei hän oli mutta kun niin nyt",
        "cs": "a se na je to že s z do o i k by ale",
        "ro": "de și la în cu pe un ce nu mai pentru din care sunt",
        "hu": "az és hogy nem is egy ez van de meg már csak mint még",
        "id": "yang dan di ini itu dengan untuk tidak dari dalam",
        "ru": "привет как дела это хорошо спасибо",
        "el": "αυτό είναι μια δοκιμή κειμένου",
        "he": "זה מבחן בעברית של טקסט",
        "ar": "هذا اختبار باللغة العربية للنص",
        "hi": "यह एक परीक्षण है हिंदी में",
        "th": "นี่คือการทดสอบข้อความ",
        "ko": "안녕하세요 한국어 테스트 문서",
        "ja": "日本語のテストです",  # Han + kana: must NOT classify as zh
        "zh": "这是一个中文测试文档内容",
    }
    from ddsparkle.spark.dataops import _SCRIPTS, _STOPWORDS

    assert len(samples) == len(_STOPWORDS) + len(_SCRIPTS) >= 20
    pdf = pd.DataFrame(
        {"doc_id": range(len(samples)), "text": list(samples.values())}
    )
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id(spark.createDataFrame(pdf)).collect()
    }
    got = {lang: out[i] for i, lang in enumerate(samples)}
    assert got == {lang: lang for lang in samples}, got


def test_language_id_null_and_prefix_bound(spark):
    """NULL text stays NULL (not 'en' — the r3 advice drift surface: every
    score NULL made the argmax fall through otherwise()), and the scorer
    reads only the first LANGUAGE_MAX_CHARS characters, so a long document
    whose head is English and whose tail is German noise still scores from
    the head alone — bounding per-row cost independent of document length."""
    from pyspark.sql import types as T

    from ddsparkle.spark.dataops import LANGUAGE_MAX_CHARS

    long_en = ("the cat is in the house and it is warm " * 200)[:LANGUAGE_MAX_CHARS]
    tail_de = " der hund ist nicht zu hause und die katze war im garten" * 400
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, long_en + tail_de)], schema
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] is None, out
    assert out[2] == "und", out
    assert out[3] == "en", out


def test_ivf_ann_recall(spark, sf_dir):
    """IVF top-k recall vs brute force: searching n_probe of n_clusters
    clusters must recover most of the true neighbors while scanning fewer
    candidates."""
    import pyspark.sql.functions as F
    from ddsparkle.spark.dataops import ann_ivf_topk, ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = np.asarray(emb.filter("vec_id = 0").collect()[0]["embedding"], np.float64)
    df = emb.filter("vec_id != 0")
    assignments, centroids = ivf_index(df, n_clusters=8, seed=1)
    assignments = assignments.cache()
    n_cand = (
        df.join(assignments, "vec_id").count()
    )
    got = ann_ivf_topk(
        df, probe, k=10, n_clusters=8, n_probe=4, assignments=assignments, centroids=centroids
    ).collect()
    got_ids = [r["vec_id"] for r in got]
    # brute force truth
    p_norm = float(np.sqrt((probe**2).sum()))
    rows = df.select("vec_id", "embedding").collect()
    sims = []
    for r in rows:
        v = np.asarray(r["embedding"], np.float64)
        sims.append((float(v @ probe / (np.linalg.norm(v) * p_norm)), r["vec_id"]))
    true_ids = [vid for _, vid in sorted(sims, key=lambda t: (-t[0], t[1]))[:10]]
    recall = len(set(got_ids) & set(true_ids)) / 10
    assert recall >= 0.5, (recall, got_ids, true_ids)
    # and the searched subset is a strict subset of all vectors
    probe_clusters = {r["cluster"] for r in assignments.join(
        spark.createDataFrame([(i,) for i in got_ids], ["vec_id"]), "vec_id").collect()}
    assert len(probe_clusters) <= 4
    assignments.unpersist()


def test_connected_components_and_fuzzy_clusters(spark, docs):
    """Min-label propagation CC: triangle + chain + isolated nodes resolve to
    min-id components; near_dup_clusters turns the planted dup graph into
    per-doc keep/drop decisions."""
    from ddsparkle.spark.dataops import connected_components, near_dup_clusters

    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 1, 10, 11, 12], "id_b": [2, 3, 3, 11, 12, 13]})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 12, 13, 99]}))
    # both code paths — driver-local union-find (default for small edge
    # sets) and the distributed propagation loop (local_threshold=0) —
    # must produce identical components
    for thr in (100_000, 0):
        comp = {
            r["doc_id"]: r["component"]
            for r in connected_components(
                edges, nodes, "doc_id", local_threshold=thr
            ).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}, thr

    # edges with NULL endpoints or endpoints absent from `nodes` are
    # ignored by BOTH paths (the distributed label join never matches
    # them; the local leg filters explicitly) — here 2 is not a node, so
    # 1-2-3 must NOT connect through it, and the NULL edge is inert
    d_edges = spark.createDataFrame(
        pd.DataFrame({"id_a": [1.0, 2.0, None], "id_b": [2.0, 3.0, 3.0]})
    ).selectExpr("CAST(id_a AS BIGINT) id_a", "CAST(id_b AS BIGINT) id_b")
    d_nodes = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 3]}))
    for thr in (100_000, 0):
        d_comp = {
            r["doc_id"]: r["component"]
            for r in connected_components(
                d_edges, d_nodes, "doc_id", local_threshold=thr
            ).collect()
        }
        assert d_comp == {1: 1, 3: 3}, (thr, d_comp)

    # string ids: the convergence check must be id-type agnostic (a
    # SUM(label) probe would cast-crash or silently no-op on strings)
    s_edges = spark.createDataFrame(
        pd.DataFrame({"id_a": ["a", "b", "c"], "id_b": ["b", "c", "d"]})
    )
    s_nodes = spark.createDataFrame(pd.DataFrame({"doc_id": ["a", "b", "c", "d", "z"]}))
    for thr in (100_000, 0):
        s_comp = {
            r["doc_id"]: r["component"]
            for r in connected_components(
                s_edges, s_nodes, "doc_id", local_threshold=thr
            ).collect()
        }
        assert s_comp == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}, thr

    df, near_pairs = docs
    out = near_dup_clusters(df, jaccard_threshold=0.5).toPandas()
    assert len(out) == df.count()  # every doc gets a decision
    by_id = out.set_index("doc_id")
    for i in range(3):  # exact dups cluster to the lower id
        assert by_id.loc[30 + i, "rep_id"] == i and not by_id.loc[30 + i, "keep"]
        assert by_id.loc[i, "keep"]
    for a, b in near_pairs:  # near dups too
        assert by_id.loc[b, "rep_id"] == a and not by_id.loc[b, "keep"]
    # 36 docs, 6 dropped (3 exact + 3 near dups)
    assert int(out["keep"].sum()) == 30


def test_chunk_documents(spark):
    """Chunk boundaries, overlap carry, and short-doc pass-through: a
    10-token doc at chunk=4/overlap=2 yields ceil(8/2)=4 chunks with 2
    shared tokens between neighbors; a 2-token doc yields itself."""
    from ddsparkle.spark.dataops import chunk_documents

    words = [f"w{i}" for i in range(10)]
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [" ".join(words), "a b"]})
    out = chunk_documents(
        spark.createDataFrame(pdf), chunk_tokens=4, overlap=2
    ).toPandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert list(d1["chunk_text"]) == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9"
    ]
    assert (d1["n_chunks"] == 4.0).all()
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == ["a b"] and list(d2["n_chunks"]) == [1.0]


def test_sessionize_and_stats(spark):
    """Planted gaps: sessions split exactly where the inter-event gap
    exceeds the threshold; tie rows (same ts) break by the order column."""
    import datetime as dt

    from ddsparkle.spark.dataops import session_stats, sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 3 events tight, 1-hour hole, 2 events tight -> 2 sessions
        (1, 1, base),
        (1, 2, base + dt.timedelta(seconds=60)),
        (1, 3, base + dt.timedelta(seconds=120)),
        (1, 4, base + dt.timedelta(seconds=3800)),
        (1, 5, base + dt.timedelta(seconds=3860)),
        # user 2: single event -> 1 session; tie on ts with event 7
        (2, 7, base),
        (2, 6, base),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]))
    sess = sessionize(df, "ts", "user_id", gap_seconds=600.0, order_cols=("event_id",))
    got = {(r["user_id"], r["event_id"]): r["session_id"] for r in sess.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 1, (1, 4): 2, (1, 5): 2,
                   (2, 6): 1, (2, 7): 1}
    stats = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in session_stats(
            df, "ts", "user_id", gap_seconds=600.0, order_cols=("event_id",)
        ).collect()
    }
    assert stats == {1: (2.0, 5.0, 3.0), 2: (1.0, 2.0, 2.0)}
    # one exchange only: lag + running sum share the sort (AQE prints the
    # plan twice — inspect the final section only)
    plan = sess._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan


def test_deterministic_stratified_sample(spark):
    from ddsparkle.spark.dataops import deterministic_sample, deterministic_stratified_sample

    pdf = pd.DataFrame(
        {"doc_id": range(100), "source": [f"s{i % 3}" for i in range(100)]}
    )
    df = spark.createDataFrame(pdf)
    out = deterministic_stratified_sample(df, by="source", k=5).toPandas()
    assert len(out) == 15
    assert out.groupby("source").size().to_dict() == {"s0": 5, "s1": 5, "s2": 5}
    # within a stratum the picks equal the flat deterministic_sample of it
    s0 = df.filter("source = 's0'")
    flat = deterministic_sample(s0, k=5).toPandas()
    assert set(out[out["source"] == "s0"]["doc_id"]) == set(flat["doc_id"])
    # partitioning-independent
    out2 = deterministic_stratified_sample(df.repartition(17), by="source", k=5).toPandas()
    assert set(map(tuple, out2[["doc_id", "source"]].values.tolist())) == set(
        map(tuple, out[["doc_id", "source"]].values.tolist())
    )


def test_connected_components_long_chain_distributed(spark):
    """A 14-hop chain forces ~14 propagation rounds on the distributed path.
    Without per-round lineage truncation the loop's logical plan doubles
    every round (labels is referenced twice per round) — exponential in
    diameter, OOMing the optimizer around round ~12. With localCheckpoint
    rounds, this must converge to one min-id component."""
    from ddsparkle.spark.dataops import connected_components

    n = 15  # nodes 0..14, edges i-(i+1): diameter 14
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
    comp = connected_components(edges, nodes, "doc_id", local_threshold=0)
    out = {r["doc_id"]: r["component"] for r in comp.collect()}
    assert out == {i: 0 for i in range(n)}


def test_batch_vectorized_hashing_matches_per_doc_reference(spark, docs):
    """The Arrow-batch-vectorized MinHash/SimHash paths must produce EXACTLY
    the signatures of the per-document reference formulation (one
    _shingle_hashes call + mix per doc)."""
    from ddsparkle.sketches.hashing import _splitmix64
    from ddsparkle.spark.dataops import _shingle_hashes

    df, _ = docs
    pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    num_perm, shingle_n = 64, 3
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64)) | np.uint64(1)

    def ref_minhash(text):
        base = _shingle_hashes(text or "", shingle_n)
        mat = base.reshape(1, -1) * seeds.reshape(-1, 1)
        return mat.min(axis=1).astype(np.int64).tolist()

    got = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(df, num_perm=num_perm, shingle_n=shingle_n).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row["doc_id"]] == ref_minhash(row["text"]), row["doc_id"]

    def ref_simhash(text):
        h = _shingle_hashes(text or "", 1)
        bit_cols = np.uint64(1) << np.arange(64, dtype=np.uint64)
        bits = ((h.reshape(-1, 1) & bit_cols) != 0).sum(axis=0)
        votes = 2 * bits - len(h)
        return int((bit_cols[votes > 0]).sum(dtype=np.uint64).view(np.int64))

    got_sh = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    for _, row in pdf.iterrows():
        assert got_sh[row["doc_id"]] == ref_simhash(row["text"]), row["doc_id"]


def test_lsh_bucket_skew_guard(spark):
    """Planted degenerate bucket: 600 identical boilerplate docs would make
    the LSH self-join O(b^2) (~180k pairs through one reducer). The bucket-size
    cap must keep the candidate count bounded while genuine near-dup pairs in
    normal-size buckets survive; the dropped buckets are visible through
    lsh_bucket_stats."""
    from ddsparkle.spark.dataops import lsh_bucket_stats

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(200)]
    rows = [(i, "boilerplate empty stub " * 5) for i in range(600)]
    base = rng.choice(vocab, 40).tolist()
    near = list(base)
    near[7] = "CHANGED"
    rows += [(5000, " ".join(base)), (5001, " ".join(near))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    sigs = minhash_signatures(df, num_perm=64).cache()
    sigs.count()
    cands = minhash_lsh_candidates(sigs, bands=16, max_bucket_size=50).toPandas()
    pairs = {(int(a), int(b)) for a, b in zip(cands["id_a"], cands["id_b"])}
    assert (5000, 5001) in pairs  # genuine near-dup pair survives the guard
    assert len(pairs) < 100  # bounded: no O(600^2) candidate explosion
    # the dropped mass is observable, not silent
    from pyspark.sql import functions as F

    exploded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.xxhash64(F.slice("signature", i * 4 + 1, 4)) for i in range(16)])
        ).alias("band", "bucket"),
    )
    stats = lsh_bucket_stats(exploded, max_bucket_size=50).toPandas()
    assert len(stats) >= 16 and stats["size"].max() == 600
    # guard off -> the explosion is real (distinct pairs among 2000 identical)
    unguarded = minhash_lsh_candidates(sigs, bands=16, max_bucket_size=None)
    assert unguarded.count() >= 600 * 599 / 2
    sigs.unpersist()


def test_curate_pipeline_accounting(spark, docs):
    """End-to-end curation: exact dups drop first, fuzzy dups next, gates
    last; stats must account for every document."""
    from ddsparkle.spark.dataprep import curate

    df, _ = docs  # 36 docs: 3 exact dups, 3 near dups (one word changed)
    curated, stats = curate(df, jaccard_threshold=0.5, min_tokens=5)
    assert stats["input_docs"] == 36
    assert stats["dropped_exact_dups"] == 3
    assert stats["dropped_fuzzy_dups"] == 3
    assert stats["after_quality_language"] == curated.count() == 30
    # representatives kept are the min ids of their clusters
    kept_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert set(range(30)) == kept_ids
    # language gate drops everything in this synthetic vocab (all 'und')
    _, stats2 = curate(df, jaccard_threshold=0.5, languages=["en"])
    assert stats2["after_quality_language"] == 0


def test_simhash_candidates_recall(spark, docs):
    from ddsparkle.spark.dataops import simhash_candidates

    df, near_pairs = docs
    cands = simhash_candidates(df, bands=8).toPandas()
    pairs = {(int(a), int(b)) for a, b in zip(cands["id_a"], cands["id_b"])}
    for i in range(3):  # exact dups: identical simhash -> all bands agree
        assert (i, 30 + i) in pairs
    # near dups are within hamming < 8 of the original (see simhash test) ->
    # pigeonhole guarantees at least one shared band at bands=8
    for a, b in near_pairs:
        assert (a, b) in pairs
    n = df.count()
    assert len(pairs) < n * (n - 1) / 4  # bucketed, not all-pairs


def test_ngram_jaccard_pairs_catalyst(spark, docs):
    """Catalyst-only Jaccard verify: exact-dup pairs at 1.0, one-word-changed
    near-dups high but < 1, unrelated pairs absent."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import ngram_jaccard_pairs

    df, near_pairs = docs
    out = ngram_jaccard_pairs(
        df, threshold=0.5, num_perm=32, bands=32, max_bucket_size=None
    ).toPandas()
    got = {(int(a), int(b)): j for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])}
    for i in range(3):
        assert got[(i, 30 + i)] == 1.0
    for a, b in near_pairs:
        # one word changed out of 40 kills <= 3 of the 38 distinct 3-grams
        assert 0.8 <= got[(a, b)] < 1.0
    assert len(got) == 6  # nothing else crosses 0.5


def test_ngram_shingles_expr_short_docs(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import ngram_shingles_expr

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["one two", "a b c d", ""]})
    )
    rows = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", ngram_shingles_expr("text", 3).alias("s")).collect()
    }
    assert rows[0] == ["one two"]  # < n words -> [text]
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == [""]


def test_document_fingerprints(spark, docs):
    """Deterministic, distinct-per-content, equal-for-exact-dups; bottom-k
    selection is a subset of the shingle digest set."""
    from ddsparkle.spark.dataops import document_fingerprints

    df, _ = docs
    out = document_fingerprints(df, shingle_n=8, k=4).toPandas().set_index("doc_id")
    for i in range(3):  # exact dups share the full fingerprint
        assert out.loc[i, "fingerprint"] == out.loc[30 + i, "fingerprint"]
        assert out.loc[i, "fp_min"] == out.loc[30 + i, "fp_min"]
    # 40-word docs: 33 distinct 8-gram shingles
    assert (out["n_shingles"] == 33).all()
    assert out["fp_min"].str.len().eq(32).all()  # md5 hex
    assert out["fingerprint"].str.split(",").str.len().eq(4).all()
    # distinct originals -> distinct fingerprints
    assert out.loc[range(30), "fingerprint"].nunique() == 30


def test_embedding_near_duplicates_planted(spark):
    """Planted perturbed copies are found exactly; unrelated vectors are not."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import embedding_near_duplicates

    rng = np.random.default_rng(5)
    V = rng.standard_normal((40, 16))
    rows = [(i, V[i].tolist()) for i in range(40)]
    rows += [(100 + i, (V[i] + 0.05 * rng.standard_normal(16)).tolist()) for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "e"]))
    out = embedding_near_duplicates(
        df, emb_col="e", id_col="vec_id", threshold=0.9,
        n_planes=4, n_tables=16, seed=0, max_bucket_size=None,
    ).toPandas()
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert {(i, 100 + i) for i in range(10)} <= got
    # random 16-dim gaussians essentially never hit cosine 0.9
    assert got == {(i, 100 + i) for i in range(10)}


def test_ann_lsh_topk_exact_match_and_pruning(spark):
    """A probe equal to a corpus vector must rank that vector first; the
    candidate set must be a strict subset of the corpus."""
    from ddsparkle.spark.dataops import _hyperplane_buckets, ann_lsh_topk

    rng = np.random.default_rng(9)
    V = rng.standard_normal((200, 16))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(200), "e": [v.tolist() for v in V]})
    )
    probe = V[7].tolist()
    top = ann_lsh_topk(df, probe, k=5, emb_col="e", id_col="vec_id",
                       n_planes=6, n_tables=8, seed=0).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["cosine"] - 1.0) < 1e-12
    planes = np.random.default_rng(0).standard_normal((8, 6, 16))
    buckets = _hyperplane_buckets(df, "e", "vec_id", planes)
    # pruning: probe's buckets hold fewer than the full corpus
    assert buckets.select("vec_id").distinct().count() == 200


def test_cross_corpus_contamination(spark):
    """Planted overlap: corpus doc 0 shares an 8-gram run with the reference;
    doc 1 does not; short docs fall back to whole-text shingles."""
    from ddsparkle.spark.dataops import cross_corpus_contamination

    shared = " ".join(f"s{i}" for i in range(12))
    corpus = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": [
                shared + " unique tail here now",
                " ".join(f"u{i}" for i in range(20)),
                "tiny doc",  # < 8 words -> [text] shingle
            ],
        })
    )
    reference = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101], "text": [shared + " other suffix words", "tiny doc"]})
    )
    for hashed in (False, True):
        out = {
            r["doc_id"]: (r["n_shared_shingles"], r["contaminated"])
            for r in cross_corpus_contamination(
                corpus, reference, shingle_n=8, join_on_hash=hashed
            ).collect()
        }
        assert out[0][1] is True and out[0][0] >= 1.0
        assert out[1] == (0.0, False)
        assert out[2] == (1.0, True)  # whole-text match


def test_exact_dedup_normalized(spark):
    from ddsparkle.spark.dataops import exact_dedup_normalized, normalize_text_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["Hello,   World!", "hello world", "HELLO WORLD.", "другой текст"],
        })
    )
    norm = {r["doc_id"]: r["n"] for r in
            df.select("doc_id", normalize_text_expr("text").alias("n")).collect()}
    assert norm[0] == norm[1] == norm[2] == "hello world"
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup_normalized(df).collect()}
    assert out[0] == 3.0  # representative = min id, 3 formatting variants
    assert 3 in out


def test_bpe_ish_token_count_dialect_parity(spark):
    """BPE_ISH_PATTERN must produce identical match counts under Java regex
    (Spark) and RE2 (DuckDB) — the driver-gate precondition."""
    import duckdb
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import BPE_ISH_PATTERN, token_count_expr

    texts = ["Hello, world! It's 2026.", "foo_bar baz-qux 123abc",
             "  spaces   and\ttabs ", "", "ISN'T can't won't", "a1b2c3 ... ???"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    sp = [r[0] for r in df.select(token_count_expr("text", "bpe_ish")).collect()]
    con = duckdb.connect()
    dk = [con.execute("SELECT len(regexp_extract_all(?, ?))", [t, BPE_ISH_PATTERN]).fetchone()[0]
          for t in texts]
    assert sp == dk
    ws = [r[0] for r in df.select(token_count_expr("text", "whitespace")).collect()]
    assert ws[3] == 1  # split('', ' ') -> [''] like the quality convention


def test_curate_with_decontamination_and_normalization(spark):
    """Extended curate(): benchmark-contaminated docs drop first; formatting
    variants fold in normalized exact dedup; accounting covers every drop."""
    from ddsparkle.spark.dataprep import curate

    shared = " ".join(f"b{i}" for i in range(10))
    rows = [(0, "Common Words Here Now! " + " ".join(f"x{i}" for i in range(10))),
            (1, "common words here now  " + " ".join(f"x{i}" for i in range(10))),
            (2, shared + " more corpus text follows here"),
            (3, " ".join(f"c{i}" for i in range(20)))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": [shared + " benchmark suffix words"]})
    )
    curated, stats = curate(
        df, min_tokens=2, max_mean_token_len=50.0,
        normalize_before_dedup=True, decontaminate_against=bench,
    )
    kept = {r["doc_id"] for r in curated.collect()}
    assert 2 not in kept                       # contaminated (shares 8-gram run)
    assert (0 in kept) != (1 in kept)          # normalized variants folded to one
    assert 3 in kept
    assert stats["dropped_contaminated"] == 1
    assert stats["after_decontamination"] == 3
    assert stats["dropped_exact_dups"] == 1


def test_hamming_near_dup_pairs_contract(spark):
    """Generic 64-bit Hamming pairing: exact distances, pigeonhole recall at
    d < bands (incl. sign-bit hashes), the bands/max_hamming invariant, and
    the bucket skew guard."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import hamming_near_dup_pairs

    u0 = np.uint64(0xDEADBEEFCAFEF00D)  # sign bit set

    def as64(x):
        # XOR in uint64 space, emit the int64 two's-complement view (Python
        # int XOR on mixed signs exceeds the long range)
        return int((u0 ^ np.uint64(x)).view(np.int64))

    rows = [
        (0, as64(0)),
        (1, as64(0b1)),                     # d=1
        (2, as64(0b11 << 62)),              # d=2, top band (sign bit)
        (3, as64(0x3F)),                    # d=6 == max, single band
        (4, as64(0x010101010101)),          # d=6 spread over 6 bands
        (5, as64(0x7F)),                    # d=7 > max -> excluded vs 0
        (6, as64(0xFFFFFFFFFFFFFFFF)),      # d=64
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            df, "h", id_col="id", max_hamming=6, bands=8
        ).collect()
    }
    # every pair within d<=6 of id 0 (pigeonhole: d < 8 bands => found)
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 2.0
    assert got[(0, 3)] == 6.0
    assert got[(0, 4)] == 6.0
    assert (0, 5) not in got and (0, 6) not in got
    # cross pairs among the variants that land within 6 bits of each other
    assert got[(1, 2)] == 3.0  # (h^1) vs (h^(11<<62))
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, "h", id_col="id", max_hamming=8, bands=8)
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, "h", id_col="id", max_hamming=2, bands=7)
    # skew guard: 30 identical hashes, cap 5 -> no pairs
    many = spark.createDataFrame(
        [(i, as64(0)) for i in range(30)], "id long, h long"
    )
    assert (
        hamming_near_dup_pairs(
            many, "h", id_col="id", max_hamming=6, bands=8, max_bucket_size=5
        ).count()
        == 0
    )


def test_redact_pii_reference_parity(spark):
    """Every PII_PATTERNS rule, the chain ORDER (email first: a dotted-quad
    local part must become <EMAIL>, never half-eaten by the IP rule), the
    independent-count contract, NULL pass-through, and the no-match
    identity — all against a pure-Python re reference."""
    import re

    from ddsparkle.spark.dataops import PII_PATTERNS, redact_pii

    texts = [
        "mail bob.smith+x@example.co.uk and 1.2.3.4@example.io please",
        "server 10.0.255.3 and 999.1.2.3 edge",
        "ssn 123-45-6789 phone 555-010-1234 also 555 010 1234",
        "card 4111111111111111 short 123456789012 long 12345678901234567890",
        "no pii here at all",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = {r["id"]: r for r in redact_pii(df).collect()}
    for i, t in enumerate(texts):
        r = rows[i]
        if t is None:
            assert r["text_redacted"] is None
            assert all(r[f"n_{name}"] is None for name, _, _ in PII_PATTERNS)
            continue
        red = t
        for name, pat, repl in PII_PATTERNS:
            assert r[f"n_{name}"] == len(re.findall(pat, t)), (i, name)
            red = re.sub(pat, repl, red)
        assert r["text_redacted"] == red, i
    # order pin: the dotted-quad local part went to <EMAIL>; the IP count
    # (on the raw text) still saw it — counts are independent by contract
    assert rows[0]["text_redacted"].count("<EMAIL>") == 2
    assert "<IP>" not in rows[0]["text_redacted"]
    assert rows[0]["n_ip"] == 1
    # no-match identity
    assert rows[4]["text_redacted"] == texts[4]


def test_remove_repeated_lines_first_occurrence_order(spark):
    """array_distinct keeps FIRST occurrences in original order (the twin's
    min-ordinality semantics); empty lines dedup like any other; custom
    separators work; dup_line_fraction is exact."""
    from ddsparkle.spark.dataops import remove_repeated_lines

    texts = ["a\nb\na\nc\nb", "x", "", "dup\ndup\ndup", "p1\n\np1\n\np2"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = {r["id"]: r for r in remove_repeated_lines(df).collect()}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        r = rows[i]
        assert r["text_dedup"] == "\n".join(kept), i
        assert r["n_lines"] == len(lines)
        assert r["n_distinct_lines"] == len(seen)
        assert abs(r["dup_line_fraction"] - (len(lines) - len(seen)) / len(lines)) < 1e-12
    sep = {
        r["id"]: r["text_dedup"]
        for r in remove_repeated_lines(
            spark.createDataFrame([(0, "u|v|u")], "id long, text string"), sep="|"
        ).collect()
    }
    assert sep[0] == "u|v"


def test_corpus_line_dedup_reference_parity(spark):
    """Cross-doc keep-first semantics, intra-doc repeats, the min_len
    exemption (empty lines survive everywhere), max_df boilerplate strip,
    NULL pass-through, custom separator, and md5/xxhash64 key agreement —
    all against a pure-Python reference of the documented contract."""
    from ddsparkle.spark.dataops import corpus_line_dedup

    docs = [
        (0, "boiler\nalpha\n\nshared"),
        (1, "beta\nboiler\n\nshared"),
        (2, "boiler\nboiler\ngamma"),
        (3, None),
        (4, "delta"),
    ]

    def ref(rows, min_len=1, max_df=None, sep="\n"):
        from collections import defaultdict

        groups = defaultdict(list)
        for i, t in rows:
            if t is None:
                continue
            for p, ln in enumerate(t.split(sep)):
                if len(ln) >= min_len:
                    groups[ln].append((i, p))
        drops = set()
        for occs in groups.values():
            first = min(occs)
            if max_df is not None and len(occs) > max_df:
                drops.update(occs)
            elif len(occs) > 1:
                drops.update(o for o in occs if o != first)
        out = {}
        for i, t in rows:
            if t is None:
                out[i] = (None, None, None)
                continue
            lines = t.split(sep)
            kept = [ln for p, ln in enumerate(lines) if (i, p) not in drops]
            out[i] = (sep.join(kept), len(lines), len(lines) - len(kept))
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for key in ("xxhash64", "md5"):
        for max_df in (None, 2):
            want = ref(docs, max_df=max_df)
            got = {
                r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_dropped_lines"])
                for r in corpus_line_dedup(df, max_df=max_df, key=key).collect()
            }
            assert got == want, (key, max_df)
    # keep-first detail: doc 0 keeps 'boiler' (global first) and 'shared';
    # doc 2's intra-doc repeat is dropped; empty lines survive in BOTH docs
    got = {
        r["doc_id"]: r["text_dedup"]
        for r in corpus_line_dedup(df).collect()
    }
    assert got[0] == "boiler\nalpha\n\nshared"
    assert got[1] == "beta\n"
    assert got[2] == "gamma"
    # custom separator, regex-quoted
    got_pipe = {
        r["doc_id"]: r["text_dedup"]
        for r in corpus_line_dedup(
            spark.createDataFrame([(0, "a|b|a"), (1, "b|c")], "doc_id long, text string"),
            sep="|",
        ).collect()
    }
    # 'b' first occurs in doc 0 (min (id, pos) wins), so doc 1 loses it
    assert got_pipe == {0: "a|b", 1: "c"}


def test_assign_split_portable_and_deterministic(spark):
    """The split is the documented pure function of (salt, id): replayed
    bit-exactly by hashlib md5; proportions track the weights; a different
    salt reshuffles membership; bad weights raise."""
    import hashlib

    import pytest as _pytest

    from ddsparkle.spark.dataops import assign_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["split"] for r in assign_split(df).collect()
    }

    def ref(i, salt="split", total=100):
        h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) % total
        return "train" if h < 98 else ("val" if h < 99 else "test")

    assert got == {i: ref(i) for i in range(2000)}
    n_train = sum(1 for v in got.values() if v == "train")
    assert 1900 <= n_train <= 2000 and len(set(got.values())) == 3
    other = {
        r["doc_id"]: r["split"]
        for r in assign_split(df, salt="fold2").collect()
    }
    assert other == {i: ref(i, salt="fold2") for i in range(2000)}
    assert other != got
    with _pytest.raises(ValueError):
        assign_split(df, weights=(("a", 1), ("a", 1)))
    with _pytest.raises(ValueError):
        assign_split(df, weights=(("a", 0), ("b", 1)))


def test_hash_sample_by_group_portable(spark):
    """Membership is the documented pure function of (salt, id) — replayed
    by hashlib — uniform-hash independent of group; absent groups drop;
    fraction 0/1 edges exact."""
    import hashlib

    from ddsparkle.spark.dataops import hash_sample_by_group

    rows = [(i, f"src{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"src0": 0.5, "src1": 1.0}  # src2 absent -> dropped
    got = {
        r["doc_id"]
        for r in hash_sample_by_group(df, "source", fr).collect()
    }
    res = 1 << 20

    def h(i, salt="mix"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) % res

    want = {
        i
        for i, src in rows
        if src in fr and h(i) < int(fr[src] * res)
    }
    assert got == want
    assert all(i % 3 != 2 for i in got)
    assert {i for i, s in rows if s == "src1"} <= got  # fraction 1.0 keeps all


def test_temperature_mix_waterfilling(spark):
    """tau=0 equalizes shares (small groups cap at 1.0, excess
    redistributes); tau=1 returns natural fractions; realized counts sit
    near frac*n_g; fractions dict reconciles with target_rows."""
    from ddsparkle.spark.dataops import temperature_mix

    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(90)]
        + [(2000 + i, "tiny") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out, fr = temperature_mix(df, tau=0.0, target_rows=300)
    # equal thirds of 300 = 100 each, but tiny (10) and mid (90) cap at 1.0
    # and their excess redistributes onto big
    assert fr["tiny"] == 1.0 and fr["mid"] == 1.0
    assert abs(fr["big"] * 900 - 200) < 1e-6
    got = out.groupBy("source").count().collect()
    by = {r[0]: r[1] for r in got}
    assert by["tiny"] == 10 and by["mid"] == 90
    assert 150 <= by["big"] <= 250  # binomial around 200
    # tau=1: natural proportions -> every fraction == target/total
    _, fr1 = temperature_mix(df, tau=1.0, target_rows=500)
    for g in ("big", "mid", "tiny"):
        assert abs(fr1[g] - 0.5) < 1e-9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix(df, target_rows=0)


def test_assign_shards_matches_python_prefix_sum(spark):
    """assign_shards == the naive hashlib + global-cumsum replay, including
    NULL text (0 units), a mega-doc straddling several targets (start-bin
    rule), and invariance to input partitioning and bucket_bits."""
    import hashlib

    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import assign_shards

    rows = [(i, "x" * ((i * 37) % 400 + 1)) for i in range(200)]
    rows[7] = (7, None)  # NULL text -> 0 units, still occupies a slot
    rows[50] = (50, "y" * 5000)  # straddles multiple 1k bins
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def replay(target):
        keyed = []
        for i, t in rows:
            h = int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:15], 16)
            keyed.append((h, i, len(t) if t is not None else 0))
        keyed.sort()
        cum, out = 0, {}
        for h, i, u in keyed:
            out[i] = cum // target
            cum += u
        return out

    for target, bits in ((1000, 10), (1000, 2), (250, 4)):
        got = {
            r["doc_id"]: r["shard_id"]
            for r in assign_shards(
                df.repartition(7), target_units=target, bucket_bits=bits
            ).collect()
        }
        assert got == replay(target), (target, bits)
    # units column override
    dfu = df.withColumn("n", (F.col("doc_id") % 5 + 1).cast("long"))
    got = assign_shards(dfu, units_col="n", target_units=17).collect()
    assert all(r["units"] == r["doc_id"] % 5 + 1 for r in got)
    # contiguity: shards partition the canonical hash order into runs
    out = assign_shards(df, target_units=1000).collect()
    byshard = {}
    for r in out:
        h = int(hashlib.md5(f"shard:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        byshard.setdefault(r["shard_id"], []).append(h)
    sids = sorted(byshard)
    for a, b in zip(sids, sids[1:]):
        assert max(byshard[a]) < min(byshard[b])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        assign_shards(df, target_units=0)
    with _pytest.raises(ValueError):
        assign_shards(df, bucket_bits=0)
    assert assign_shards(df.filter(F.lit(False)), target_units=10).count() == 0


def test_duplicated_spans_planted(spark):
    """Hand-planted spans: a 10-token run shared by two docs becomes ONE
    merged span [1,10] (3 overlapping k=8 windows) in each; a within-doc
    repeat counts as occurrences (df counts locations, not documents) and
    yields two spans in the same doc; runs shorter than k are invisible;
    raising min_occurrences past the plant removes everything."""
    from ddsparkle.spark.dataops import duplicated_spans

    run10 = " ".join(f"r{i}" for i in range(10))
    rep8 = " ".join(f"w{i}" for i in range(8))
    rows = [
        (0, run10 + " " + " ".join(f"a{i}" for i in range(6))),
        (1, run10 + " " + " ".join(f"b{i}" for i in range(6))),
        # within-doc repeat: tokens 1-8 and 14-21
        (2, rep8 + " f0 f1 f2 f3 f4 " + rep8),
        # whole-doc duplicate pair BELOW k: no windows, no spans
        (3, "s0 s1 s2 s3 s4"),
        (4, "s0 s1 s2 s3 s4"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): (
            r["span_tokens"],
            r["n_windows"],
        )
        for r in duplicated_spans(df, k=8).collect()
    }
    assert got == {
        (0, 1, 10): (10, 3),
        (1, 1, 10): (10, 3),
        (2, 1, 8): (8, 1),
        (2, 14, 21): (8, 1),
    }
    assert duplicated_spans(df, k=8, min_occurrences=3).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicated_spans(df, k=1)
    with _pytest.raises(ValueError):
        duplicated_spans(df, min_occurrences=1)


def test_strip_duplicated_spans_planted(spark):
    """Strip removes EVERY occurrence of a covered token (the published
    deduplicate-text-datasets behavior): both copies of the shared run go,
    the within-doc repeat leaves only the filler, sub-k duplicates
    survive untouched, NULL text passes through NULL, and a fully
    duplicated doc strips to the empty string."""
    from ddsparkle.spark.dataops import strip_duplicated_spans

    run10 = " ".join(f"r{i}" for i in range(10))
    rep8 = " ".join(f"w{i}" for i in range(8))
    tail0 = " ".join(f"a{i}" for i in range(6))
    rows = [
        (0, run10 + " " + tail0),
        (1, run10),  # fully duplicated -> ''
        (2, rep8 + " f0 f1 f2 f3 f4 " + rep8),
        (3, "s0 s1 s2 s3 s4"),
        (4, "s0 s1 s2 s3 s4"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_stripped"], r["n_tokens"], r["n_dropped_tokens"])
        for r in strip_duplicated_spans(df, k=8).collect()
    }
    assert got[0] == (tail0, 16, 10)
    assert got[1] == ("", 10, 10)
    assert got[2] == ("f0 f1 f2 f3 f4", 21, 16)
    assert got[3] == ("s0 s1 s2 s3 s4", 5, 0)
    assert got[4] == ("s0 s1 s2 s3 s4", 5, 0)
    assert got[5] == (None, None, None)


def test_curate_strip_spans_stage(spark):
    """curate(strip_spans_k=8): the substring-dedup stage runs BETWEEN
    exact and fuzzy dedup, so (a) a shared boilerplate span no longer
    glues unrelated docs into one fuzzy cluster, (b) a doc whose text is
    entirely duplicated windows hollows out and falls to the min_tokens
    gate, (c) the returned frame carries the STRIPPED text, and (d) the
    two span stats account exactly. The control run (no strip) merges the
    boilerplate-glued docs instead — pinning that the stage actually
    changes downstream dedup, not just the stats."""
    from ddsparkle.spark.dataprep import curate

    boil = " ".join(f"b{i}" for i in range(14))
    rows = [
        (0, " ".join(f"u{i}" for i in range(6)) + " " + boil),
        (1, " ".join(f"v{i}" for i in range(6)) + " " + boil),
        (2, " ".join(f"w{i}" for i in range(12))),
        (3, " ".join(f"w{i}" for i in range(12))),  # exact dup of 2
        (4, boil + " " + boil),  # fully duplicated -> strips to ''
    ] + [(i, " ".join(f"f{i}x{j}" for j in range(10))) for i in range(5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(
        jaccard_threshold=0.35, min_tokens=5, num_perm=32, bands=32,
        max_bucket_size=None,
    )

    curated, stats = curate(df, strip_spans_k=8, **kw)
    # d3 exact-dups away; spans: 14 tokens in each of d0/d1, all 28 in d4
    assert stats["input_docs"] == 10
    assert stats["after_exact_dedup"] == 9
    assert stats["span_stripped_tokens"] == 14 + 14 + 28
    assert stats["docs_with_dup_spans"] == 3
    # boilerplate stripped -> d0/d1 share nothing -> no fuzzy merge; the
    # hollowed d4 ('' -> 1 token) falls to the min_tokens gate
    assert stats["after_fuzzy_dedup"] == 9
    assert stats["after_quality_language"] == 8
    got = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert set(got) == {0, 1, 2, 5, 6, 7, 8, 9}
    assert got[0] == "u0 u1 u2 u3 u4 u5"  # the returned text is stripped

    _, control = curate(df, **kw)
    # without the strip, the boilerplate glues {0, 1, 4} into one cluster
    assert control["after_fuzzy_dedup"] == 7
    assert control["after_quality_language"] == 7
    assert "span_stripped_tokens" not in control


def test_duplicated_spans_brute_force(spark):
    """duplicated_spans == a pure-Python occurrence-count + island-merge
    replay on a random small-vocab corpus (seeded), across two k values
    and both min_occurrences regimes."""
    import random

    from ddsparkle.spark.dataops import duplicated_spans

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(7)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def replay(k, mo):
        occ = {}
        for i, t in rows:
            toks = t.split(" ")
            for p in range(len(toks) - k + 1):
                occ.setdefault(tuple(toks[p : p + k]), []).append((i, p + 1))
        dup = {}
        for g, locs in occ.items():
            if len(locs) >= mo:
                for i, p in locs:
                    dup.setdefault(i, set()).add(p)
        out = set()
        for i, ps in dup.items():
            run = []
            for p in sorted(ps):
                if run and p > run[-1] + k:
                    out.add((i, run[0], run[-1] + k - 1, len(run)))
                    run = []
                run.append(p)
            out.add((i, run[0], run[-1] + k - 1, len(run)))
        return out

    for k, mo in ((3, 2), (5, 2), (3, 4)):
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in duplicated_spans(df, k=k, min_occurrences=mo).collect()
        }
        assert got == replay(k, mo), (k, mo)


def test_semdedup_dominated_rule(spark):
    """Identical-direction vectors (cosine 1.0) always share a cluster
    (same argmax scores), so the dominated rule keeps exactly the smallest
    id of each duplicate group; an isolated orthogonal vector is kept;
    scaling a vector never changes its fate (cosine is scale-free)."""
    import pytest as _pytest

    from ddsparkle.spark.dataops import semdedup

    dim = 8

    def axis(i, scale=1.0):
        v = [0.0] * dim
        v[i] = scale
        return v

    rows = [
        (0, axis(0)),
        (1, axis(0, 2.0)),   # same direction, scaled -> dup of 0
        (2, axis(0, 0.5)),   # dup of 0
        (10, axis(1)),
        (11, axis(1, 3.0)),  # dup of 10
        (20, axis(2)),       # isolated
    ]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    got = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup(df, emb_col="e", n_clusters=2, threshold=0.99).collect()
    }
    assert got == {0: True, 1: False, 2: False, 10: True, 11: False, 20: True}
    # cluster column: dup groups share their cluster id
    cl = {
        r["vec_id"]: r["cluster"]
        for r in semdedup(df, emb_col="e", n_clusters=2, threshold=0.99).collect()
    }
    assert cl[0] == cl[1] == cl[2] and cl[10] == cl[11]
    with _pytest.raises(ValueError):
        semdedup(df, emb_col="e", n_clusters=1)


def test_weighted_sample_matches_python_priority_replay(spark):
    """Membership, priorities, tau, and est_weight all bit-equal a pure
    hashlib+IEEE-double replay (the cross-engine exactness contract);
    NULL-id / NULL-weight / non-positive-weight rows are excluded."""
    import hashlib

    from ddsparkle.spark.dataops import weighted_sample

    rows = [(f"d{i}", (i * 37) % 500 + 1) for i in range(400)]
    bad = [("dnullw", None), (None, 50), ("dzero", 0), ("dneg", -3)]
    df = spark.createDataFrame(rows + bad, "doc_id string, w long").repartition(7)
    out = weighted_sample(df, "w", id_col="doc_id", k=50, salt="t").collect()

    pri = {}
    for did, w in rows:
        h = int(hashlib.md5(f"t:{did}".encode()).hexdigest()[:15], 16)
        pri[did] = (float(w) * float(1 << 60)) / float(h + 1)
    ordered = sorted(pri.items(), key=lambda kv: (-kv[1], kv[0]))
    want_ids = {d for d, _ in ordered[:50]}
    tau = ordered[50][1]

    got = {r["doc_id"]: r for r in out}
    assert set(got) == want_ids
    for d, r in got.items():
        assert r["priority"] == pri[d]  # bit-equal double
        assert r["threshold"] == tau
        assert r["est_weight"] == max(float(r["w"]), tau)
    # priority sampling is weight-proportional-ish: the sampled mean weight
    # must exceed the population mean (heavier rows have larger priorities)
    assert np.mean([r["w"] for r in out]) > np.mean([w for _, w in rows])


def test_weighted_sample_k_at_least_n_is_exhaustive(spark):
    """k >= n: every positive-weight row sampled, tau = 0, est_weight = w
    exactly (the estimator degenerates to the exact total)."""
    from ddsparkle.spark.dataops import weighted_sample

    df = spark.createDataFrame(
        [("a", 3.5), ("b", 1.0), ("c", 2.25)], "doc_id string, w double"
    )
    out = weighted_sample(df, "w", id_col="doc_id", k=10, salt="s").collect()
    assert {r["doc_id"] for r in out} == {"a", "b", "c"}
    for r in out:
        assert r["threshold"] == 0.0
        assert r["est_weight"] == r["w"]


def test_parse_json_fields_null_semantics(spark):
    """All five NULL modes (malformed, NULL input, missing key, JSON null,
    failed cast) and the valid_object flag, pinned against the documented
    DuckDB-equivalent semantics."""
    from ddsparkle.spark.dataops import parse_json_fields

    rows = [
        ("a", '{"k": 69}'),
        ("b", '{"x": 1}'),
        ("c", "not json"),
        ("d", '{"k": "abc"}'),
        ("e", None),
        ("f", '{"k": null}'),
        ("g", '{"k": 7, "m": "z"}'),
        ("h", "5"),  # valid JSON, not an object
    ]
    df = spark.createDataFrame(rows, "id string, props string")
    out = {
        r["id"]: r
        for r in parse_json_fields(
            df, "props", {"k": ("$.k", "long"), "k_raw": ("$.k", None)}
        ).collect()
    }
    assert [out[i]["k"] for i in "abcdefgh"] == [69, None, None, None, None, None, 7, None]
    assert [out[i]["k_raw"] for i in "abcdefgh"] == [
        "69", None, None, "abc", None, None, "7", None,
    ]
    assert [out[i]["valid_object"] for i in "abcdefgh"] == [
        True, True, False, True, False, True, True, False,
    ]
    # input columns pass through untouched
    assert out["a"]["props"] == '{"k": 69}'


def test_json_key_profile_counts(spark):
    from ddsparkle.spark.dataops import json_key_profile

    rows = [
        ('{"k": 69}',), ('{"x": 1}',), ("not json",), ('{"k": "abc"}',),
        (None,), ('{"k": null}',), ('{"k": 7, "m": "z"}',), ("5",),
    ]
    df = spark.createDataFrame(rows, "props string")
    got = {r["key"]: r["n_rows"] for r in json_key_profile(df, "props").collect()}
    assert got == {"k": 4, "x": 1, "m": 1}


def test_readability_signals_reference_parity(spark):
    """Counts match a Python re replay; the score formula matches the
    pinned operation order; no-word text scores NULL; the sentence clamp
    engages on punctuation-free text."""
    import re

    from ddsparkle.spark.dataops import readability_signals

    rows = [
        ("a", "the quick brown fox. it jumps! over lazy dogs?"),
        ("b", "no punctuation here at all"),
        ("c", ""),
        ("d", "   "),
        ("e", None),
        ("f", "aaa eee iii. yyy!"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in readability_signals(df).collect()}
    for rid, txt in rows:
        r = got[rid]
        if txt is None:
            assert r["n_words"] is None and r["flesch"] is None
            continue
        w = len(re.findall(r"[^ ]+", txt))
        s = len(re.findall(r"[.!?]+", txt))
        y = len(re.findall(r"[aeiouyAEIOUY]+", txt))
        assert (r["n_words"], r["n_sentences"], r["n_syllable_groups"]) == (w, s, y)
        if w == 0:
            assert r["flesch"] is None
        else:
            want = 206.835 - 1.015 * (w / max(s, 1)) - 84.6 * (y / w)
            assert r["flesch"] == want  # bit-equal: same op order


def _kmeans_numpy_replay(Q, k, iters, scale_bits):
    """Reference replay of the operator's exact arithmetic (pinned fold)."""
    scale = float(2**scale_bits)
    C = Q[:k].astype(np.float64) / scale
    X = Q.astype(np.float64) / scale

    def dists(X, C):
        acc = np.zeros((X.shape[0], C.shape[0]))
        for d in range(X.shape[1]):
            t = X[:, d, None] - C[None, :, d]
            acc = acc + t * t
        return acc

    for _ in range(iters):
        a = np.argmin(dists(X, C), axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = Q[m].sum(axis=0).astype(np.float64) / float(
                    m.sum() * 2**scale_bits
                )
    d = dists(X, C)
    a = np.argmin(d, axis=1)
    return a, d[np.arange(len(a)), a]


def test_kmeans_embeddings_matches_numpy_replay(spark):
    from ddsparkle.spark.dataops import kmeans_embeddings

    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (
        kmeans_embeddings(df, k=3, iters=3, scale_bits=20)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    Q = np.floor(X.astype(np.float64) * 2**20 + 0.5).astype(np.int64)
    a, d = _kmeans_numpy_replay(Q, k=3, iters=3, scale_bits=20)
    assert got["cluster"].tolist() == a.tolist()
    assert (got["dist"].values == d).all()  # bit-equal, pinned fold order


def test_kmeans_embeddings_partitioning_invariant(spark):
    from ddsparkle.spark.dataops import kmeans_embeddings

    rng = np.random.default_rng(3)
    X = rng.normal(size=(80, 4)).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    outs = []
    for nparts in (1, 7):
        got = (
            kmeans_embeddings(df.repartition(nparts), k=4, iters=2)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0]["cluster"].tolist() == outs[1]["cluster"].tolist()
    assert (outs[0]["dist"].values == outs[1]["dist"].values).all()


def test_kmeans_embeddings_empty_cluster_and_errors(spark):
    from ddsparkle.spark.dataops import kmeans_embeddings

    # two distinct points, k=3: cluster 1 (duplicate of point 0's init twin)
    # goes empty after round 1 and must keep its init centroid, not NaN
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [1.0, 1.0]),
        (3, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (
        kmeans_embeddings(df, k=3, iters=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == 4
    assert not got["dist"].isna().any()
    # ties break to the smallest cluster id: the duplicate-origin points all
    # land in cluster 0 (centroids 0 and 1 coincide at the origin)
    assert got.loc[got["vec_id"] <= 1, "cluster"].tolist() == [0, 0]
    assert got.loc[got["vec_id"] >= 2, "cluster"].tolist() == [2, 2]
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=9)


def test_tfidf_top_terms_vs_python(spark):
    from collections import Counter

    from ddsparkle.spark.dataops import tfidf_top_terms

    texts = {
        1: "a b a b c d",
        2: "a b x y x y",
        3: "c d c d c d",
        4: "a",  # shorter than the bigram -> contributes nothing
        5: None,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = tfidf_top_terms(df, k=2).toPandas().sort_values(["doc_id", "rank"])
    # python replay
    grams = {
        i: [" ".join(p) for p in zip(t.split(" "), t.split(" ")[1:])]
        for i, t in texts.items()
        if t and len(t.split(" ")) >= 2
    }
    tf = {i: Counter(g) for i, g in grams.items()}
    dfreq = Counter(term for c in tf.values() for term in c)
    n = 4  # docs with non-null text
    rows = []
    for i, c in tf.items():
        scored = sorted(
            (
                (-t * (n // dfreq[g]).bit_length(), g, t, dfreq[g])
                for g, t in c.items()
            )
        )
        for r, (neg, g, t, d) in enumerate(scored[:2], 1):
            rows.append((i, g, t, d, -neg, r))
    import pandas as pd_

    want = pd_.DataFrame(
        rows, columns=["doc_id", "term", "tf", "df", "score", "rank"]
    ).sort_values(["doc_id", "rank"])
    assert got.values.tolist() == want.values.tolist()


def test_exact_moments_vs_scipy_style_replay(spark):
    from ddsparkle.spark.dataops import exact_moments

    rng = np.random.default_rng(9)
    vals = np.round(np.exp(rng.normal(3, 1, 3000)), 2)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    row = exact_moments(df, "value").collect()[0]
    assert row["n"] == 3000
    # moment replay on exact cents
    c = np.round(vals * 100).astype(np.int64).astype(np.float64)
    mean, m2 = c.mean(), ((c - c.mean()) ** 2).mean()
    m3 = ((c - c.mean()) ** 3).mean()
    m4 = ((c - c.mean()) ** 4).mean()
    assert abs(row["mean"] - mean / 100) < 1e-9 * abs(mean / 100)
    assert abs(row["std"] - np.sqrt(m2) / 100) < 1e-6
    assert abs(row["skewness"] - m3 / m2**1.5) < 1e-6
    assert abs(row["kurtosis"] - (m4 / m2**2 - 3)) < 1e-6


def test_exact_moments_partition_invariant_bit_equal(spark):
    from ddsparkle.spark.dataops import exact_moments

    rng = np.random.default_rng(11)
    vals = np.round(np.exp(rng.normal(0, 2, 2000)), 2)
    rows = [(float(v),) for v in vals]
    outs = []
    for nparts in (1, 17):
        df = spark.createDataFrame(rows, "value double").repartition(nparts)
        r = exact_moments(df, "value").collect()[0]
        outs.append((r["mean"], r["std"], r["skewness"], r["kurtosis"]))
    assert outs[0] == outs[1]  # bit-equal: integer sums are order-free


def test_exact_moments_grouped_known_values(spark):
    from ddsparkle.spark.dataops import exact_moments

    # symmetric group: skew 0; uniform {1,2,3}: kurtosis = -1.5 exactly
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 1.0), ("b", 1.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r["g"]: r for r in exact_moments(df, "value", by="g").collect()}
    assert got["a"]["skewness"] == 0.0
    # raw-moment formulas carry benign cancellation noise (~1e-13 here);
    # the noise is DETERMINISTIC (pinned expression tree over exact integer
    # sums), which is what the cross-engine hash gate relies on
    assert abs(got["a"]["kurtosis"] - (-1.5)) < 1e-9
    assert abs(got["a"]["mean"] - 2.0) < 1e-12


def test_funnel_counts_constructed(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import funnel_counts

    rows = [
        # u1 completes the funnel in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:00:01"),
        (1, "purchase", "2024-01-01 00:00:02"),
        # u2 clicks BEFORE viewing -> reaches only step 1
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 00:00:01"),
        # u3 views and clicks at the SAME instant -> strict > blocks step 2
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-01 00:00:00"),
        # u4 never views -> not in the funnel at all
        (4, "purchase", "2024-01-01 00:00:00"),
        # u5: greedy-earliest — late click still chains after early view
        (5, "view", "2024-01-01 00:00:00"),
        (5, "click", "2024-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["step"]: r
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got[1]["n_users"] == 4  # u1, u2, u3, u5 viewed
    assert got[2]["n_users"] == 2  # u1, u5
    assert got[3]["n_users"] == 1  # u1
    assert got[2]["conv_rate"] == 0.5
    assert got[1]["conv_rate"] is None
    with pytest.raises(ValueError):
        funnel_counts(df, ["view"])


def test_exact_quantiles_histogram_vs_numpy(spark):
    from ddsparkle.spark.dataops import exact_quantiles_histogram

    rng = np.random.default_rng(13)
    vals = np.round(np.exp(rng.normal(0, 1, 5000)), 2)
    rows = [(float(v),) for v in vals] + [(None,)]
    df = spark.createDataFrame(rows, "value double")
    got = exact_quantiles_histogram(df, "value", (0.5, 0.95, 0.99)).collect()[0]
    assert got["count"] == 5000.0
    s = np.sort(vals)
    for q, name in [(0.5, "q50"), (0.95, "q95"), (0.99, "q99")]:
        assert got[name] == s[int(np.floor(q * (len(s) - 1)))], name


def test_exact_quantiles_histogram_partition_invariant(spark):
    from ddsparkle.spark.dataops import exact_quantiles_histogram

    rows = [(float(v % 17),) for v in range(1000)]
    a = exact_quantiles_histogram(
        spark.createDataFrame(rows, "value double").repartition(3), "value", (0.5,)
    ).collect()[0]
    b = exact_quantiles_histogram(
        spark.createDataFrame(rows, "value double").repartition(11), "value", (0.5,)
    ).collect()[0]
    assert (a["q50"], a["count"]) == (b["q50"], b["count"])


def test_kmeans_checkpoint_resume_bit_identical(spark, tmp_path):
    from ddsparkle.spark.dataops import kmeans_embeddings

    rng = np.random.default_rng(21)
    X = rng.normal(size=(50, 4)).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ck = str(tmp_path / "km")
    direct = (
        kmeans_embeddings(df, k=3, iters=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # run 2 iterations with a checkpoint ("the job was killed")...
    kmeans_embeddings(df, k=3, iters=2, checkpoint=ck).collect()
    import os

    assert os.path.exists(f"{ck}/iter_2.json")
    # ...then resume to 4: must bit-equal the uninterrupted 4-iteration run
    resumed = (
        kmeans_embeddings(df, k=3, iters=4, checkpoint=ck)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert resumed["cluster"].tolist() == direct["cluster"].tolist()
    assert (resumed["dist"].values == direct["dist"].values).all()
    # stale checkpoints with mismatched params are ignored, not misused
    other = (
        kmeans_embeddings(df, k=3, iters=4, scale_bits=16, checkpoint=ck)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(other) == 50


def test_burn_rate_alerts_constructed(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import burn_rate_alerts

    # minutes 0-1 healthy, minute 2 spikes, minute 10 isolated blip after a
    # GAP (minutes 3-9 empty — the RANGE frame must not stretch across it)
    rows = []
    for m, errs, total in [(0, 0, 10), (1, 1, 10), (2, 8, 10), (10, 5, 10)]:
        for i in range(total):
            rows.append(
                (f"2024-01-01 00:{m:02d}:{i:02d}", "error" if i < errs else "view")
            )
    df = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["minute_ts"].minute: r
        for r in burn_rate_alerts(
            df, slo=0.9, short_minutes=2, long_minutes=4, threshold=2.0
        ).collect()
    }
    # minute 2: short window = minutes 1-2 -> 9/20 errors, burn 4.5;
    # long window = minutes 0-2 (gap-free part) -> 9/30, burn 3.0 -> ALERT
    assert abs(got[2]["burn_short"] - 4.5) < 1e-12
    assert abs(got[2]["burn_long"] - 3.0) < 1e-12
    assert got[2]["is_alert"] is True
    # minute 0: healthy
    assert got[0]["is_alert"] is False
    # minute 10: the RANGE frame sees ONLY minute 10 (gap excluded) in the
    # short window (minutes 9-10) and minutes 7-10 in the long -> both 5/10,
    # burn 5.0 -> alert; a ROWS frame would have wrongly pulled minute 2 in
    assert abs(got[10]["burn_short"] - 5.0) < 1e-12
    assert got[10]["is_alert"] is True


def test_funnel_counts_conversion_window(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import funnel_counts

    rows = [
        # u1: click 10 min after view -> inside a 30-min window
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:10:00"),
        # u2: click 2 HOURS after view -> outside the window
        (2, "view", "2024-01-01 00:00:00"),
        (2, "click", "2024-01-01 02:00:00"),
        # u3: early click expires, a second click inside the window counts
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-01 00:29:59"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click"], max_gap_minutes=30).collect()
    }
    assert got == {1: 3, 2: 2}
    # no gap bound: everyone converts
    got2 = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click"]).collect()
    }
    assert got2 == {1: 3, 2: 3}


def test_cohort_retention_constructed(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import cohort_retention

    rows = [
        # cohort week of Jan 1 2024 (Mon): u1 active weeks 0,1,2; u2 weeks 0,2
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-08 10:00:00"),
        (1, "2024-01-15 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        (2, "2024-01-17 10:00:00"),
        # cohort week of Jan 8: u3 active weeks 0,1
        (3, "2024-01-09 10:00:00"),
        (3, "2024-01-16 10:00:00"),
        (None, "2024-01-01 10:00:00"),  # NULL user excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r["cohort_epoch_s"], r["k"]): r
        for r in cohort_retention(df, granularity="week").collect()
    }
    cohorts = sorted({c for c, _ in got})
    assert len(cohorts) == 2
    c0, c1 = cohorts
    assert got[(c0, 0)]["n_users"] == 2 and got[(c0, 0)]["retained_pct"] == 1.0
    assert got[(c0, 1)]["n_users"] == 1 and got[(c0, 1)]["retained_pct"] == 0.5
    assert got[(c0, 2)]["n_users"] == 2
    assert got[(c1, 0)]["n_users"] == 1 and got[(c1, 1)]["n_users"] == 1
    assert (c1, 2) not in got


def test_top_event_paths_constructed(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import top_event_paths

    rows = [
        # u1: a b c a b c -> paths a>b>c x2, b>c>a x1, c>a>b x1
        (1, 1, "a", "2024-01-01 00:00:00"),
        (1, 2, "b", "2024-01-01 00:00:01"),
        (1, 3, "c", "2024-01-01 00:00:02"),
        (1, 4, "a", "2024-01-01 00:00:03"),
        (1, 5, "b", "2024-01-01 00:00:04"),
        (1, 6, "c", "2024-01-01 00:00:05"),
        # u2: same-instant events -> ordered by event_id deterministically
        (2, 7, "x", "2024-01-01 00:00:00"),
        (2, 8, "y", "2024-01-01 00:00:00"),
        (2, 9, "z", "2024-01-01 00:00:00"),
        # u3: too short for a trigram
        (3, 10, "a", "2024-01-01 00:00:00"),
        (3, 11, "b", "2024-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["path"]: r for r in top_event_paths(df, n=3, k=10).collect()}
    assert got["a>b>c"]["n_occurrences"] == 2 and got["a>b>c"]["rank"] == 1
    assert got["x>y>z"]["n_occurrences"] == 1
    assert set(got) == {"a>b>c", "b>c>a", "c>a>b", "x>y>z"}


class TestPmiPairs:
    def _docs(self, spark):
        # 20 docs from a boilerplate vocabulary (in every doc -> banded out),
        # plus planted content bigrams: "alpha beta" & "gamma delta" co-occur
        # in docs 0-3 (4 of 20); "alpha beta" & "zz qq" share only doc 0.
        rows = []
        for i in range(20):
            base = "the cat sat on the mat"
            extra = ""
            if i < 4:
                extra = " alpha beta gamma delta"
            elif i < 8:
                extra = " alpha beta"
            elif i < 12:
                extra = " gamma delta"
            if i == 0:
                extra += " zz qq"
            rows.append((i, base + extra))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_pair_ranks_first(self, spark):
        from ddsparkle.spark.dataops import pmi_pairs

        out = pmi_pairs(
            self._docs(spark), ngram=2, min_df=2, max_df_den=2,
            min_pair=2, k=10,
        ).collect()
        assert out, "expected at least one surviving pair"
        # exact integer score replicated in python for every returned row
        n = 20
        for r in out:
            assert r["score"] == (r["n_pairs"] * n * (1 << 20)) // (
                r["df_a"] * r["df_b"]
            )
        # boilerplate bigrams (df=20, in every doc) are banded out entirely
        for r in out:
            assert "the cat" not in (r["term_a"], r["term_b"])
            assert "cat sat" not in (r["term_a"], r["term_b"])
        ranks = [r["rank"] for r in out]
        assert ranks == sorted(ranks) and ranks[0] == 1

    def test_min_pair_filters_singletons(self, spark):
        from ddsparkle.spark.dataops import pmi_pairs

        out = pmi_pairs(
            self._docs(spark), ngram=2, min_df=2, max_df_den=2,
            min_pair=2, k=100,
        ).collect()
        # "zz qq" co-occurs with anything only in doc 0 -> below min_pair
        terms = {r["term_a"] for r in out} | {r["term_b"] for r in out}
        assert "zz qq" not in terms

    def test_null_text_ignored(self, spark):
        from ddsparkle.spark.dataops import pmi_pairs

        base = self._docs(spark)
        with_null = base.union(
            spark.createDataFrame([(99, None)], "doc_id long, text string")
        )
        a = sorted(map(tuple, pmi_pairs(base, min_df=2, max_df_den=2).collect()))
        b = sorted(map(tuple, pmi_pairs(with_null, min_df=2, max_df_den=2).collect()))
        assert a == b

    def test_validation(self, spark):
        import pytest as _pytest

        from ddsparkle.spark.dataops import pmi_pairs

        with _pytest.raises(ValueError):
            pmi_pairs(self._docs(spark), min_df=0)


class TestProfileTable:
    def test_profile_semantics(self, spark):
        from ddsparkle.spark.dataops import profile_table

        rows = [
            (i, float(i) + 0.5 if i % 5 else None,
             "hot" if i < 60 else f"cold{i}", None if i % 2 else "x")
            for i in range(100)
        ]
        df = spark.createDataFrame(
            rows, "id long, v double, s string, half_null string"
        )
        out = {r["column"]: r for r in profile_table(df, mg_k=16).collect()}
        assert out["id"]["n_rows"] == 100 and out["id"]["n_null"] == 0
        assert out["v"]["n_null"] == 20
        assert out["id"]["vmin"] == 0.0 and out["id"]["vmax"] == 99.0
        assert out["id"]["n_distinct"] is None  # numeric: no distinct stats
        # 'hot' freq 60 > 100/16 -> reliable top, exact count
        assert out["s"]["top_value"] == "hot" and out["s"]["top_count"] == 60
        assert out["s"]["n_distinct"] == 41 and out["s"]["distinct_within_3rse"]
        # all-equal-frequency column: NULL top (below the MG bound rule...
        # here 'x' freq 50 > 100/16 so it IS reliable; check the null count
        assert out["half_null"]["n_null"] == 50
        assert out["half_null"]["top_value"] == "x"
        assert out["half_null"]["top_count"] == 50
        # quantile columns exist and are ordered for the numeric col
        assert out["v"]["q50"] <= out["v"]["q99"]

    def test_profile_top_below_bound_is_null(self, spark):
        from ddsparkle.spark.dataops import profile_table

        # 64 distinct singletons, mg_k=16: max freq 1 <= 64/16 -> NULL top
        df = spark.createDataFrame(
            [(i, f"u{i}") for i in range(64)], "id long, s string"
        )
        out = {r["column"]: r for r in profile_table(df, mg_k=16).collect()}
        assert out["s"]["top_value"] is None and out["s"]["top_count"] is None
        assert out["s"]["n_distinct"] == 64

    def test_profile_timestamp_minmax_only(self, spark):
        from ddsparkle.spark.dataops import profile_table

        df = spark.sql(
            "SELECT id, timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts "
            "FROM range(10)"
        )
        out = {r["column"]: r for r in profile_table(df).collect()}
        assert out["ts"]["q50"] is None  # epochs are never sketch-quantiled
        assert out["ts"]["vmax"] - out["ts"]["vmin"] == 9_000_000.0


class TestIntervalCoverage:
    """merge_intervals / interval_coverage semantics pins."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, start_us long, end_us long"
        )

    def test_merge_touch_gap_containment(self, spark):
        from ddsparkle.spark.dataops import interval_coverage

        rows = [
            # user 1: [0,10] + touching [10,20] merge; gap then [30,40]
            (1, 1, 0, 10),
            (1, 2, 10, 20),
            (1, 3, 30, 40),
            # user 2: containment — [0,100] swallows [10,20]; [150,160]
            (2, 1, 0, 100),
            (2, 2, 10, 20),
            (2, 3, 150, 160),
            # user 3: chain where each overlaps ONLY its neighbor
            (3, 1, 0, 10),
            (3, 2, 5, 15),
            (3, 3, 14, 30),
        ]
        got = {
            r["user_id"]: r.asDict()
            for r in interval_coverage(
                self._df(spark, rows), order_cols=("event_id",)
            ).collect()
        }
        assert got[1] == {
            "user_id": 1,
            "n_intervals": 3,
            "n_episodes": 2,
            "covered_us": 30,
            "max_episode_us": 20,
        }
        assert got[2] == {
            "user_id": 2,
            "n_intervals": 3,
            "n_episodes": 2,
            "covered_us": 110,
            "max_episode_us": 100,
        }
        assert got[3] == {
            "user_id": 3,
            "n_intervals": 3,
            "n_episodes": 1,
            "covered_us": 30,
            "max_episode_us": 30,
        }

    def test_partitioning_invariant(self, spark):
        """Episode assignment is a pure function of the sorted intervals —
        identical at any input partitioning (the window repartitions)."""
        from ddsparkle.spark.dataops import interval_coverage

        rows = [
            (u, i, (i * 7919) % 50, (i * 7919) % 50 + 1 + (i % 9))
            for u in range(4)
            for i in range(40)
        ]
        base = interval_coverage(
            self._df(spark, rows), order_cols=("event_id",)
        ).collect()
        shuffled = interval_coverage(
            self._df(spark, rows).repartition(13), order_cols=("event_id",)
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_vocab_stats_constructed(spark):
    """bitlen surprisal + hapax/vocab on a corpus small enough to check by
    hand: tokens = [a a a b b c] -> n=6, vocab=3, hapax=1, surprisal =
    3*bitlen(2) + 2*bitlen(3) + 1*bitlen(6) = 3*2 + 2*2 + 1*3 = 13."""
    from ddsparkle.spark.dataops import vocab_stats

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b b c"), (3, None)], "doc_id long, text string"
    )
    row = vocab_stats(df).collect()[0].asDict()
    assert row == {
        "n_docs": 2,
        "n_tokens": 6,
        "vocab_size": 3,
        "n_hapax": 1,
        "surprisal_bits": 13,
        "top_token": "a",
        "top_count": 3,
    }


class TestEditDistancePairs:
    @staticmethod
    def _ed(a, b):
        # textbook DP, the independent oracle for the recall pin
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    def _fixture(self):
        # clusters of near strings with substitutions, indels, and exact
        # dups; plus unrelated strings and short/empty edge cases
        words = []
        for i in range(30):
            base = f"entity-{i:03d}-alpha"
            words.append(base)
            if i % 3 == 0:
                words.append(base.replace("alpha", "alpht"))  # sub
            if i % 4 == 0:
                words.append(base[:7] + base[8:])  # deletion
            if i % 5 == 0:
                words.append(base[:4] + "X" + base[4:])  # insertion
            if i % 7 == 0:
                words.append(base)  # exact dup
        words += ["", "a", "ab", "zzzz-unrelated"]
        return [(i, w) for i, w in enumerate(words)]

    def _check(self, spark, d):
        from ddsparkle.spark.dataops import edit_distance_pairs

        rows = self._fixture()
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            map(tuple, edit_distance_pairs(df, max_edits=d).collect())
        )
        want = sorted(
            (ia, ib, self._ed(a, b))
            for (ia, a) in rows
            for (ib, b) in rows
            if ia < ib and self._ed(a, b) <= d
        )
        assert got == want  # lossless: blocking found EVERY true pair

    def test_recall_exhaustive_d1(self, spark):
        self._check(spark, 1)

    def test_recall_exhaustive_d2(self, spark):
        self._check(spark, 2)

    def test_bad_d_raises(self, spark):
        import pytest as _pytest

        from ddsparkle.spark.dataops import edit_distance_pairs

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="max_edits"):
            edit_distance_pairs(df, max_edits=3)


def test_fk_audit_constructed(spark):
    """Hand-checkable FK audit: child keys [1,1,2,NULL,9,9,9] against
    parent {1,2,3} -> 7 child rows, 1 NULL key, 3 orphan rows (the 9s),
    1 distinct orphan key. A second intact relation pins the zero path,
    and a duplicated parent key pins the distinct-before-join dedup (a
    child row must never double-count by matching two parent rows)."""
    from ddsparkle.spark.dataops import fk_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (9,), (9,), (9,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (1,), (2,), (3,)], "p long")
    out = {
        r["relation"]: r.asDict()
        for r in fk_audit(
            [
                ("dirty", child, "k", parent, "p"),
                ("clean", parent, "p", parent, "p"),
            ]
        ).collect()
    }
    assert out["dirty"] == {
        "relation": "dirty",
        "n_child": 7,
        "n_null_keys": 1,
        "n_orphans": 3,
        "n_distinct_orphan_keys": 1,
    }
    assert out["clean"] == {
        "relation": "clean",
        "n_child": 4,
        "n_null_keys": 0,
        "n_orphans": 0,
        "n_distinct_orphan_keys": 0,
    }


def test_fd_profile_constructed(spark):
    """Hand-checkable: key over [1,1,2,NULL] -> 3 non-null rows, 2 groups,
    1 duplicate row, max group 2; fd a->b with a=1 mapping to {x,y} and
    a=2 to {x, NULL} -> 2 groups, exactly 1 violating group (NULL rhs is
    ignored, so a=2 stays clean), max distinct rhs 2."""
    from ddsparkle.spark.dataops import fd_profile

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, None), (None, "z")],
        "a long, b string",
    )
    out = {
        r["constraint_name"]: r.asDict()
        for r in fd_profile(df, keys=[("a",)], fds=[(("a",), "b")]).collect()
    }
    assert out["key(a)"] == {
        "constraint_name": "key(a)",
        "kind": "key",
        "n_rows": 5,
        "n_groups": 2,
        "n_violations": 2,
        "max_cardinality": 2,
    }
    assert out["fd(a->b)"] == {
        "constraint_name": "fd(a->b)",
        "kind": "fd",
        "n_rows": 5,
        "n_groups": 2,
        "n_violations": 1,
        "max_cardinality": 2,
    }


class TestInvertedIndex:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "a b a b c"),
                (2, "a b x"),
                (3, "a b"),
                (4, "z"),
                (5, None),
            ],
            "doc_id long, text string",
        )

    def test_unigram_counts_and_postings(self, spark):
        from ddsparkle.spark.dataops import inverted_index

        out = {
            r["term"]: r.asDict()
            for r in inverted_index(self._docs(spark)).collect()
        }
        assert out["a"]["df"] == 3 and out["a"]["tf_total"] == 4
        assert [
            (p["doc_id"], p["tf"]) for p in out["a"]["postings"]
        ] == [(1, 2), (2, 1), (3, 1)]
        assert out["z"]["df"] == 1
        assert "" not in out  # NULL text contributes nothing

    def test_bigram_min_df_and_stopword_bound(self, spark):
        from ddsparkle.spark.dataops import inverted_index

        out = {
            r["term"]: r.asDict()
            for r in inverted_index(
                self._docs(spark), ngram=2, min_df=2, max_postings=2
            ).collect()
        }
        # 'a b' in docs 1(2x),2,3 -> df=3 > max_postings -> counts kept,
        # postings NULL; 'b a'/'b c'/'b x' have df=1 -> dropped by min_df;
        # single-token doc 4 must yield NO reversed-sequence gram
        assert set(out) == {"a b"}
        assert out["a b"]["df"] == 3
        assert out["a b"]["tf_total"] == 4
        assert out["a b"]["postings"] is None


def test_histogram_drift_constructed(spark):
    """Buckets over [0,10) in 2 buckets of width 5: a=[1,2,7,-3,99],
    b=[1,6,6]. Underflow clamps to -1, overflow to 2. rate_ppm is exact
    integer DIV of million-scaled counts."""
    from ddsparkle.spark.dataops import histogram_drift

    a = spark.createDataFrame([(1.0,), (2.0,), (7.0,), (-3.0,), (99.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (6.0,), (6.0,), (None,)], "v double")
    rows = {
        r["bucket"]: r.asDict()
        for r in histogram_drift(a, b, "v", lo=0.0, hi=10.0, n_buckets=2).collect()
    }
    assert rows[-1]["count_a"] == 1 and rows[-1]["count_b"] == 0
    assert rows[0] == {
        "bucket": 0, "count_a": 2, "count_b": 1,
        "rate_ppm_a": 400000, "rate_ppm_b": 333333, "drift_ppm": 66667,
    }
    assert rows[1]["count_a"] == 1 and rows[1]["count_b"] == 2
    assert rows[2]["count_a"] == 1 and rows[2]["count_b"] == 0
    assert set(rows) == {-1, 0, 1, 2}


def test_quota_sample_constructed(spark):
    """Quotas: g1 wants 2 of 3 (cut by digest order), g2 wants 5 of 2
    (shortfall -> whole population), g3 quota 0, g4 unmentioned ->
    dropped; NULL id excluded. Partition-invariance: repartition(7)
    selects the identical id set."""
    from ddsparkle.spark.dataops import quota_sample

    rows = [(i, "g1") for i in (1, 2, 3)] + [(4, "g2"), (5, "g2")]
    rows += [(6, "g3"), (7, "g4"), (None, "g1")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    quotas = {"g1": 2, "g2": 5, "g3": 0}
    got = quota_sample(df, quotas, by="source", id_col="doc_id").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_g.get("g1", ())) == 2 and by_g["g1"] <= {1, 2, 3}
    assert by_g["g2"] == {4, 5}
    assert "g3" not in by_g and "g4" not in by_g
    again = quota_sample(
        df.repartition(7), quotas, by="source", id_col="doc_id"
    ).collect()
    assert sorted((r["doc_id"], r["source"]) for r in got) == sorted(
        (r["doc_id"], r["source"]) for r in again
    )


def test_dimensional_rollup_and_pivot_constructed(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import dimensional_rollup, pivot_report

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "d1 string, d2 string, v long"
    )
    cube = {
        (r["d1"], r["d2"], r["grouping_id"]): r["s"]
        for r in dimensional_rollup(
            df, ["d1", "d2"], [F.sum("v").alias("s")]
        ).collect()
    }
    assert cube[("a", "x", 0)] == 1 and cube[("a", None, 1)] == 3
    assert cube[(None, "x", 2)] == 4 and cube[(None, None, 3)] == 6
    roll = dimensional_rollup(
        df, ["d1", "d2"], [F.sum("v").alias("s")], mode="rollup"
    ).collect()
    assert len(roll) == 6  # 3 leaves + 2 d1 subtotals + 1 grand total
    piv = {
        r["d1"]: (r["x"], r["y"], r["z"])
        for r in pivot_report(
            df, "d1", "d2", ["x", "y", "z"],
            lambda c: F.sum(F.when(c, F.col("v"))),
        ).collect()
    }
    assert piv["a"] == (1, 2, None)  # absent slice: sum over no rows is NULL
    assert piv["b"] == (3, None, None)
    cnt = {
        r["d1"]: (r["x"], r["y"], r["z"])
        for r in pivot_report(
            df, "d1", "d2", ["x", "y", "z"],
            lambda c: F.count(F.when(c, F.lit(1))),
        ).collect()
    }
    assert cnt["a"] == (1, 1, 0)  # count form: absent slice is 0, not NULL
    assert cnt["b"] == (1, 0, 0)


def test_contamination_fraction_constructed(spark):
    """3-gram corpus doc 'a b c d' has distinct grams {'a b c','b c d'};
    reference contains 'a b c' only -> 1/2 shared = 5000 bp. A fully
    contained doc scores 10000; a disjoint doc 0; a short (<n words) doc
    shingles to [text] and scores on whole-text membership."""
    from ddsparkle.spark.dataops import contamination_fraction

    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z"), (3, "p q"), (4, "x y z w")],
        "doc_id long, text string",
    )
    reference = spark.createDataFrame(
        [(10, "a b c"), (11, "x y z"), (12, "p q")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in contamination_fraction(
            corpus, reference, shingle_n=3
        ).collect()
    }
    assert out[1] == {"doc_id": 1, "n_grams": 2, "n_shared": 1, "score_bp": 5000}
    assert out[2]["score_bp"] == 10000
    assert out[3] == {"doc_id": 3, "n_grams": 1, "n_shared": 1, "score_bp": 10000}
    assert out[4]["n_grams"] == 2 and out[4]["n_shared"] == 1


def test_key_skew_profile_constructed(spark):
    """Keys ['a','a','a','b',NULL]: 4 non-null, 2 keys, max 3 ->
    skew 750000 ppm, top 'a'. Tie column ['x','x','y','y',NULL]:
    argmax breaks the 2-2 tie to the LARGER key string 'y'."""
    from ddsparkle.spark.dataops import key_skew_profile

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), (None, None)],
        "k1 string, k2 string",
    )
    out = {
        r["column_name"]: r.asDict()
        for r in key_skew_profile(df, ["k1", "k2"]).collect()
    }
    assert out["k1"] == {
        "column_name": "k1", "n_rows": 5, "n_null": 1, "n_keys": 2,
        "max_count": 3, "top_key": "a", "skew_ppm": 750000,
    }
    assert out["k2"]["top_key"] == "y" and out["k2"]["skew_ppm"] == 500000


def test_group_robust_stats_constructed(spark):
    """g1 values [1,2,3,4,100]: lower median 3 (odd n), deviations
    [2,1,0,1,97] -> MAD 1, outliers (|d| > 3) = {100} -> 1. g2 even n
    [10,20,30,40]: LOWER median 20 (position (4+1) div 2 = 2), devs
    [10,0,10,20] sorted [0,10,10,20] -> MAD at pos 2 = 10, outliers
    (>30): none."""
    from ddsparkle.spark.dataops import group_robust_stats

    rows = [("g1", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)]
    rows += [("g2", v) for v in (10.0, 20.0, 30.0, 40.0)]
    rows += [("g1", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r.asDict()
        for r in group_robust_stats(df, "g", "v", k=3.0).collect()
    }
    assert out["g1"] == {
        "g": "g1", "n": 5, "median": 3.0, "mad": 1.0, "n_outliers": 1,
    }
    assert out["g2"] == {
        "g": "g2", "n": 4, "median": 20.0, "mad": 10.0, "n_outliers": 0,
    }


def test_sparse_similarity_topk_constructed(spark):
    """4 docs over unigram 'terms' (ngram=1 keeps the arithmetic
    checkable): docs 1/2 share {b}, docs 1/3 share nothing in-band
    (their only common term 'a' is in all 4 docs -> df=4 > max_df=3,
    banded out — the documented recall bound). Weights tf*bitlen(N//df),
    N=4: term b df=2 -> w=tf*2."""
    from ddsparkle.spark.dataops import sparse_similarity_topk

    df = spark.createDataFrame(
        [
            (1, "a b b"),
            (2, "a b"),
            (3, "a c"),
            (4, "a c"),
        ],
        "doc_id long, text string",
    )
    out = sparse_similarity_topk(
        df, ngram=1, min_df=2, max_df=3, top_k=5
    ).collect()
    pairs = {(r["doc_id"], r["neighbor_id"]): r["dot"] for r in out}
    # b: df=2, idf=bitlen(4//2)=2 -> doc1 w=4 (tf2), doc2 w=2 -> dot 8
    assert pairs[(1, 2)] == 8 and pairs[(2, 1)] == 8
    # c: df=2 -> docs 3,4 each w=2 -> dot 4
    assert pairs[(3, 4)] == 4
    # 'a' is banded out: no (1,3) pair despite sharing it
    assert (1, 3) not in pairs
    assert all(r["rank"] == 1 for r in out)  # each doc has ONE neighbor
