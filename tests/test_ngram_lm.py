"""Bigram-LM quality scoring: integer-bits contract, top-K determinism, and
Spark-vs-pure-Python replay (see ddsparkle/spark/ngram_lm.py)."""

import hashlib
from collections import Counter

import pytest

from ddsparkle.spark.ngram_lm import NGramLM, lm_quality_score, train_bigram_lm


def _k(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)


def _py_train(texts, top_u, top_b):
    uni, bi = Counter(), Counter()
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        for w in toks:
            uni[_k(w)] += 1
        for i in range(len(toks) - 1):
            bi[_k(toks[i] + " " + toks[i + 1])] += 1
    cap = lambda c, k: dict(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k])
    return NGramLM(cap(uni, top_u), cap(bi, top_b), len(uni))


_DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "zq xv jj qqq zq ppfx"),  # gibberish: rare transitions
    (4, "the the the the"),  # repeated frequent token
    (5, "single"),  # 1 token -> 0 transitions, NULL score
    (6, ""),  # '' -> [''] -> 1 token -> 0 transitions
    (7, None),  # NULL text -> excluded from scoring
    (8, "the cat sat"),
] + [(9 + i, f"common words appear here often number {i % 7}") for i in range(40)]


def test_bits_quantization_matches_addone_log2():
    lm = _py_train([t for _, t in _DOCS], 10**6, 10**6)
    # pen = bitlen(c1+V) - bitlen(c2+1) == floor-log2-quantized surprisal:
    # check a known transition by hand
    c1 = lm.unigrams[_k("the")]
    c2 = lm.bigrams[_k("the cat")]
    pen = lm.transition_bits("the", "cat")
    assert pen == (c1 + lm.vocab_size).bit_length() - (c2 + 1).bit_length()
    # unseen transition: c2=0 -> bitlen(1)=1; unseen word: c1=0
    assert lm.transition_bits("zzznot", "seen") == lm.vocab_size.bit_length() - 1
    # fluent text scores fewer bits/transition than gibberish
    n_f, b_f = lm.doc_bits("the cat sat on the mat")
    n_g, b_g = lm.doc_bits("zq xv jj qqq zq ppfx")
    assert b_f / n_f < b_g / n_g


def test_spark_train_and_score_match_python_replay(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string").repartition(5)
    for top_u, top_b in ((10**6, 10**6), (12, 9)):  # uncapped AND capped
        lm = train_bigram_lm(df, top_unigrams=top_u, top_bigrams=top_b)
        ref = _py_train([t for _, t in _DOCS], top_u, top_b)
        assert lm.vocab_size == ref.vocab_size
        assert lm.unigrams == ref.unigrams, (top_u, top_b)
        assert lm.bigrams == ref.bigrams
        got = {r["doc_id"]: r for r in lm_quality_score(df, lm).collect()}
        # NULL text keeps its row (pass-through contract) with a NULL score
        assert got[7]["n_transitions"] == 0 and got[7]["bits_per_token"] is None
        assert got[7]["text"] is None  # input columns pass through
        for i, t in _DOCS:
            if t is None:
                continue
            n, b = ref.doc_bits(t)
            assert got[i]["n_transitions"] == n
            assert got[i]["bits_total"] == b
            if n == 0:
                assert got[i]["bits_per_token"] is None
            else:
                assert got[i]["bits_per_token"] == pytest.approx(b / n)


def test_topk_tiebreak_is_deterministic(spark):
    # many distinct grams all with count 1: the cap must pick the k smallest
    # KEYS (ORDER BY count DESC, key) — engine-independent
    rows = [(i, f"w{i} x{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(df, top_unigrams=7, top_bigrams=5)
    allk = sorted(_k(f"w{i}") for i in range(50)) + sorted(
        _k(f"x{i}") for i in range(50)
    )
    assert sorted(lm.unigrams) == sorted(sorted(allk)[:7])
    assert lm.vocab_size == 100


def test_validation_errors(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bigram_lm(df, top_unigrams=0)
    with pytest.raises(ValueError):
        lm_quality_score(df, NGramLM({}, {}, 0))
    # empty corpus trains an empty-vocab model
    lm = train_bigram_lm(df.filter("doc_id < 0"))
    assert lm.vocab_size == 0 and lm.unigrams == {} and lm.bigrams == {}


def test_curate_lm_stage_accounting(spark):
    """curate() with the LM gate: stage counts reconcile, survivors all
    score <= threshold, the classifier stage sees only LM survivors, and
    the threshold without a model raises."""
    from ddsparkle.spark.dataprep import curate

    rows = [(i, f"common words appear here often number {i % 5}") for i in range(30)]
    rows += [(100 + i, f"zx{i} qv{i} jj{i} wq{i} pf{i} xx{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # top_bigrams=8 BINDS: the gibberish bigrams (count 1) fall out of the
    # cap, so their transitions score the full unseen penalty
    lm = train_bigram_lm(df, top_unigrams=15, top_bigrams=8)
    curated, stats = curate(
        df, min_tokens=2, max_mean_token_len=30.0, lm_model=lm,
        lm_bits_threshold=4.0, num_perm=16, bands=16,
    )
    assert stats["after_lm_quality"] == curated.count()
    assert (
        stats["dropped_lm_quality"]
        == stats["after_quality_language"] - stats["after_lm_quality"]
    )
    got = {r["doc_id"] for r in curated.select("doc_id").collect()}
    scored = {
        r["doc_id"]: r["bits_per_token"]
        for r in lm_quality_score(df, lm).collect()
    }
    # every survivor scores at or under the bar; the gibberish block is cut
    assert all(scored[i] <= 4.0 for i in got)
    assert not any(i >= 100 for i in got)
    with pytest.raises(ValueError):
        curate(df, lm_bits_threshold=4.0)


def test_train_flush_bound_is_lossless(spark):
    """Partial-dict flushing changes shuffle-row counts, never the model:
    a flush cap smaller than any batch's gram universe must yield the
    identical LM (flush_at is a closure-captured parameter precisely so it
    reaches the workers — a module global would not)."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string").repartition(3)
    base = train_bigram_lm(df, top_unigrams=12, top_bigrams=9)
    flushed = train_bigram_lm(df, top_unigrams=12, top_bigrams=9, flush_at=1)
    assert flushed.vocab_size == base.vocab_size
    assert flushed.unigrams == base.unigrams
    assert flushed.bigrams == base.bigrams
