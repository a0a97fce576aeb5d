"""Model-based quality scoring (quality_model.py): the hashed-n-gram linear
scorer must match a from-scratch pure-Python model exactly (integer dot, one
division), honor the NULL/empty-text contracts, pass all input columns
through, and slot into dataprep.curate as the classifier-last stage."""

import hashlib

import numpy as np
import pytest

from ddsparkle.spark.quality_model import (
    MODEL_QUALITY_DIM,
    model_quality_score,
    weight_table,
)

pytestmark = pytest.mark.spark


def _ref_score(text, dim=MODEL_QUALITY_DIM, w=None):
    """Independent reimplementation: tokenize on single space, unigrams +
    bigrams with multiplicity, 60-bit md5 bucket, integer dot."""
    if text is None:
        return 0.0, None
    if w is None:
        w = weight_table(dim)
    toks = text.split(" ")
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    idx = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim for g in grams]
    s = int(sum(int(w[i]) for i in idx))
    return float(len(grams)), s / (len(grams) * 1e6)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the the",            # heavy gram multiplicity
    "one",                        # single token: 1 unigram, 0 bigrams
    "",                           # empty: [''] -> 1 unigram
    "double  space",              # empty middle field survives
    None,                         # NULL text -> NULL score, 0 grams
    "ünïcode tøkens everywhere",  # non-ASCII utf-8 hashing
]


def test_scores_match_pure_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["model_score"])
        for r in model_quality_score(df).collect()
    }
    assert set(got) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        n, s = _ref_score(t)
        assert got[i][0] == n
        if t is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == s  # exact: integer dot + one division


def test_columns_pass_through_row_locally(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "extra", 7.5)], "doc_id long, text string, k string, v double"
    )
    out = model_quality_score(df)
    assert out.columns == ["doc_id", "text", "k", "v", "n_grams", "model_score"]
    row = out.collect()[0]
    assert (row["k"], row["v"]) == ("extra", 7.5)


def test_fast_hasher_same_contract_different_buckets(spark):
    """hasher='fast' (murmur) keeps the featurizer and weight table — same
    gram counts, same score range — but assigns different buckets, so
    scores may differ from the md5 path. (Measured 0.94x vs md5+memo — kept
    as the non-portable alternative, not a throughput path; see
    BENCH/ab_r05_scorer.json.)"""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    md5 = {r["doc_id"]: r for r in model_quality_score(df, hasher="md5").collect()}
    fast = {r["doc_id"]: r for r in model_quality_score(df, hasher="fast").collect()}
    for i, t in enumerate(TEXTS):
        assert fast[i]["n_grams"] == md5[i]["n_grams"]
        if t is None:
            assert fast[i]["model_score"] is None
        else:
            assert -1.0 <= fast[i]["model_score"] <= 1.0


def test_custom_weights_and_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # all-ones weights: score = n_grams / (n_grams * 1e6) = 1e-6 exactly
    ones = np.ones(MODEL_QUALITY_DIM, np.int64)
    row = model_quality_score(df, weights=ones).collect()[0]
    assert row["model_score"] == 1e-6
    with pytest.raises(ValueError):
        model_quality_score(df, weights=np.ones(3, np.int64)).collect()
    with pytest.raises(ValueError):
        model_quality_score(df, hasher="sha1")


def test_curate_model_stage_accounting(spark, sf_dir):
    """model_score_threshold adds the classifier-last stage: the model pass
    sees only heuristic survivors, counts reconcile, and the curated frame
    keeps the input schema with exactly the passing docs."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataprep import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    curated, stats = curate(docs, min_tokens=5, model_score_threshold=-0.05)
    assert curated.columns == docs.columns
    assert stats["after_model_quality"] <= stats["after_quality_language"]
    assert (
        stats["dropped_model_quality"]
        == stats["after_quality_language"] - stats["after_model_quality"]
    )
    assert curated.count() == stats["after_model_quality"]
    # the survivors are exactly the heuristic survivors scoring >= threshold
    rescored = model_quality_score(curated).filter(
        F.col("model_score") < -0.05
    )
    assert rescored.count() == 0
    # without the flag the stage (and its keys) are absent
    _, base_stats = curate(docs, min_tokens=5)
    assert "after_model_quality" not in base_stats


def test_bucket_cache_is_speed_only(spark):
    """cache_buckets memoizes gram->bucket across batches — scores must be
    IDENTICAL with it on or off (and across repeated scoring of overlapping
    gram sets, exercising cache hits)."""
    rows = [(i, t) for i, t in enumerate(TEXTS * 3)]  # repeats -> cache hits
    df = spark.createDataFrame(rows, "doc_id long, text string")
    on = {r["doc_id"]: r["model_score"] for r in model_quality_score(df).collect()}
    off = {
        r["doc_id"]: r["model_score"]
        for r in model_quality_score(df, cache_buckets=False).collect()
    }
    assert on == off
