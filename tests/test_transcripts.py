"""Transcript fixture + north-star query tests: determinism, the per-turn
invariant (Spark rows == local pandas re-generation under stable turn
ordering), skew-profile correctness, and sketch-vs-exact accuracy of the
three north-star measures.
"""

import math

import numpy as np
import pandas as pd
import pytest

from ddsparkle.spark.queries import (
    text_length_quantiles,
    turn_latency_quantiles,
    turns_per_conversation_quantiles,
)
from ddsparkle.transcripts import (
    _profile_turn_counts,
    generate_conversations_pandas,
    transcripts_df,
)

pytestmark = pytest.mark.spark

ALPHA = 0.01
EPS = 1e-10


def rank_interval_error(sorted_vals, q, actual):
    n = len(sorted_vals)
    lo = sorted_vals[int(math.floor(q * (n - 1)))]
    hi = sorted_vals[int(math.ceil(q * (n - 1)))]
    if lo <= actual <= hi:
        return 0.0
    if actual < lo:
        return (lo - actual) / abs(lo) if lo != 0 else math.inf
    return (actual - hi) / abs(hi) if hi != 0 else math.inf


@pytest.fixture(scope="module")
def tiny_df(spark):
    df = transcripts_df(spark, n_convs=500, profile="tiny", seed=42).cache()
    df.count()
    yield df
    df.unpersist()


def test_schema_and_determinism(spark, tiny_df):
    assert [f.name for f in tiny_df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    again = transcripts_df(spark, n_convs=500, profile="tiny", seed=42, partitions=3)
    a = tiny_df.orderBy("conv_id", "turn_idx").collect()
    b = again.orderBy("conv_id", "turn_idx").collect()
    assert a == b  # partitioning-independent, byte-identical


def test_per_turn_invariant_vs_pandas(spark, tiny_df):
    """Per-turn text equality under stable turn ordering: the distributed
    rows equal a local pandas re-generation (BASELINE.json input_hint)."""
    counts = _profile_turn_counts(42, 500, "tiny", None)
    local = generate_conversations_pandas(42, np.arange(500), counts)
    local = local.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dist = (
        tiny_df.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    assert len(local) == len(dist)
    assert (local["conv_id"].to_numpy() == dist["conv_id"].to_numpy()).all()
    assert (local["text"].to_numpy() == dist["text"].to_numpy()).all()


def test_text_length_quantiles_accuracy(spark, tiny_df):
    res = text_length_quantiles(tiny_df).collect()[0]
    lens = np.sort(
        np.array([len(t) for t in tiny_df.select("text").toPandas()["text"]], np.float64)
    )
    for q, col in [(0.5, "q50"), (0.95, "q95"), (0.99, "q99")]:
        assert rank_interval_error(lens, q, res[col]) <= ALPHA + EPS
    assert res["count"] == len(lens)


def test_text_length_quantiles_per_role(spark, tiny_df):
    rows = text_length_quantiles(tiny_df, by="role").collect()
    roles = {r["role"] for r in rows}
    assert {"user", "assistant"} <= roles
    pdf = tiny_df.select("role", "text").toPandas()
    for r in rows:
        lens = np.sort(pdf[pdf["role"] == r["role"]]["text"].str.len().to_numpy(np.float64))
        assert r["count"] == len(lens)
        assert rank_interval_error(lens, 0.95, r["q95"]) <= ALPHA + EPS


def test_turn_latency_accuracy(spark, tiny_df):
    res = turn_latency_quantiles(tiny_df).collect()[0]
    pdf = tiny_df.select("conv_id", "turn_idx", "ts").toPandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    deltas = pdf.groupby("conv_id")["ts"].diff().dropna().dt.total_seconds()
    lat = np.sort(deltas.to_numpy(np.float64))
    assert res["count"] == len(lat)
    for q, col in [(0.5, "q50"), (0.95, "q95"), (0.99, "q99")]:
        assert rank_interval_error(lat, q, res[col]) <= ALPHA + EPS


def test_turns_per_conversation_accuracy(spark, tiny_df):
    res = turns_per_conversation_quantiles(tiny_df).collect()[0]
    counts = np.sort(
        tiny_df.groupBy("conv_id").count().toPandas()["count"].to_numpy(np.float64)
    )
    assert res["count"] == len(counts)
    for q, col in [(0.5, "q50"), (0.95, "q95"), (0.99, "q99")]:
        assert rank_interval_error(counts, q, res[col]) <= ALPHA + EPS


def test_skewed_profile_correctness(spark):
    """One conversation holding ~20% of all turns must not change results
    (stage 1 is partition-local; the hot key never shuffles raw rows)."""
    df = transcripts_df(spark, n_convs=2000, profile="skewed", seed=42).cache()
    try:
        total = df.count()
        hot = df.groupBy("conv_id").count().orderBy("count", ascending=False).first()
        assert hot["count"] / total > 0.15  # the skew is real
        res = text_length_quantiles(df).collect()[0]
        lens = np.sort(df.selectExpr("length(text) as l").toPandas()["l"].to_numpy(np.float64))
        for q, col in [(0.5, "q50"), (0.99, "q99")]:
            assert rank_interval_error(lens, q, res[col]) <= ALPHA + EPS
        assert res["count"] == total
        # latency path crosses the hot conversation's window partition
        lat_res = turn_latency_quantiles(df).collect()[0]
        assert lat_res["count"] == total - df.select("conv_id").distinct().count()
    finally:
        df.unpersist()


def test_latency_join_method_equals_window(spark, tiny_df):
    """The skew-proof self-join latency formulation must produce identical
    results to the window formulation (dense turn_idx contract)."""
    a = turn_latency_quantiles(tiny_df, method="window").collect()[0]
    b = turn_latency_quantiles(tiny_df, method="join").collect()[0]
    for c in ("q50", "q95", "q99", "count", "min", "max"):
        assert a[c] == pytest.approx(b[c], rel=1e-12), c


def test_latency_join_method_on_skewed(spark):
    """On the hot-conversation profile the join method matches too — and by
    construction no shuffle key repeats, so no task can be skewed."""
    df = transcripts_df(spark, n_convs=1000, profile="skewed", seed=7).cache()
    try:
        a = turn_latency_quantiles(df, method="window").collect()[0]
        b = turn_latency_quantiles(df, method="join").collect()[0]
        assert a["count"] == b["count"]
        for c in ("q50", "q99"):
            assert a[c] == pytest.approx(b[c], rel=1e-12)
    finally:
        df.unpersist()
