"""DDSketch.trimmed_means kernel contract: accuracy vs exact order
statistics, merge/partition invariance, degenerate trims, and error modes.
The Spark pipeline (agg.trimmed_means) + DuckDB twin are covered by the
events_trimmed_mean harness pair (tests/test_entry_harness.py)."""

import numpy as np
import pytest

from ddsparkle.mapping import LogarithmicMapping
from ddsparkle.sketch import DDSketch, sketch_of

ALPHA = 0.01


def _M():
    return LogarithmicMapping.from_relative_accuracy(ALPHA)


def _exact_trimmed(vals: np.ndarray, lo: float, hi: float) -> tuple[float, float]:
    s = np.sort(vals)
    n = len(s)
    klo = int(np.floor(lo * n))
    khi = int(np.floor(hi * n))
    trimmed = float(s[klo : n - khi].mean())
    w = s.copy()
    w[:klo] = s[klo]
    if khi:
        w[n - khi :] = s[n - khi - 1]
    return trimmed, float(w.mean())


@pytest.mark.parametrize("lo,hi", [(0.1, 0.1), (0.0, 0.25), (0.05, 0.15)])
def test_accuracy_within_alpha(lo, hi):
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.2, 50_000)
    sk = sketch_of(vals, mapping=_M(), track_exact_stats=False)
    tm, wm = sk.trimmed_means(lo, hi)
    ex_tm, ex_wm = _exact_trimmed(vals, lo, hi)
    # every representative is within alpha of its values; the means are
    # convex combinations, so the same relative bound holds (plus the
    # trim-boundary bucket granularity, absorbed well inside 2*alpha here)
    assert abs(tm - ex_tm) / ex_tm <= 2 * ALPHA
    assert abs(wm - ex_wm) / ex_wm <= 2 * ALPHA


def test_mixed_sign_and_zeros():
    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [-(rng.lognormal(2, 1, 10_000)), np.zeros(500), rng.lognormal(2, 1, 10_000)]
    )
    sk = sketch_of(vals, mapping=_M(), track_exact_stats=False)
    tm, _ = sk.trimmed_means(0.05, 0.15)
    ex_tm, _ = _exact_trimmed(vals, 0.05, 0.15)
    # near-zero mean: relative bounds degenerate, pin absolute closeness
    # against the spread instead
    assert abs(tm - ex_tm) <= 2 * ALPHA * np.abs(vals).mean()


def test_merge_and_partition_invariance():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(1.0, 2.0, 30_000)
    whole = sketch_of(vals, mapping=_M(), track_exact_stats=False)
    want = whole.trimmed_means(0.1, 0.1)
    for parts in (2, 7):
        chunks = np.array_split(vals, parts)
        sk = sketch_of(chunks[0], mapping=_M(), track_exact_stats=False)
        for ch in chunks[1:]:
            sk.merge(sketch_of(ch, mapping=_M(), track_exact_stats=False))
        assert sk.trimmed_means(0.1, 0.1) == want  # bit-equal, not approx


def test_zero_trim_equals_bucket_mean():
    vals = np.array([1.0, 2.0, 4.0, 8.0, 100.0])
    sk = sketch_of(vals, mapping=_M(), track_exact_stats=False)
    tm, wm = sk.trimmed_means(0.0, 0.0)
    assert tm == wm  # nothing trimmed, nothing winsorized
    assert abs(tm - vals.mean()) / vals.mean() <= ALPHA


def test_exact_stats_clamp():
    vals = np.array([5.0, 5.0, 5.0])
    sk = sketch_of(vals, mapping=_M(), track_exact_stats=True)
    tm, wm = sk.trimmed_means(0.0, 0.0)
    # representatives overshoot by up to alpha; the clamp pins to exact max
    assert tm == 5.0 and wm == 5.0


def test_error_modes():
    sk = DDSketch()
    with pytest.raises(LookupError):
        sk.trimmed_means(0.1, 0.1)
    sk.accept(np.array([1.0]))
    for lo, hi in [(0.5, 0.5), (-0.1, 0.0), (0.0, 1.0), (1.2, 0.0)]:
        with pytest.raises(ValueError):
            sk.trimmed_means(lo, hi)


def test_weighted_counts():
    # float (weighted) masses flow through the same cuts
    sk = DDSketch()
    sk.accept(np.array([1.0, 10.0, 100.0]), weights=np.array([2.5, 5.0, 2.5]))
    tm, wm = sk.trimmed_means(0.25, 0.25)
    # n=10.0, k_lo=k_hi=2: kept mass 0.5@1, 5@10, 0.5@100 -> ~ (0.5+50+50)/6
    assert abs(tm - (0.5 * 1 + 5 * 10 + 0.5 * 100) / 6.0) / tm <= 2 * ALPHA
    assert wm >= tm * 0.5  # winsorized stays in the data range


class TestSqlMode:
    """mode='sql' (pure Catalyst) vs mode='kernel' parity + routing."""

    def test_modes_agree_round4(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        from ddsparkle.config import SketchConfig
        from ddsparkle.spark.agg import trimmed_means

        cfg = SketchConfig(
            mapping_kind="log", relative_accuracy=0.01,
            store_policy="unbounded", max_bins=0, track_exact_stats=False,
        )
        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "g": ["a", "b", "c", None] * 2500,
                "v": np.concatenate(
                    [rng.lognormal(2, 1, 5000), -(rng.lognormal(1, 1, 2500)),
                     np.zeros(1500), [np.nan] * 1000]
                ),
            }
        )
        pdf.loc[pdf["v"].isna(), "v"] = None
        df = spark.createDataFrame(pdf)
        args = dict(by="g", config=cfg)
        srt = lambda d: d.sort_values("g", na_position="last").reset_index(drop=True)
        k = srt(trimmed_means(df, "v", 0.05, 0.15, mode="kernel", **args).toPandas())
        s = srt(trimmed_means(df, "v", 0.05, 0.15, mode="sql", **args).toPandas())
        assert k["count"].tolist() == s["count"].tolist()
        for col in ("trimmed_mean", "winsorized_mean"):
            assert np.allclose(k[col].astype(float), s[col].astype(float),
                               rtol=0, atol=5e-5, equal_nan=True)

    def test_sql_plan_is_pure_catalyst_and_auto_routes(self, spark):
        import re

        from ddsparkle.config import SketchConfig
        from ddsparkle.spark.agg import trimmed_means

        cfg = SketchConfig(mapping_kind="log", track_exact_stats=False,
                           store_policy="unbounded", max_bins=0)
        df = spark.range(1000).selectExpr("CAST(id % 7 AS STRING) AS g",
                                          "CAST(id % 100 + 1 AS DOUBLE) AS v")
        q = trimmed_means(df, "v", 0.1, 0.1, by="g", config=cfg)  # auto -> sql
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert not re.findall(
            r"\(\d+\) (ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan
        )

    def test_sql_mode_rejects_stats_config(self, spark):
        from ddsparkle.config import SketchConfig
        from ddsparkle.spark.agg import ddsketch_trimmed_spark_sql

        with pytest.raises(ValueError):
            ddsketch_trimmed_spark_sql(
                "t", "v", 0.1, 0.1,
                config=SketchConfig(mapping_kind="log", track_exact_stats=True),
            )

    def test_sql_global_empty_and_zero_trim(self, spark):
        from ddsparkle.config import SketchConfig
        from ddsparkle.spark.agg import trimmed_means

        cfg = SketchConfig(mapping_kind="log", track_exact_stats=False,
                           store_policy="unbounded", max_bins=0)
        empty = spark.range(0).selectExpr("CAST(id AS DOUBLE) AS v")
        assert trimmed_means(empty, "v", 0.1, 0.1, config=cfg).count() == 0
        one = spark.range(1, 4).selectExpr("CAST(id AS DOUBLE) AS v")
        row = trimmed_means(one, "v", 0.0, 0.0, config=cfg).collect()[0]
        assert row["trimmed_mean"] == row["winsorized_mean"]
        assert abs(row["trimmed_mean"] - 2.0) < 2.0 * 0.01 * 2
