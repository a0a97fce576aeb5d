"""UDDSketch (uniform-collapse DDSketch) tests: accuracy within the
degraded bound alpha_c, collapse-level selection, partition invariance,
and the empty path. Cross-engine equality is pinned by the
``events_udd_quantiles`` harness gate."""

import math

import numpy as np
import pytest

from ddsparkle.sketches.uddsketch import udd_quantiles

pytestmark = pytest.mark.spark


def _one(df_row):
    return {k: df_row[k] for k in df_row.__fields__}


def test_udd_no_collapse_matches_alpha(spark):
    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(0, 1, 5000))
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    row = udd_quantiles(df, "value", (0.5, 0.95, 0.99), alpha=0.01, max_bins=100000).collect()[0]
    assert row["collapse_level"] == 0
    assert abs(row["alpha_final"] - 0.01) < 1e-12
    exact = np.quantile(vals, [0.5, 0.95, 0.99], method="lower")
    for name, e in zip(("q50", "q95", "q99"), exact):
        assert abs(row[name] - e) / e <= 0.01 + 1e-9, (name, row[name], e)


def test_udd_collapse_degrades_alpha_and_stays_within_bound(spark):
    rng = np.random.default_rng(6)
    vals = np.exp(rng.normal(0, 2, 20000))
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    row = udd_quantiles(df, "value", (0.5, 0.95), alpha=0.01, max_bins=32).collect()[0]
    assert row["collapse_level"] >= 1
    assert row["n_bins"] <= 32
    g = math.exp(math.log(1.01 / 0.99) * 2 ** row["collapse_level"])
    assert abs(row["alpha_final"] - (g - 1) / (g + 1)) < 1e-12
    exact = np.quantile(vals, [0.5, 0.95], method="lower")
    for name, e in zip(("q50", "q95"), exact):
        assert abs(row[name] - e) / e <= row["alpha_final"] + 1e-9


def test_udd_partition_invariant_bit_equal(spark):
    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(0, 1.5, 4000))
    rows = [(float(v),) for v in vals]
    outs = []
    for nparts in (1, 13):
        df = spark.createDataFrame(rows, "value double").repartition(nparts)
        outs.append(udd_quantiles(df, "value", (0.5, 0.99), max_bins=48).collect()[0])
    assert _one(outs[0]) == _one(outs[1])  # bit-equal: order-free histogram


def test_udd_ignores_nonpositive_and_empty(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (None,)], "value double"
    )
    row = udd_quantiles(df, "value", (0.5,)).collect()[0]
    assert row["count"] == 0.0 and row["q50"] is None
    df2 = spark.createDataFrame([(-1.0,), (2.0,), (2.0,)], "value double")
    row2 = udd_quantiles(df2, "value", (0.5,)).collect()[0]
    assert row2["count"] == 2.0
    assert abs(row2["q50"] - 2.0) / 2.0 <= 0.01 + 1e-9


def test_udd_quantiles_by_per_group_levels(spark):
    rng = np.random.default_rng(8)
    rows = [("narrow", float(v)) for v in np.exp(rng.normal(0, 0.05, 3000))]
    rows += [("wide", float(v)) for v in np.exp(rng.normal(0, 3.0, 3000))]
    rows += [("wide", -1.0), (None, 5.0)]  # nonpositive + NULL group dropped
    df = spark.createDataFrame(rows, "g string, value double")
    from ddsparkle.sketches.uddsketch import udd_quantiles_by

    got = {r["g"]: r for r in udd_quantiles_by(df, "value", "g", (0.5,), max_bins=32).collect()}
    assert set(got) == {"narrow", "wide"}
    # the tight group fits without collapsing; the heavy-tailed one must
    # collapse — per-group data-driven levels are the operator's point
    assert got["narrow"]["collapse_level"] == 0
    assert got["wide"]["collapse_level"] >= 1
    assert got["wide"]["count"] == 3000.0  # the -1.0 was dropped
    for g in ("narrow", "wide"):
        assert got[g]["n_bins"] <= 32
