"""Driver-harness self-test: run every ``queries()`` entry on Spark at sf0.01
and its ``oracle_sql()`` on DuckDB over the same parquet tables, and require
*exact* equality of the (column-sorted, row-sorted, rounded) results — the
same bar as the driver's CORRECTNESS hash comparison.
"""

import glob
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.spark

# sf0.01 is the driver's comparison point; set SPARK_GRAFT_HARNESS_SF_DIR
# to replay the identical comparison at another scale factor (the repo's
# data-dependent bound gates must hold at sf0.01 AND sf0.1 — see
# BENCH/GATES_sf01_r04.md for the recorded sf0.1 sweep)
SF_DIR = os.environ.get("SPARK_GRAFT_HARNESS_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for path in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.splitext(os.path.basename(path))[0]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = normalize(q(spark, SF_DIR).toPandas())
    want = normalize(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    for col in got.columns:
        a, b = got[col], want[col]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            aa = a.astype(float).to_numpy()
            bb = b.astype(float).to_numpy()
            for x, y in zip(aa, bb):
                ok = (x == y) or (math.isnan(x) and math.isnan(y))
                assert ok, (name, col, x, y)
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), (name, col)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "q50" in df.columns


@pytest.mark.parametrize("alpha", [0.005, 0.02, 0.05])
@pytest.mark.parametrize("collapse", [None, "collapsing_lowest", "collapsing_highest"])
def test_oracle_builder_matches_kernel(duck, alpha, collapse):
    """The SQL oracle generator must track the kernel exactly across alphas
    and collapse policies (not just the harness's fixed configs)."""
    import numpy as np

    from ddsparkle import DDSketch, LogarithmicMapping
    from ddsparkle.oracle import ddsketch_quantile_sql

    vals = duck.sql("SELECT value FROM events").df()["value"].to_numpy("float64")
    policy = collapse or "unbounded"
    max_bins = 48 if collapse else 0
    sk = DDSketch(
        mapping=LogarithmicMapping.from_relative_accuracy(alpha),
        store_policy=policy,
        max_bins=max_bins,
        track_exact_stats=False,
    )
    sk.accept(vals)
    qs = [0.1, 0.5, 0.9, 0.99]
    kernel = [round(float(v), 4) for v in sk.values_at_quantiles(qs)]
    sql = ddsketch_quantile_sql(
        "events", "value", qs, alpha=alpha, collapse_policy=collapse, max_bins=max_bins
    )
    row = duck.sql(sql).fetchone()
    oracle = list(row[: len(qs)])
    assert kernel == oracle, (alpha, collapse, kernel, oracle)
    assert row[len(qs)] == len(vals)  # count


@pytest.mark.parametrize("grouped", [False, True])
def test_oracle_clamp_matches_exact_stats_kernel(duck, grouped):
    """clamp_to_exact=True pairs the oracle with the DEFAULT kernel config
    (track_exact_stats on), including q=0/q=1 where the clamp binds."""
    import numpy as np

    from ddsparkle import DDSketch, LogarithmicMapping
    from ddsparkle.oracle import ddsketch_quantile_sql

    pdf = duck.sql("SELECT event_type, value FROM events").df()
    qs = [0.0, 0.5, 1.0]
    sql = ddsketch_quantile_sql(
        "events", "value", qs,
        group_col="event_type" if grouped else None, clamp_to_exact=True,
    )
    want = duck.sql(sql).df()
    if grouped:
        for _, row in want.iterrows():
            vals = pdf[pdf["event_type"] == row["event_type"]]["value"].to_numpy("float64")
            sk = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01))
            sk.accept(vals)
            got = [round(float(v), 4) for v in sk.values_at_quantiles(qs)]
            assert got == [row["q0"], row["q50"], row["q100"]], row["event_type"]
    else:
        vals = pdf["value"].to_numpy("float64")
        sk = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01))
        sk.accept(vals)
        got = [round(float(v), 4) for v in sk.values_at_quantiles(qs)]
        row = want.iloc[0]
        assert got == [row["q0"], row["q50"], row["q100"]]
        assert row["q0"] == round(vals.min(), 4)  # the clamp binds at q=0
