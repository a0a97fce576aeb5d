"""UDDSketch — DDSketch with UNIFORM collapse (Epicoco, Melle, Cafaro,
Pulimeno & Epicoco, "UDDSketch: Accurate Tracking of Quantiles in Data
Streams", IEEE BigData 2020): when the bucket count exceeds the bound,
every ADJACENT PAIR of log-buckets merges (index ``i -> ceil(i / 2)``),
which is exactly replacing gamma with gamma^2 — the relative-accuracy
guarantee degrades gracefully to ``alpha_c = (gamma^(2^c) - 1) /
(gamma^(2^c) + 1)`` after ``c`` collapses instead of silently losing one
TAIL like the reference's collapsing-lowest/highest dense stores
(/root/reference/src/main/java/com/datadoghq/sketch/ddsketch/store/
CollapsingLowestDenseStore.java:15-21 documents that tail clamp; this
module is the published alternative the reference does not ship —
beyond-reference, cited for contrast).

Distributed formulation (deliberately different from the paper's eager
streaming collapse): build the EXACT uncollapsed bucket histogram first —
``groupBy(index).count()`` over indices computed in the scan projection,
order-free integer counts, one narrow shuffle of (int64, count) — then
collapse ONCE at read time to the smallest level whose bucket count fits
``max_bins``. Eager per-partition collapse would make the final level (and
therefore the answers) depend on partitioning; this formulation is
bit-reproducible under any partitioning and any merge order, never has
WORSE accuracy than the paper's eager variant at the same bound, and its
mergeable state is just the bin frame (union two corpora's bins and
re-collapse: associative and commutative by construction).

Cross-engine exactness: the index ``ceil(ln(v) / ln(gamma))`` (bucket i
covers (gamma^(i-1), gamma^i], the paper's convention), the level search
``ceil(i / 2^c)`` on doubles, the rank ``floor(q * (n - 1)) + 1``, and the
paper's harmonic-mean representative ``2 * gamma_c^j / (gamma_c + 1)``
(max relative error exactly alpha_c) are replayed verbatim by
``oracle.udd_quantile_sql``; only EXP reps carry the usual <=1-ulp
cross-engine risk, absorbed by ROUND(4) like every DDSketch walk twin.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

__all__ = ["udd_index_expr", "udd_quantiles", "udd_quantiles_by", "udd_finalize_histogram"]


def q_name(q: float) -> str:
    from ..spark.agg import quantile_column_name

    return quantile_column_name(q)


def udd_index_expr(value_col: str, alpha: float = 0.01) -> str:
    """Catalyst SQL expression for the UDDSketch log-bucket index of a
    POSITIVE value: ``ceil(ln(v) / ln(gamma))`` as BIGINT (bucket i covers
    (gamma^(i-1), gamma^i])."""
    lng = math.log((1.0 + alpha) / (1.0 - alpha))
    return f"CAST(ceil(ln({value_col}) / {lng!r}) AS BIGINT)"


def udd_finalize_histogram(
    spark,
    hist: dict,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    max_bins: int = 64,
    max_level: int = 20,
):
    """Finalize an externally-accumulated exact histogram ``{index: count}``
    (e.g. the streaming leg's integer-additive driver state) through the
    IDENTICAL collapse-level search and walk as ``udd_quantiles`` — the
    histogram is the sketch's mergeable state, so a drained stream
    bit-equals the one-shot batch build."""
    rows = [_Row(i, c) for i, c in hist.items()]
    return _finalize_rows(spark, rows, qs, alpha, max_bins, max_level)


class _Row:
    __slots__ = ("_d",)

    def __init__(self, i, c):
        self._d = {"i": int(i), "c": int(c)}

    def __getitem__(self, k):
        return self._d[k]


def udd_quantiles(
    df,
    value_col: str = "value",
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    max_bins: int = 64,
    max_level: int = 20,
):
    """One-row DataFrame of UDDSketch quantiles of the positive values of
    ``value_col``: [qXX..., count, n_bins_raw, collapse_level, n_bins,
    alpha_final]. ``qXX`` and ``alpha_final`` are unrounded (gates round).

    Scale shape: indices are computed in the scan projection, the exact
    histogram is ONE map-side-combined groupBy of int64 keys (bounded by
    the mapping's bin count — a few thousand for any realistic value range,
    i.e. ~KBs of shuffle regardless of corpus size); the collapse-level
    search and walk run on the collected histogram (post-reduce, bounded —
    the same class as a sketch finalize). ``max_level`` bounds the unrolled
    level search; 2^20 halvings collapse any realistic index range to one
    bucket, so the search always terminates inside it.
    """
    from pyspark.sql import functions as F

    bins = (
        df.filter(F.col(value_col) > 0)
        .select(F.expr(udd_index_expr(value_col, alpha)).alias("i"))
        .groupBy("i")
        .agg(F.count("*").alias("c"))
    )
    return _finalize_rows(
        df.sparkSession, bins.collect(), qs, alpha, max_bins, max_level
    )


def _udd_schema(qs) -> str:
    return ", ".join(
        [f"{q_name(q)} double" for q in qs]
        + [
            "count double",
            "n_bins_raw long",
            "collapse_level int",
            "n_bins long",
            "alpha_final double",
        ]
    )


def _finalize_rows(spark, rows, qs, alpha, max_bins, max_level):
    return spark.createDataFrame(
        [_finalize_core(rows, qs, alpha, max_bins, max_level)], _udd_schema(qs)
    )


def _finalize_core(rows, qs, alpha, max_bins, max_level) -> tuple:
    """The collapse-level search + walk over one group's exact histogram
    rows — shared by the global, grouped, and streaming finalizers so all
    three are bit-identical given equal integer histograms."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lng = math.log(gamma)
    if not rows:
        return tuple([None] * len(qs) + [0.0, 0, 0, 0, alpha])
    idx = np.array([r["i"] for r in rows], np.int64)
    cnt = np.array([r["c"] for r in rows], np.int64)
    n_bins_raw = len(idx)
    level = 0
    for c in range(max_level + 1):
        j = np.ceil(idx / float(2**c))
        if len(np.unique(j)) <= max_bins:
            level = c
            break
    else:
        level = max_level
        j = np.ceil(idx / float(2**max_level))
    j = j.astype(np.int64)
    order = np.argsort(j, kind="stable")
    ju, inv = np.unique(j[order], return_inverse=True)
    cj = np.zeros(len(ju), np.int64)
    np.add.at(cj, inv, cnt[order])
    cum = np.cumsum(cj)
    n = int(cum[-1])
    gc = math.exp(lng * (2**level))
    vals = {}
    for q in qs:
        rank = math.floor(q * (n - 1)) + 1
        pos = int(np.searchsorted(cum, rank))
        jj = int(ju[pos])
        # paper's representative: 2*gamma_c^j / (gamma_c + 1) — max relative
        # error exactly alpha_c = (gamma_c - 1)/(gamma_c + 1)
        vals[q_name(q)] = math.exp(lng * (2**level) * jj) * 2.0 / (gc + 1.0)
    alpha_final = (gc - 1.0) / (gc + 1.0)
    return tuple(
        list(vals.values())
        + [float(n), int(n_bins_raw), int(level), int(len(ju)), alpha_final]
    )


def udd_quantiles_by(
    df,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    max_bins: int = 64,
    max_level: int = 20,
):
    """Grouped UDDSketch quantiles — one row per group value, each with
    its OWN data-driven collapse level (a heavy-tailed group may collapse
    while a narrow one stays at alpha): the exact histogram is one
    map-side-combined ``groupBy(group, index)`` (<= groups x bins rows
    shuffle, corpus-size-independent), then each group's level search +
    walk runs through the SAME ``_finalize_core`` as the global build.
    Returns [group_col, qXX..., count, n_bins_raw, collapse_level, n_bins,
    alpha_final]. NULL group values are excluded (they have no twin-side
    grouping semantics worth pinning)."""
    from pyspark.sql import functions as F

    bins = (
        df.filter(F.col(value_col) > 0)
        .filter(F.col(group_col).isNotNull())
        .select(group_col, F.expr(udd_index_expr(value_col, alpha)).alias("i"))
        .groupBy(group_col, "i")
        .agg(F.count("*").alias("c"))
    )
    by_group: dict = {}
    for r in bins.collect():
        by_group.setdefault(r[group_col], []).append(r)
    rows = [
        (g, *_finalize_core(grp, qs, alpha, max_bins, max_level))
        for g, grp in sorted(by_group.items())
    ]
    return df.sparkSession.createDataFrame(
        rows, f"{group_col} string, " + _udd_schema(qs)
    )
