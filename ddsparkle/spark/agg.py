"""Distributed DDSketch aggregation over Spark DataFrames.

The sketch is a distributive aggregate (partial = per-partition build, merge =
store add, final = rank walk — ``DDSketch.java:218-229,268-273,353-388``),
expressed here as a two-stage Arrow-vectorized pipeline:

    stage 1  df.mapInPandas(build)         — no shuffle; one sketch row per
                                             (task, group); pure NumPy inside
    stage 2  groupBy(keys).applyInPandas   — shuffles only sketch rows;
             (merge + finalize)              per-key fold + quantile walk

For global aggregations the group key is a constant; an optional intermediate
tree stage bounds the fan-in of the final merge task. All per-row work
(value derivation, filters) should be done with Catalyst expressions *before*
calling these functions so pushdown/pruning apply to the scan.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import SketchConfig
from ..serde import SKETCH_ROW_FIELDS, merge_rows, row_to_sketch, sketch_to_row, spark_sketch_schema

__all__ = [
    "quantiles",
    "build_partial_sketches",
    "merge_partials_to_sketch_rows",
    "quantile_column_name",
]


def quantile_column_name(q: float) -> str:
    """0.5 -> q50, 0.95 -> q95, 0.999 -> q99_9, 0.0 -> q0, 1.0 -> q100."""
    pct = q * 100.0
    if abs(pct - round(pct)) < 1e-9:
        return f"q{int(round(pct))}"
    return "q" + f"{pct:.6f}".rstrip("0").replace(".", "_")


def _sketch_rows_df(rows: list[dict], key_cols: Sequence[str]) -> pd.DataFrame:
    cols = list(key_cols) + SKETCH_ROW_FIELDS
    if not rows:
        # object dtype so Arrow can map empty columns onto list/str types
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
    return pd.DataFrame(rows, columns=cols)


def _partial_schema(df, key_cols: Sequence[str]):
    from pyspark.sql import types as T

    key_fields = [df.schema[c] for c in key_cols]
    return T.StructType(key_fields + list(spark_sketch_schema().fields))


def build_partial_sketches(
    df,
    value_col: str,
    key_cols: Sequence[str] = (),
    config: Optional[SketchConfig] = None,
    weight_col: Optional[str] = None,
    max_groups_per_task: int = 200_000,
):
    """Stage 1: per-task, per-group sketch build via ``mapInPandas``.

    Consumes only ``key_cols + [value_col, weight_col]`` (column pruning
    reaches the scan). Nulls and NaNs in the value column are skipped, like
    SQL aggregates. Returns a DataFrame of ``key_cols`` + sketch struct
    fields, with at most (#tasks x #groups-per-task) rows and NO shuffle.

    Bounded memory under high-cardinality keys: when a task's in-flight group
    dictionary exceeds ``max_groups_per_task``, it is flushed as sketch rows
    mid-stream (a spill of *mergeable partials*, not raw rows) — stage 2
    merges duplicates, so results are unchanged and task memory stays
    ~max_groups_per_task x sketch-size regardless of key cardinality.
    """
    config = config or SketchConfig()
    key_cols = list(key_cols)
    cols = key_cols + [value_col] + ([weight_col] if weight_col else [])
    projected = df.select(*cols)
    schema = _partial_schema(projected, key_cols)
    cfg = config  # capture a picklable dataclass, not self

    def _rows_frame(sketches: dict) -> pd.DataFrame:
        rows = []
        for key, sk in sketches.items():
            row = dict(zip(key_cols, key))
            row.update(sketch_to_row(sk))
            for f in ("neg_idx", "neg_cnt", "pos_idx", "pos_cnt"):
                row[f] = row[f].tolist()
            rows.append(row)
        return _sketch_rows_df(rows, key_cols)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[tuple, object] = {}
        for pdf in batches:
            if key_cols and len(sketches) > max_groups_per_task:
                yield _rows_frame(sketches)
                sketches = {}
            values = pdf[value_col].to_numpy(np.float64, na_value=np.nan)
            weights = (
                pdf[weight_col].to_numpy(np.float64, na_value=np.nan) if weight_col else None
            )
            valid = ~np.isnan(values)
            if weights is not None:
                valid &= ~np.isnan(weights)
            if key_cols:
                # vectorized per-batch grouping: factorize composite keys
                if len(key_cols) == 1:
                    codes, uniques = pd.factorize(pdf[key_cols[0]], use_na_sentinel=False)
                    key_tuples = [(u,) for u in uniques]
                else:
                    codes, uniques = pd.factorize(
                        pd.MultiIndex.from_frame(pdf[key_cols]), use_na_sentinel=False
                    )
                    key_tuples = list(uniques)
                order = np.argsort(codes, kind="stable")
                sorted_codes = codes[order]
                boundaries = np.nonzero(np.diff(sorted_codes))[0] + 1
                group_slices = np.split(order, boundaries)
                for rows_idx in group_slices:
                    if rows_idx.size == 0:
                        continue
                    key = key_tuples[codes[rows_idx[0]]]
                    mask = valid[rows_idx]
                    rows_idx = rows_idx[mask]
                    if rows_idx.size == 0 and key not in sketches:
                        continue
                    sk = sketches.get(key)
                    if sk is None:
                        sk = sketches[key] = cfg.new_sketch()
                    if rows_idx.size:
                        sk.accept(
                            values[rows_idx],
                            None if weights is None else weights[rows_idx],
                        )
            else:
                v = values[valid]
                if v.size == 0:
                    continue
                sk = sketches.get(())
                if sk is None:
                    sk = sketches[()] = cfg.new_sketch()
                sk.accept(v, None if weights is None else weights[valid])
        yield _rows_frame(sketches)

    return projected.mapInPandas(build, schema=schema)


def merge_partials_to_sketch_rows(partials, key_cols: Sequence[str] = ()):
    """Merge partial sketch rows down to ONE sketch row per key (applyInPandas
    shuffle of sketch rows only). Useful for checkpointing merged state."""
    key_cols = list(key_cols)
    spark_keys = key_cols or ["__g"]
    src = partials if key_cols else partials.withColumn("__g", _lit0())
    schema = _partial_schema(src, spark_keys)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = merge_rows(pdf[SKETCH_ROW_FIELDS].iloc[i] for i in range(len(pdf)))
        row = {c: pdf[c].iloc[0] for c in spark_keys}
        row.update(sketch_to_row(sk))
        for f in ("neg_idx", "neg_cnt", "pos_idx", "pos_cnt"):
            row[f] = row[f].tolist()
        return pd.DataFrame([row])

    out = src.groupBy(*spark_keys).applyInPandas(merge_fn, schema=schema)
    return out.drop("__g") if not key_cols else out


def _lit0():
    from pyspark.sql import functions as F

    return F.lit(0)


def _finalize_schema(src, key_cols: Sequence[str], q_names: Sequence[str]):
    from pyspark.sql import types as T

    key_fields = [src.schema[c] for c in key_cols]
    stat_fields = [
        T.StructField(name, T.DoubleType())
        for name in list(q_names) + ["count", "sum", "min", "max", "avg"]
    ]
    return T.StructType(key_fields + stat_fields)


def quantiles(
    df,
    value_col: str,
    by: Sequence[str] | str | None = None,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    config: Optional[SketchConfig] = None,
    weight_col: Optional[str] = None,
    q_names: Optional[Sequence[str]] = None,
    tree_fanin: int = 4096,
    merge_salt: Optional[int] = None,
    mode: str = "auto",
):
    """Sketch-based quantiles of ``value_col``, optionally grouped by ``by``.

    Returns a DataFrame with columns ``[*by, *q_names, count, sum, min, max,
    avg]``. count/sum/min/max/avg are exact when
    ``config.track_exact_stats`` (the default), in which case quantiles are
    also clamped into [min, max] — matching the reference's
    ``DDSketchWithExactSummaryStatistics``.

    Scale notes: raw rows never shuffle — stage 1 reduces each task to one
    sketch row per group. A global aggregation (by=None) whose stage-1 output
    exceeds ``tree_fanin`` rows gets an intermediate tree-merge stage so the
    final task folds at most ~tree_fanin sketch rows. For grouped
    aggregations on very wide scans (#tasks so large that one group's partial
    rows overwhelm a single merge task), ``merge_salt=S`` inserts a salted
    pre-merge — groupBy(keys, salt) with S deterministic salt buckets — so
    each final task folds at most S rows per group. Merge associativity makes
    any salt assignment produce identical results (tested).

    ``mode``: 'grouped' finalizes with ``applyInPandas`` (one clean pandas
    group per key — right for low-cardinality keys); 'wide' repartitions
    sketch rows by key and folds every group of a partition inside ONE
    ``mapInPandas`` pass — right for high-cardinality keys (millions of
    groups), where per-group grouped-map invocation overhead would dominate.
    'auto' = 'grouped' (callers with 10^6+ groups should pass 'wide').
    """
    config = config or SketchConfig()
    key_cols = [by] if isinstance(by, str) else list(by or [])
    qs = [float(q) for q in qs]
    if q_names is None:
        q_names = [quantile_column_name(q) for q in qs]
    q_names = list(q_names)

    partials = build_partial_sketches(df, value_col, key_cols, config, weight_col)

    if not key_cols:
        n_parts = partials.rdd.getNumPartitions()
        if n_parts > tree_fanin:
            # intermediate tree level: bound final fan-in
            partials = partials.repartition(max(1, math.isqrt(n_parts)))
            partials = merge_partials_within_partitions(partials, [])
        src = partials.withColumn("__g", _lit0())
        group_keys = ["__g"]
    else:
        if merge_salt and merge_salt > 1:
            partials = _salted_pre_merge(partials, key_cols, merge_salt)
        src = partials
        group_keys = key_cols

    schema = _finalize_schema(src, group_keys, q_names)
    qs_arr = list(qs)

    def _finalize_row(sk, key_values: dict) -> dict:
        row = dict(key_values)
        if sk is None or sk.count == 0:
            for name in q_names:
                row[name] = math.nan
            row.update(count=0.0, sum=math.nan, min=math.nan, max=math.nan, avg=math.nan)
        else:
            qvals = sk.values_at_quantiles(qs_arr)
            for name, qv in zip(q_names, qvals):
                row[name] = float(qv)
            row.update(
                count=float(sk.count),
                sum=float(sk.sum),
                min=float(sk.min),
                max=float(sk.max),
                avg=float(sk.avg),
            )
        return row

    if mode == "wide" and key_cols:
        # all partials of a key land in one partition; fold every group of
        # the partition in one python pass (no per-group invocation overhead)
        parted = src.repartition(*[src[c] for c in group_keys])

        def finalize_wide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict[tuple, object] = {}
            for pdf in batches:
                for i in range(len(pdf)):
                    key = tuple(pdf[c].iloc[i] for c in group_keys)
                    sk = row_to_sketch(pdf[SKETCH_ROW_FIELDS].iloc[i])
                    if key in acc:
                        acc[key].merge(sk)
                    else:
                        acc[key] = sk
            rows = [_finalize_row(sk, dict(zip(group_keys, key))) for key, sk in acc.items()]
            cols = group_keys + q_names + ["count", "sum", "min", "max", "avg"]
            if not rows:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
            else:
                yield pd.DataFrame(rows, columns=cols)

        return parted.mapInPandas(finalize_wide, schema=schema)

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = merge_rows(pdf[SKETCH_ROW_FIELDS].iloc[i] for i in range(len(pdf)))
        return pd.DataFrame([_finalize_row(sk, {c: pdf[c].iloc[0] for c in group_keys})])

    out = src.groupBy(*group_keys).applyInPandas(finalize, schema=schema)
    return out.drop("__g") if not key_cols else out


def _salted_pre_merge(partials, key_cols: Sequence[str], n_salt: int):
    """Salted tree level for grouped merges: assign each partial row a
    deterministic salt bucket and merge within (keys, salt) first. The salt
    value assignment is irrelevant to correctness (merge is associative and
    commutative); it only bounds the final per-group fan-in to n_salt."""
    from pyspark.sql import functions as F

    salted = partials.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    merged = merge_partials_to_sketch_rows(salted, [*key_cols, "__salt"])
    return merged.drop("__salt")


def merge_partials_within_partitions(partials, key_cols: Sequence[str]):
    """mapInPandas tree level: fold sketch rows within each partition (no
    shuffle), one output row per (partition, key)."""
    key_cols = list(key_cols)
    schema = partials.schema

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, object] = {}
        for pdf in batches:
            for i in range(len(pdf)):
                key = tuple(pdf[c].iloc[i] for c in key_cols)
                sk = row_to_sketch(pdf[SKETCH_ROW_FIELDS].iloc[i])
                if key in acc:
                    acc[key].merge(sk)
                else:
                    acc[key] = sk
        rows = []
        for key, sk in acc.items():
            row = dict(zip(key_cols, key))
            row.update(sketch_to_row(sk))
            for f in ("neg_idx", "neg_cnt", "pos_idx", "pos_cnt"):
                row[f] = row[f].tolist()
            rows.append(row)
        yield _sketch_rows_df(rows, key_cols)

    return partials.mapInPandas(fold, schema=schema)
