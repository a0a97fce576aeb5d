"""Mapping conversion: re-bin a sketch onto a different index mapping.

Re-expresses ``IndexMappingConverter.distributingUniformly``
(``IndexMappingConverter.java:84-143``) as vectorized interval arithmetic:
each input bin ``[L_in, U_in)`` spreads its count over the overlapping output
bins proportionally to covered width. Since log-like mappings guarantee
``upper_bound(i) == lower_bound(i+1)``, the reference's running-``value`` walk
is exactly the clipped-overlap formula

    share(i -> j) = count_i * (min(U_out(j), U_in(i)) - max(L_out(j), L_in(i)))
                    / (U_in(i) - L_in(i))

computed here for all (i, j) overlap pairs at once via repeat/cumsum index
expansion. Conversion degrades the effective relative accuracy to
``(1+a_in)(1+a_out)/(1-a_in) - 1`` (~ ``2*a_in + a_out``), as documented in
the reference.
"""

from __future__ import annotations

import numpy as np

from .mapping import IndexMapping
from .sketch import DDSketch
from .store import BucketStore, _group_sum

__all__ = ["convert_store", "convert_sketch", "converted_relative_accuracy"]


def converted_relative_accuracy(a_in: float, a_out: float) -> float:
    """Effective accuracy bound after distributing-uniformly conversion."""
    return (1.0 + a_in) * (1.0 + a_out) / (1.0 - a_in) - 1.0


def convert_store(
    store: BucketStore,
    in_mapping: IndexMapping,
    out_mapping: IndexMapping,
    policy: str = "unbounded",
    max_bins: int = 0,
) -> BucketStore:
    out = BucketStore(policy, max_bins)
    if store.is_empty():
        return out
    idx = store.indexes
    cnt = store.counts
    lo = np.asarray(in_mapping.lower_bound(idx), np.float64)
    hi = np.asarray(in_mapping.upper_bound(idx), np.float64)
    # output bin range per input bin: from index(L_in) up to the first bin
    # whose upper bound reaches U_in (index of U_in nudged one ulp down)
    j_lo = out_mapping.index(lo)
    j_hi = out_mapping.index(np.nextafter(hi, -np.inf))
    j_hi = np.maximum(j_hi, j_lo)
    k = (j_hi - j_lo + 1).astype(np.int64)
    total = int(k.sum())
    # expanded (input bin i, output bin j) pairs
    rep = np.repeat(np.arange(idx.size), k)
    # out_j = j_lo[i] + position-within-segment
    seg_starts = np.concatenate([[0], np.cumsum(k)[:-1]])
    within = np.arange(total) - np.repeat(seg_starts, k)
    out_j = np.repeat(j_lo, k) + within
    L_out = np.asarray(out_mapping.lower_bound(out_j), np.float64)
    U_out = np.asarray(out_mapping.upper_bound(out_j), np.float64)
    lo_r, hi_r, cnt_r = lo[rep], hi[rep], cnt[rep]
    overlap = np.minimum(U_out, hi_r) - np.maximum(L_out, lo_r)
    overlap = np.clip(overlap, 0.0, None)
    share = cnt_r * overlap / (hi_r - lo_r)
    gi, gc = _group_sum(out_j, share)
    nz = gc != 0
    out.add(gi[nz], gc[nz])
    return out


def convert_sketch(
    sketch: DDSketch,
    new_mapping: IndexMapping,
    store_policy: str = "unbounded",
    max_bins: int = 0,
) -> DDSketch:
    """DDSketch.convert parity (``DDSketch.java:402-416``): re-bin both
    stores onto ``new_mapping``; zero count and exact stats carry over."""
    out = DDSketch(
        mapping=new_mapping,
        store_policy=store_policy,
        max_bins=max_bins,
        min_indexed_value=sketch.min_indexed_value,
        track_exact_stats=False,
    )
    out.negative_store = convert_store(
        sketch.negative_store, sketch.mapping, new_mapping, store_policy, max_bins
    )
    out.positive_store = convert_store(
        sketch.positive_store, sketch.mapping, new_mapping, store_policy, max_bins
    )
    out.zero_count = sketch.zero_count
    if sketch.exact_stats is not None:
        out.exact_stats = sketch.exact_stats.copy()
        out.track_exact_stats = True
    return out


def convert_sketch_rows(sketch_rows_df, new_mapping: IndexMapping, key_cols=()):
    """Spark-level convert: re-bin a DataFrame of sketch rows (e.g. a
    checkpoint table built with one mapping) onto a different mapping —
    an Arrow-batched pass, no raw data rescan. The common migration path
    when an alpha or mapping choice changes after months of checkpoints."""
    import pandas as pd

    from .serde import SKETCH_ROW_FIELDS, row_to_sketch, sketch_to_row

    key_cols = list(key_cols)
    schema = sketch_rows_df.schema

    def conv(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                sk = row_to_sketch(pdf[SKETCH_ROW_FIELDS].iloc[i])
                out = convert_sketch(sk, new_mapping, sk.store_policy, sk.max_bins)
                row = {c: pdf[c].iloc[i] for c in key_cols}
                row.update(sketch_to_row(out))
                for f in ("neg_idx", "neg_cnt", "pos_idx", "pos_cnt"):
                    row[f] = row[f].tolist()
                rows.append(row)
            cols = key_cols + SKETCH_ROW_FIELDS
            if not rows:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
            else:
                yield pd.DataFrame(rows, columns=cols)

    return sketch_rows_df.mapInPandas(conv, schema=schema)
