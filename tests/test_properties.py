"""Hypothesis property tests (derandomized for CI determinism): merge
algebra laws, serde round-trips, collapse invariants, mapping consistency —
generalizing the reference's fixed scenario matrices to generated inputs.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ddsparkle import DDSketch, LogarithmicMapping
from ddsparkle.serde import decode_sketch, encode_sketch, row_to_sketch, sketch_to_row
from ddsparkle.store import BucketStore

SETTINGS = dict(max_examples=60, deadline=None, derandomize=True)

finite_values = st.lists(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
    min_size=0,
    max_size=300,
)


def build(values, alpha=0.01, policy="unbounded", max_bins=0):
    sk = DDSketch(
        mapping=LogarithmicMapping.from_relative_accuracy(alpha),
        store_policy=policy,
        max_bins=max_bins,
        track_exact_stats=False,
    )
    if values:
        sk.accept(np.asarray(values))
    return sk


@given(a=finite_values, b=finite_values, c=finite_values)
@settings(**SETTINGS)
def test_merge_associative(a, b, c):
    left = build(a)
    left.merge(build(b))
    left.merge(build(c))
    bc = build(b)
    bc.merge(build(c))
    right = build(a)
    right.merge(bc)
    assert np.array_equal(left.positive_store.indexes, right.positive_store.indexes)
    assert np.allclose(left.positive_store.counts, right.positive_store.counts, rtol=1e-12)
    assert np.array_equal(left.negative_store.indexes, right.negative_store.indexes)
    assert left.zero_count == right.zero_count


@given(a=finite_values, b=finite_values)
@settings(**SETTINGS)
def test_merge_commutative(a, b):
    ab = build(a)
    ab.merge(build(b))
    ba = build(b)
    ba.merge(build(a))
    assert np.array_equal(ab.positive_store.indexes, ba.positive_store.indexes)
    assert np.allclose(ab.positive_store.counts, ba.positive_store.counts, rtol=1e-12)


@given(values=finite_values)
@settings(**SETTINGS)
def test_split_any_way_equals_whole(values):
    """Partition-invariance generalized: any 2-way split merges to the same
    buckets as the whole batch."""
    cut = len(values) // 3
    split = build(values[:cut])
    split.merge(build(values[cut:]))
    whole = build(values)
    assert np.array_equal(split.positive_store.indexes, whole.positive_store.indexes)
    assert np.allclose(split.positive_store.counts, whole.positive_store.counts, rtol=1e-12)
    assert split.zero_count == whole.zero_count


@given(values=finite_values)
@settings(**SETTINGS)
def test_serde_roundtrips(values):
    sk = build(values)
    assert np.array_equal(
        row_to_sketch(sketch_to_row(sk)).positive_store.indexes, sk.positive_store.indexes
    )
    dec = decode_sketch(encode_sketch(sk))
    assert np.array_equal(dec.positive_store.indexes, sk.positive_store.indexes)
    assert np.allclose(dec.positive_store.counts, sk.positive_store.counts, rtol=1e-12)
    assert dec.zero_count == sk.zero_count


@given(
    idx=st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=200),
    max_bins=st.sampled_from([1, 7, 64]),
)
@settings(**SETTINGS)
def test_collapse_invariants(idx, max_bins):
    """Collapsing stores: total count conserved; bin-index span bounded by
    max_bins; max index never clamped (lowest-collapse)."""
    s = BucketStore("collapsing_lowest", max_bins)
    arr = np.asarray(idx, np.int64)
    s.add(arr)
    assert s.total_count == pytest.approx(len(idx), rel=1e-12)
    assert s.max_index == arr.max()
    assert s.max_index - s.min_index + 1 <= max_bins
    h = BucketStore("collapsing_highest", max_bins)
    h.add(arr)
    assert h.min_index == arr.min()
    assert h.max_index - h.min_index + 1 <= max_bins


@given(values=st.lists(st.floats(min_value=1e-6, max_value=1e9, allow_nan=False), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_quantiles_monotone_and_bounded(values):
    sk = build(values)
    qs = np.linspace(0, 1, 21)
    out = sk.values_at_quantiles(qs)
    assert np.all(np.diff(out) >= -1e-12)  # monotone in q
    assert out[0] >= min(values) * (1 - 0.011)
    assert out[-1] <= max(values) * (1 + 0.011)
