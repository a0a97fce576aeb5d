"""Ported store tests: scenario vectors from StoreTest.java:217-333 and the
collapse models of CollapsingLowestDenseStoreTest.java:23-37 /
CollapsingHighestDenseStoreTest.java:23-37, checked against a plain-dict
model with the reference's 1e-10 tolerance.
"""

import math

import numpy as np
import pytest

from ddsparkle.store import BucketStore

EPSILON = 1e-10
INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


def dict_model(pairs):
    """Exhaustive oracle: plain index->count aggregation."""
    out = {}
    for i, c in pairs:
        if c != 0:
            out[i] = out.get(i, 0.0) + c
    return {i: c for i, c in out.items() if c != 0}


def collapsed_model(pairs, policy, max_bins):
    """The reference's own test model: clamp indexes against the global
    extreme (CollapsingLowestDenseStoreTest.java:23-37)."""
    pairs = [(i, c) for i, c in pairs if c != 0]
    if not pairs:
        return {}
    if policy == "collapsing_lowest":
        bound = max(INT32_MIN, max(i for i, _ in pairs) - max_bins + 1)
        pairs = [(max(i, bound), c) for i, c in pairs]
    elif policy == "collapsing_highest":
        bound = min(INT32_MAX, min(i for i, _ in pairs) + max_bins - 1)
        pairs = [(min(i, bound), c) for i, c in pairs]
    return dict_model(pairs)


def assert_same_counts(expected, store):
    actual = store.as_dict()
    assert set(expected) == set(actual)
    for k, v in expected.items():
        assert actual[k] == pytest.approx(v, abs=EPSILON)


# scenario vectors (FIXTURES.md section 2 / StoreTest.java:217-333)
SCENARIOS = [
    [],
    [(0, 1.0)] * 10000,
    [(i, 1.0) for i in range(10000)],
    [(-i, 1.0) for i in range(10000)],
    [(2**i, 1.0) for i in range(16)] + [(-(2**i), 1.0) for i in range(16)],
    [(i, 2.0 * i) for i in range(100)],
    [(i, math.log(i + 1)) for i in range(100)],
    [(INT32_MIN, 1.0), (INT32_MAX, 1.0), (0, 1.0)],
    [(0, math.pi), (1, math.e), (-5, 0.5)],
    [(10000, 3.0), (-10000, 2.0)],
]


@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
@pytest.mark.parametrize("policy", ["unbounded", "sparse"])
def test_exhaustive_store_matches_dict_model(scenario, policy):
    pairs = SCENARIOS[scenario]
    store = BucketStore(policy)
    if pairs:
        idx = np.array([i for i, _ in pairs], np.int64)
        cnt = np.array([c for _, c in pairs], np.float64)
        store.add(idx, cnt)
    assert_same_counts(dict_model(pairs), store)
    assert store.total_count == pytest.approx(sum(c for _, c in pairs), rel=1e-12)


@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
@pytest.mark.parametrize("policy", ["collapsing_lowest", "collapsing_highest"])
@pytest.mark.parametrize("max_bins", [1, 20, 1000])
def test_collapsing_store_matches_collapse_model(scenario, policy, max_bins):
    pairs = SCENARIOS[scenario]
    store = BucketStore(policy, max_bins)
    if pairs:
        idx = np.array([i for i, _ in pairs], np.int64)
        cnt = np.array([c for _, c in pairs], np.float64)
        store.add(idx, cnt)
    assert_same_counts(collapsed_model(pairs, policy, max_bins), store)
    # collapse conserves total count
    assert store.total_count == pytest.approx(sum(c for _, c in pairs), rel=1e-12)


@pytest.mark.parametrize("policy", ["collapsing_lowest", "collapsing_highest"])
@pytest.mark.parametrize("max_bins", [1, 20, 1000])
def test_collapsing_incremental_adds_match_batch(policy, max_bins):
    """Order-independence: adding one-by-one (running-extreme clamp, the Java
    path) ends in the same state as one batch add (our vectorized path)."""
    rng = np.random.default_rng(42)
    idx = rng.integers(-500, 1500, 300)
    batch = BucketStore(policy, max_bins)
    batch.add(idx)
    incremental = BucketStore(policy, max_bins)
    for i in idx:
        incremental.add(int(i))
    assert batch.as_dict() == pytest.approx(incremental.as_dict(), abs=EPSILON)


@pytest.mark.parametrize("policy", ["unbounded", "sparse", "collapsing_lowest", "collapsing_highest"])
def test_merge_matrix(policy):
    """Merging matrices incl. far-apart and empties (StoreTest.java:296-333)."""
    max_bins = 20 if policy.startswith("collapsing") else 0
    cases = [
        ([], []),
        ([], [(0, 1.0)]),
        ([(0, 1.0)], []),
        ([(0, 1.0)], [(10000, 1.0)]),
        ([(10000, 1.0)], [(20000, 1.0)]),
        ([(i, 1.0) for i in range(50)], [(i, 2.5) for i in range(25, 75)]),
        ([(0, math.pi)], [(0, math.e), (3, 0.25)]),
    ]
    for a_pairs, b_pairs in cases:
        a = BucketStore(policy, max_bins)
        b = BucketStore(policy, max_bins)
        for store, pairs in ((a, a_pairs), (b, b_pairs)):
            if pairs:
                store.add(
                    np.array([i for i, _ in pairs], np.int64),
                    np.array([c for _, c in pairs], np.float64),
                )
        a.merge(b)
        expected = (
            dict_model(a_pairs + b_pairs)
            if not policy.startswith("collapsing")
            else collapsed_model(a_pairs + b_pairs, policy, max_bins)
        )
        assert_same_counts(expected, a)


def test_merge_commutative_in_effect():
    for policy, max_bins in [("unbounded", 0), ("collapsing_lowest", 10), ("collapsing_highest", 10)]:
        a1 = BucketStore(policy, max_bins); a1.add(np.arange(0, 30))
        b1 = BucketStore(policy, max_bins); b1.add(np.arange(50, 80))
        a2, b2 = a1.copy(), b1.copy()
        a1.merge(b1)
        b2.merge(a2)
        assert a1.as_dict() == pytest.approx(b2.as_dict(), abs=EPSILON)


def test_negative_count_rejected_and_zero_ignored():
    s = BucketStore("unbounded")
    with pytest.raises(ValueError):
        s.add(np.array([1]), np.array([-1.0]))
    s.add(np.array([1, 2]), np.array([0.0, 5.0]))
    assert s.as_dict() == {2: 5.0}


def test_min_max_index_and_empty():
    s = BucketStore("unbounded")
    assert s.is_empty()
    with pytest.raises(KeyError):
        _ = s.min_index
    s.add(np.array([5, -3, 12]))
    assert (s.min_index, s.max_index) == (-3, 12)
    s.clear()
    assert s.is_empty()


def test_dense_roundtrip():
    s = BucketStore("unbounded")
    s.add(np.array([3, 5, 9]), np.array([1.0, 2.0, 3.0]))
    offset, dense = s.to_dense()
    assert offset == 3 and dense.tolist() == [1.0, 0, 2.0, 0, 0, 0, 3.0]
    back = BucketStore.from_dense("unbounded", 0, offset, dense)
    assert back.as_dict() == s.as_dict()


def test_collapsing_merge_respects_combined_extreme():
    """Merging a store whose max exceeds ours re-collapses our low bins
    (CollapsingLowestDenseStore.java:38-87 fold semantics)."""
    a = BucketStore("collapsing_lowest", 10)
    a.add(np.arange(0, 10))  # bins 0..9
    b = BucketStore("collapsing_lowest", 10)
    b.add(np.array([100]))
    a.merge(b)
    # all of a's mass folds into bucket 91 (= 100 - 10 + 1)
    assert a.as_dict() == {91: 10.0, 100: 1.0}


def test_from_dense_respects_collapse_policy():
    s = BucketStore.from_dense("collapsing_lowest", 4, 0, np.ones(100))
    assert s.max_index - s.min_index + 1 <= 4
    assert s.min_index == 96 and s.total_count == pytest.approx(100.0)
