"""Ported sketch accuracy suite: scenario matrix and rank-interval
relative-error oracle from the reference's QuantileSketchTest.java:112-431 and
DDSketchTest.java:41-115,397-419, plus explicit merge
associativity/commutativity/identity property tests.
"""

import math

import numpy as np
import pytest

from ddsparkle import (
    CubicallyInterpolatedMapping,
    DDSketch,
    LogarithmicMapping,
)

EPSILON = 1e-10  # AccuracyTester.FLOATING_POINT_ACCEPTABLE_ERROR


def relative_error(expected_min, expected_max, actual):
    """RelativeAccuracyTester.compute (RelativeAccuracyTester.java:23-42)."""
    if expected_min < 0 or expected_max < 0 or actual < 0:
        raise AssertionError("sign-mismatched quantile")
    if expected_min <= actual <= expected_max:
        return 0.0
    if expected_min == 0 and expected_max == 0:
        return 0.0 if actual == 0 else math.inf
    if actual < expected_min:
        return (expected_min - actual) / expected_min
    return (actual - expected_max) / expected_max


def assert_quantile_accurate(sorted_values, quantile, actual, alpha):
    n = len(sorted_values)
    lo = sorted_values[int(math.floor(quantile * (n - 1)))]
    hi = sorted_values[int(math.ceil(quantile * (n - 1)))]
    # sign-aware relaxation as in QuantileSketchTest.java:112-144
    lo_relaxed = lo * (1 - alpha) if lo > 0 else lo * (1 + alpha)
    hi_relaxed = hi * (1 + alpha) if hi > 0 else hi * (1 - alpha)
    assert lo_relaxed - EPSILON <= actual <= hi_relaxed + EPSILON, (
        f"q={quantile}: {actual} outside [{lo_relaxed}, {hi_relaxed}]"
    )


def assert_sketch_accurate(values, sketch, alpha, merged=False):
    """Port of QuantileSketchTest.assertEncodes(:112-144)."""
    values = np.asarray(values, np.float64)
    assert sketch.count == pytest.approx(len(values), abs=EPSILON * max(1, len(values)))
    if len(values) == 0:
        assert sketch.is_empty()
        with pytest.raises(LookupError):
            sketch.value_at_quantile(0.5)
        return
    assert not sketch.is_empty()
    srt = np.sort(values)
    min_v, max_v = sketch.min, sketch.max
    # min/max alpha-accurate
    assert relative_error(abs(srt[0]), abs(srt[0]), abs(min_v)) <= alpha + EPSILON or (
        srt[0] == 0 and abs(min_v) <= EPSILON
    )
    assert relative_error(abs(srt[-1]), abs(srt[-1]), abs(max_v)) <= alpha + EPSILON or (
        srt[-1] == 0 and abs(max_v) <= EPSILON
    )
    qs = np.arange(0, 101) / 100.0
    actuals = sketch.values_at_quantiles(qs)
    for q, actual in zip(qs, actuals):
        n = len(srt)
        lo = srt[int(math.floor(q * (n - 1)))]
        hi = srt[int(math.ceil(q * (n - 1)))]
        if lo >= 0 and hi >= 0:
            err = relative_error(lo, hi, max(actual, 0.0)) if actual >= 0 else (
                relative_error(0, 0, 0) if lo == 0 else math.inf
            )
            if actual < 0:
                err = (lo - actual) / lo if lo > 0 else abs(actual)
            assert err <= alpha + EPSILON, (q, actual, lo, hi)
        elif lo <= 0 and hi <= 0:
            err = relative_error(-hi, -lo, -actual) if actual <= 0 else math.inf
            if actual > 0:
                err = (actual - hi) / -hi if hi < 0 else abs(actual)
            assert err <= alpha + EPSILON, (q, actual, lo, hi)
        else:
            # interval straddles zero: accept anything alpha-close to either end
            assert lo * (1 + alpha) - EPSILON <= actual <= hi * (1 + alpha) + EPSILON
        # consistency: quantiles within sketch [min, max]
        assert min_v - EPSILON <= actual <= max_v + EPSILON
        assert actual == sketch.value_at_quantile(q)
    # sum/avg alpha-accurate only when single-signed (DDSketchTest.java:81-94)
    if np.all(values >= 0) or np.all(values <= 0):
        exact_sum = float(np.sum(values))
        tol = alpha * float(np.sum(np.abs(values))) + EPSILON
        assert abs(sketch.sum - exact_sum) <= tol
        assert abs(sketch.avg - exact_sum / len(values)) <= tol / len(values) + EPSILON


def new_sketch(alpha, mapping_cls=LogarithmicMapping, policy="unbounded", max_bins=0):
    return DDSketch(
        mapping=mapping_cls.from_relative_accuracy(alpha),
        store_policy=policy,
        max_bins=max_bins,
        track_exact_stats=False,
    )


# scenario generators from QuantileSketchTest.java:146-431 / FIXTURES.md section 2
def scenarios():
    yield "empty", []
    yield "constant_0", [0.0]
    yield "constant_1", [1.0]
    yield "constants_pos", [1.0] * 3
    yield "constants_neg", [-1.0] * 3
    yield "constants_10", [10.0] * 3
    yield "constants_2x10000", [2.0] * 10000
    yield "constants_neg2x10000", [-2.0] * 10000
    yield "alternating", [2.0, -2.0] * 10000
    yield "small_mixed", [10.0, 10.0, 11.0, 11.0, 11.0]
    yield "small_mixed_neg", [-10.0, -10.0, -11.0, -11.0, -11.0]
    yield "zeros", [0.0] * 100
    yield "zeros_then_range", [0.0] * 10 + list(range(100))
    yield "range_then_zeros", list(range(-100, 100)) + [0.0] * 10
    yield "linear_pos", list(range(10000))
    yield "linear_rev", list(reversed(range(10000)))
    yield "linear_neg", [-float(i) for i in range(10000)]
    yield "linear_spanning", list(range(-10000, 10000))
    yield "exp_pos", [math.exp(i) for i in range(100)]
    yield "exp_neg_exponent", [math.exp(-i) for i in range(100)]
    yield "exp_negated", [-math.exp(i) for i in range(100)]
    yield "exp_mixed", [math.exp(i) for i in range(100)] + [-math.exp(-i) for i in range(100)]


SCENARIO_LIST = list(scenarios())


@pytest.mark.parametrize("alpha", [1e-1, 1e-2, 1e-3])
@pytest.mark.parametrize("name,values", SCENARIO_LIST, ids=[n for n, _ in SCENARIO_LIST])
def test_adding(alpha, name, values):
    """Both ingestion paths — accept(v) one batch and grouped accept(v, count)
    — must agree (QuantileSketchTest.testAdding:146-163)."""
    values = np.asarray(values, np.float64)
    sk = new_sketch(alpha)
    if len(values):
        sk.accept(values)
    assert_sketch_accurate(values, sk, alpha)

    sk2 = new_sketch(alpha)
    if len(values):
        uniq, counts = np.unique(values, return_counts=True)
        sk2.accept(uniq, counts.astype(np.float64))
    assert_sketch_accurate(values, sk2, alpha)


MERGE_SCENARIOS = [
    ([], []),
    ([], [0.0]),
    ([0.0], []),
    ([], [2.0]),
    ([1.0, 1.0], [1.0, 1.0, 1.0]),
    ([0.0], [10000.0]),
    ([10000.0], [20000.0]),
    ([], [], [0.0]),
    ([-5.0, -7.0, 2.0], [0.0, 0.0], [3.3]),
    ([float(i) for i in range(1000)], [float(i) for i in range(1000, 2000)]),
]


@pytest.mark.parametrize("alpha", [1e-1, 1e-2, 1e-3])
@pytest.mark.parametrize("parts", MERGE_SCENARIOS, ids=range(len(MERGE_SCENARIOS)))
def test_merging(alpha, parts):
    """Left-fold merge of per-part sketches is accurate on the concatenation
    (QuantileSketchTest.testMerging:164-190)."""
    sk = new_sketch(alpha)
    for part in parts:
        inter = new_sketch(alpha)
        if len(part):
            inter.accept(np.asarray(part, np.float64))
        sk.merge(inter)
    combined = np.asarray([v for part in parts for v in part], np.float64)
    assert_sketch_accurate(combined, sk, alpha, merged=True)


def test_merge_associative_commutative_identity():
    rng = np.random.default_rng(42)
    chunks = [rng.lognormal(5.5, 1.2, 5000) for _ in range(3)]
    qs = [0.0, 0.01, 0.5, 0.95, 0.99, 1.0]

    def build(vals):
        sk = new_sketch(0.01, CubicallyInterpolatedMapping)
        sk.accept(vals)
        return sk

    a, b, c = (build(ch) for ch in chunks)
    # (a+b)+c
    abc1 = build(chunks[0]); abc1.merge(b); abc1.merge(c)
    # a+(b+c)
    bc = build(chunks[1]); bc.merge(c)
    abc2 = build(chunks[0]); abc2.merge(bc)
    # c+(b+a) — commuted
    ba = build(chunks[1]); ba.merge(a)
    abc3 = build(chunks[2]); abc3.merge(ba)
    # identity: merge with empty
    abc4 = build(chunks[0]); abc4.merge(b); abc4.merge(c)
    abc4.merge(new_sketch(0.01, CubicallyInterpolatedMapping))

    ref_q = abc1.values_at_quantiles(qs)
    for other in (abc2, abc3, abc4):
        assert np.allclose(ref_q, other.values_at_quantiles(qs), rtol=1e-12)
        assert other.count == pytest.approx(abc1.count, abs=EPSILON * abc1.count)


def test_merge_requires_equal_mapping():
    a = new_sketch(0.01, LogarithmicMapping)
    b = new_sketch(0.01, CubicallyInterpolatedMapping)
    with pytest.raises(ValueError):
        a.merge(b)
    c = new_sketch(0.02, LogarithmicMapping)
    with pytest.raises(ValueError):
        a.merge(c)


def test_weighted_accept_validation():
    sk = new_sketch(0.01)
    with pytest.raises(ValueError):
        sk.accept([1.0], [-1.0])
    sk.accept([1.0, 2.0], [0.0, 3.0])
    assert sk.count == pytest.approx(3.0)


def test_untrackable_value_rejected():
    sk = new_sketch(0.01)
    with pytest.raises(ValueError):
        sk.accept([math.inf])
    with pytest.raises(ValueError):
        sk.accept([math.nan])


def test_quantile_bounds_validation():
    sk = new_sketch(0.01)
    sk.accept([1.0])
    with pytest.raises(ValueError):
        sk.value_at_quantile(-0.1)
    with pytest.raises(ValueError):
        sk.value_at_quantile(1.1)


def test_clear_behaves_empty():
    sk = new_sketch(0.01)
    sk.accept([0.0, 5.0, -3.0])
    sk.clear()
    assert sk.is_empty()
    with pytest.raises(LookupError):
        sk.value_at_quantile(0.5)


def test_copy_independent():
    sk = new_sketch(0.01)
    sk.accept([1.0, 2.0, 3.0])
    cp = sk.copy()
    cp.accept([1000.0])
    assert sk.count == pytest.approx(3.0)
    assert cp.count == pytest.approx(4.0)


@pytest.mark.parametrize("policy,max_bins", [("collapsing_lowest", 64), ("collapsing_highest", 64), ("sparse", 0)])
def test_store_variants_alpha_contract_on_uncollapsed_range(policy, max_bins):
    """With a range narrower than max_bins, collapsing sketches must obey the
    full accuracy contract; sparse always does."""
    rng = np.random.default_rng(7)
    values = rng.uniform(100.0, 110.0, 20000)  # ~35 buckets at alpha=1e-2
    sk = new_sketch(1e-2, CubicallyInterpolatedMapping, policy, max_bins)
    sk.accept(values)
    assert_sketch_accurate(values, sk, 1e-2)


def test_collapsing_lowest_degrades_only_low_quantiles():
    """Collapse loses accuracy only on the collapsed (low) tail; high
    quantiles stay alpha-accurate (DDSketches.java:56-64 rationale)."""
    values = np.geomspace(1.0, 1e6, 100000)
    sk = new_sketch(1e-2, LogarithmicMapping, "collapsing_lowest", 128)
    sk.accept(values)
    srt = np.sort(values)
    for q in (0.9, 0.95, 0.99, 1.0):
        assert_quantile_accurate(srt, q, sk.value_at_quantile(q), 1e-2)
    assert sk.count == pytest.approx(len(values), rel=1e-12)


def test_exact_summary_statistics():
    """WithExactSummaryStatistics parity (WithExactSummaryStatistics.java:
    62-113,200-206): exact count/sum/min/max, quantiles clamped to [min,max]."""
    rng = np.random.default_rng(11)
    values = rng.normal(1000.0, 10.0, 50000)
    sk = DDSketch(
        mapping=CubicallyInterpolatedMapping.from_relative_accuracy(0.01),
        track_exact_stats=True,
    )
    half = len(values) // 2
    sk.accept(values[:half])
    other = DDSketch(
        mapping=CubicallyInterpolatedMapping.from_relative_accuracy(0.01),
        track_exact_stats=True,
    )
    other.accept(values[half:])
    sk.merge(other)
    assert sk.count == len(values)  # exact
    assert sk.min == values.min()  # exact
    assert sk.max == values.max()  # exact
    assert sk.sum == pytest.approx(math.fsum(values), abs=1e-6)
    qv = sk.values_at_quantiles([0.0, 0.5, 1.0])
    assert qv[0] >= values.min() and qv[-1] <= values.max()
    assert qv[0] == values.min() or qv[0] >= values.min()


def test_avg_empty_is_nan_and_merge_with_empty_keeps_exactness():
    sk = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01))
    assert math.isnan(sk.avg)
    sk.accept([1.0, 2.0, 3.0])
    empty_no_stats = DDSketch(
        mapping=LogarithmicMapping.from_relative_accuracy(0.01), track_exact_stats=False
    )
    sk.merge(empty_no_stats)  # empty stats-less input must not destroy stats
    assert sk.exact_stats is not None and sk.min == 1.0 and sk.max == 3.0
    nonempty = DDSketch(
        mapping=LogarithmicMapping.from_relative_accuracy(0.01), track_exact_stats=False
    )
    nonempty.accept([50.0])
    sk.merge(nonempty)
    assert sk.exact_stats is None and sk.track_exact_stats is False
