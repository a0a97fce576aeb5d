"""Ported mapping tests: sweeps and boundary probes from the reference's
IndexMappingTest.java:28-108 and LogLikeIndexMappingTest.java:25-118,
vectorized over whole sweeps at once.
"""

import math

import numpy as np
import pytest

from ddsparkle.mapping import (
    MAPPING_KINDS,
    CubicallyInterpolatedMapping,
    LinearlyInterpolatedMapping,
    LogarithmicMapping,
    QuadraticallyInterpolatedMapping,
    QuarticallyInterpolatedMapping,
    mapping_from_kind,
)

ALL_MAPPINGS = [
    LogarithmicMapping,
    LinearlyInterpolatedMapping,
    QuadraticallyInterpolatedMapping,
    CubicallyInterpolatedMapping,
    QuarticallyInterpolatedMapping,
]

# alpha sweep mirroring IndexMappingTest's geometric range (1e-8 excluded for
# the interpolated mappings where float cancellation dominates below ~1e-7;
# reference tests use the same mapping-specific floors via its test matrix)
ALPHAS = [1e-6, 1e-4, 1e-3, 1e-2, 1e-1, 0.5, 0.9]
EPSILON = 1e-10  # AccuracyTester.FLOATING_POINT_ACCEPTABLE_ERROR


@pytest.mark.parametrize("cls", ALL_MAPPINGS)
@pytest.mark.parametrize("alpha", ALPHAS)
def test_value_within_relative_accuracy(cls, alpha):
    m = cls.from_relative_accuracy(alpha)
    assert m.relative_accuracy <= alpha * (1 + 1e-9)
    # sweep the indexable range geometrically (multiplier 1 + sqrt(2)*alpha to
    # hit many distinct buckets, as IndexMappingTest.java:40-48 does)
    lo = max(m.min_indexable_value, 1e-280)
    hi = min(m.max_indexable_value, 1e280)
    n = min(
        int((math.log(hi) - math.log(lo)) / math.log1p(math.sqrt(2) * m.relative_accuracy)),
        200_000,
    )
    v = np.geomspace(lo, hi, max(n, 1000))
    rel = np.abs(m.value(m.index(v)) - v) / v
    assert rel.max() <= m.relative_accuracy + EPSILON


@pytest.mark.parametrize("cls", ALL_MAPPINGS)
@pytest.mark.parametrize("alpha", [1e-3, 1e-2, 1e-1])
def test_bucket_boundaries_consistent(cls, alpha):
    """lower/upper bound, value and index must be mutually consistent
    (IndexMappingTest.java:51-105): value(i) in [lower(i), upper(i)];
    index(lower(i)*(1+eps)) == i; index(upper(i)*(1-eps)) == i;
    upper(i) == lower(i+1).
    """
    m = cls.from_relative_accuracy(alpha)
    idx = np.arange(-50, 51)
    lb, ub, val = m.lower_bound(idx), m.upper_bound(idx), m.value(idx)
    assert np.all(lb * (1 - 1e-12) <= val)
    assert np.all(val <= ub * (1 + 1e-12))
    assert np.array_equal(m.index(lb * (1 + 1e-10)), idx)
    assert np.array_equal(m.index(ub * (1 - 1e-10)), idx)
    assert np.array_equal(ub, m.lower_bound(idx + 1))


@pytest.mark.parametrize("cls", ALL_MAPPINGS)
@pytest.mark.parametrize("gamma", [1 + 1e-6, 1.02, 1.5])
@pytest.mark.parametrize("index_offset", [0.0, 1.0, -12.23, 7768.3])
def test_gamma_index_offset_grid(cls, gamma, index_offset):
    """(gamma, indexOffset) grid from LogLikeIndexMappingTest.java:25-43."""
    m = cls(gamma, index_offset)
    v = np.geomspace(1e-10, 1e10, 5000)
    rel = np.abs(m.value(m.index(v)) - v) / v
    assert rel.max() <= m.relative_accuracy + EPSILON
    # index offset semantics: index(1) == floor(index_offset) when the log
    # term vanishes at v=1 (exact for all mappings: log(1) == 0)
    assert m.index(np.array([1.0]))[0] == math.floor(index_offset) or gamma < 1.001


def test_index_offset_at_one():
    """A mapping with index_offset shifts bucket 0's lower bound; at offset 0,
    v=1 lands in bucket 0 for every mapping kind."""
    for cls in ALL_MAPPINGS:
        if cls is LinearlyInterpolatedMapping:
            continue  # its alpha-constructor uses a historical nonzero offset
        m = cls.from_relative_accuracy(0.01)
        assert m.index(np.array([1.0]))[0] == 0


def test_mapping_equality_and_kind_roundtrip():
    a = LogarithmicMapping.from_relative_accuracy(0.01)
    b = LogarithmicMapping(a.gamma, a.index_offset)
    c = CubicallyInterpolatedMapping(a.gamma, a.index_offset)
    assert a == b
    assert a != c  # same params, different kind -> not mergeable
    for kind in MAPPING_KINDS:
        if kind == "bitwise":
            continue  # constrained gamma; covered by TestBitwiseMapping
        m = mapping_from_kind(kind, 1.05, 3.5)
        assert m.kind == kind
        assert m.gamma == 1.05 and m.index_offset == 3.5


def test_invalid_parameters():
    with pytest.raises(ValueError):
        LogarithmicMapping.from_relative_accuracy(0.0)
    with pytest.raises(ValueError):
        LogarithmicMapping.from_relative_accuracy(1.0)
    with pytest.raises(ValueError):
        LogarithmicMapping(1.0)  # gamma must be > 1
    with pytest.raises(ValueError):
        mapping_from_kind("nope", 1.5)


def test_min_max_indexable():
    for cls in ALL_MAPPINGS:
        m = cls.from_relative_accuracy(0.01)
        lo, hi = m.min_indexable_value, m.max_indexable_value
        assert 0 < lo < 1 < hi
        ilo = m.index(np.array([lo]))[0]
        ihi = m.index(np.array([hi]))[0]
        assert -(2**31) <= ilo <= ihi <= 2**31 - 1


def test_java_floor_negative_integer_quirk():
    """The reference floor trick returns floor(x)-1 at exact negative integers
    (LogLikeIndexMapping.java:113-116); we replicate it for parity."""
    from ddsparkle.mapping import _java_floor

    x = np.array([-3.0, -2.5, -0.0, 0.0, 2.5, 3.0])
    assert _java_floor(x).tolist() == [-4, -3, 0, 0, 2, 3]


class TestBitwiseMapping:
    def test_accuracy_and_roundtrip(self):
        from ddsparkle.mapping import BitwiseLinearlyInterpolatedMapping

        for alpha in (1e-1, 1e-2, 1e-3):
            m = BitwiseLinearlyInterpolatedMapping.from_relative_accuracy(alpha)
            assert m.relative_accuracy <= alpha
            v = np.geomspace(1e-9, 1e9, 20000)
            rel = np.abs(m.value(m.index(v)) - v) / v
            assert rel.max() <= m.relative_accuracy + 1e-10

    def test_bucket_boundaries(self):
        from ddsparkle.mapping import BitwiseLinearlyInterpolatedMapping

        m = BitwiseLinearlyInterpolatedMapping.from_significant_bits(4)
        idx = np.arange(-100, 101)
        lb, ub = m.lower_bound(idx), m.upper_bound(idx)
        assert np.array_equal(m.index(lb * (1 + 1e-12)), idx)
        assert np.array_equal(ub, m.lower_bound(idx + 1))
        # power-of-2 gamma identity
        assert m.gamma == 2 ** (1 / m.multiplier)

    def test_kind_constructor_gamma(self):
        from ddsparkle.mapping import mapping_from_kind

        m = mapping_from_kind("bitwise", 2 ** (1 / 16))
        assert m.num_significant_binary_digits == 4
        with pytest.raises(ValueError):
            mapping_from_kind("bitwise", 1.5)

    def test_wire_degrades_to_linear(self):
        """Reference parity: bitwise serializes as LOG_LINEAR and decodes to
        a LinearlyInterpolatedMapping with the same gamma
        (BitwiseLinearlyInterpolatedMapping.java:110-115)."""
        from ddsparkle import DDSketch
        from ddsparkle.mapping import BitwiseLinearlyInterpolatedMapping
        from ddsparkle.serde import decode_sketch, encode_sketch

        m = BitwiseLinearlyInterpolatedMapping.from_relative_accuracy(0.02)
        sk = DDSketch(mapping=m, track_exact_stats=False)
        sk.accept(np.geomspace(1.0, 1000.0, 5000))
        dec = decode_sketch(encode_sketch(sk))
        assert dec.mapping.kind == "lin"
        assert dec.mapping.gamma == m.gamma
        assert np.array_equal(dec.positive_store.indexes, sk.positive_store.indexes)
