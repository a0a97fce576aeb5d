"""Serde tests: struct-row and flag/varint binary round-trips, including the
concatenation-decodes-to-merge property (DDSketchTest.java:291-315) and the
var-encoding primitives (VarEncodingHelperTest coverage).
"""

import math

import numpy as np
import pytest

from ddsparkle import (
    CubicallyInterpolatedMapping,
    DDSketch,
    LogarithmicMapping,
    sketch_of,
)
from ddsparkle.serde import (
    _decode_svarint,
    _decode_uvarint,
    _decode_var_double,
    _encode_svarint,
    _encode_uvarint,
    _encode_var_double,
    decode_sketch,
    encode_sketch,
    merge_rows,
    row_to_sketch,
    sketch_to_row,
)

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0]


def distributions():
    rng = np.random.default_rng(42)
    yield "point", np.full(1000, 42.0)
    yield "uniform", rng.uniform(0.0, 100.0, 5000)
    yield "normal", rng.normal(100.0, 10.0, 5000)
    yield "lognormal", rng.lognormal(5.5, 1.2, 5000)
    yield "poisson_like", rng.poisson(0.99, 5000).astype(float)
    yield "trimodal", np.concatenate(
        [rng.normal(100, 10, 2000), rng.normal(1000, 100, 2000), rng.normal(10000, 1000, 2000)]
    )
    yield "mixed_sign", np.concatenate([rng.normal(0, 1, 3000), np.zeros(50)])


DISTS = list(distributions())


@pytest.mark.parametrize("name,values", DISTS, ids=[n for n, _ in DISTS])
@pytest.mark.parametrize("mapping_cls", [LogarithmicMapping, CubicallyInterpolatedMapping])
@pytest.mark.parametrize("policy,max_bins", [("unbounded", 0), ("collapsing_lowest", 512), ("sparse", 0)])
def test_struct_row_roundtrip(name, values, mapping_cls, policy, max_bins):
    sk = DDSketch(
        mapping=mapping_cls.from_relative_accuracy(0.01),
        store_policy=policy,
        max_bins=max_bins,
    )
    sk.accept(values)
    back = row_to_sketch(sketch_to_row(sk))
    assert np.array_equal(sk.values_at_quantiles(QS), back.values_at_quantiles(QS))
    assert back.count == sk.count
    assert back.min == sk.min and back.max == sk.max
    assert back.mapping == sk.mapping


@pytest.mark.parametrize("name,values", DISTS, ids=[n for n, _ in DISTS])
def test_binary_roundtrip(name, values):
    sk = sketch_of(values)
    data = encode_sketch(sk)
    dec = decode_sketch(data, track_exact_stats=True)
    assert np.allclose(sk.values_at_quantiles(QS), dec.values_at_quantiles(QS), rtol=1e-12)
    assert dec.count == sk.count
    assert dec.min == sk.min and dec.max == sk.max
    assert dec.sum == pytest.approx(sk.sum, rel=1e-12)


def test_binary_compactness():
    """Dense-ish sketches should encode ~2 bytes/bin, far below 16 B/bin raw
    (DenseStore picks the cheaper of dense/sparse block encodings)."""
    sk = sketch_of(np.random.default_rng(0).lognormal(5.5, 1.2, 50000), track_exact_stats=False)
    nbins = sk.positive_store.indexes.size
    assert len(encode_sketch(sk)) < 4 * nbins + 64


def test_concatenation_decodes_to_merge():
    rng = np.random.default_rng(7)
    a = sketch_of(rng.lognormal(3, 1, 8000))
    b = sketch_of(rng.lognormal(6, 0.5, 8000))
    merged = a.copy()
    merged.merge(b)
    dec = decode_sketch(encode_sketch(a) + encode_sketch(b), track_exact_stats=True)
    assert np.allclose(merged.values_at_quantiles(QS), dec.values_at_quantiles(QS), rtol=1e-12)
    assert dec.count == merged.count


def test_decode_into_merges():
    rng = np.random.default_rng(8)
    a = sketch_of(rng.uniform(1, 10, 5000))
    b = sketch_of(rng.uniform(5, 50, 5000))
    merged = a.copy()
    merged.merge(b)
    target = a.copy()
    decode_sketch(encode_sketch(b), into=target)
    assert np.allclose(merged.values_at_quantiles(QS), target.values_at_quantiles(QS), rtol=1e-12)


def test_omit_index_mapping_requires_fallback():
    sk = sketch_of(np.arange(1.0, 100.0))
    data = encode_sketch(sk, omit_index_mapping=True)
    with pytest.raises(ValueError):
        decode_sketch(data)
    dec = decode_sketch(data, mapping=sk.mapping, track_exact_stats=True)
    assert np.allclose(sk.values_at_quantiles(QS), dec.values_at_quantiles(QS), rtol=1e-12)


def test_merge_rows_fold():
    rng = np.random.default_rng(9)
    chunks = [rng.lognormal(5, 1, 4000) for _ in range(4)]
    rows = [sketch_to_row(sketch_of(ch)) for ch in chunks]
    folded = merge_rows(rows)
    direct = sketch_of(np.concatenate(chunks))
    assert np.allclose(direct.values_at_quantiles(QS), folded.values_at_quantiles(QS), rtol=1e-12)
    assert folded.count == direct.count
    assert merge_rows([]) is None


def test_var_encoding_primitives_exhaustive():
    """Round-trip uvarint/svarint/varDouble over boundary-heavy vectors
    (VarEncodingHelperTest coverage)."""
    uvals = [0, 1, 127, 128, 2**14 - 1, 2**14, 2**35, 2**63, 2**64 - 1]
    for v in uvals:
        out = bytearray()
        _encode_uvarint(out, v)
        got, pos = _decode_uvarint(memoryview(bytes(out)), 0)
        assert got == v and pos == len(out)
        assert len(out) <= 9
    svals = [0, -1, 1, -64, 63, -(2**31), 2**31 - 1, -(2**63), 2**63 - 1]
    for v in svals:
        out = bytearray()
        _encode_svarint(out, v)
        got, pos = _decode_svarint(memoryview(bytes(out)), 0)
        assert got == v and pos == len(out)
    # NB: values below ~2^-53 are lossy by design in varDouble (the reference
    # transform bits(v+1)-bits(1) collapses them to 0; VarEncodingHelper.java:
    # 218-223) — so no subnormal vectors here.
    dvals = [0.0, 1.0, 2.0, 100.0, 1e6, 0.5, math.pi, 1e300, -1.0, -math.e, 2**53 - 1.0]
    for v in dvals:
        out = bytearray()
        _encode_var_double(out, v)
        got, pos = _decode_var_double(memoryview(bytes(out)), 0)
        assert got == v and pos == len(out)
        assert len(out) <= 9
    # small non-negative integers take 1-2 bytes (the design goal)
    for v in [0.0, 1.0, 2.0, 5.0, 30.0]:
        out = bytearray()
        _encode_var_double(out, v)
        assert len(out) <= 2


def test_decode_drops_stale_exact_stats():
    """Concatenating an exact-stats encoding with a stats-less one must not
    keep the stale stats (they'd clamp quantiles into the wrong [min, max]);
    like DDSketch.merge, exactness is dropped when any segment lacks it."""
    a = sketch_of(np.array([1.0, 2.0, 3.0]))  # exact stats on
    b = sketch_of(np.array([10.0, 20.0]), track_exact_stats=False)
    dec = decode_sketch(encode_sketch(a) + encode_sketch(b), track_exact_stats=True)
    assert dec.exact_stats is None  # exactness correctly lost
    assert dec.count == pytest.approx(5.0)
    assert dec.value_at_quantile(1.0) > 15  # not clamped to stale max=3
    # into= variant: target has stats, stream does not
    tgt = sketch_of(np.array([1.0, 2.0, 3.0]))
    decode_sketch(encode_sketch(b), into=tgt)
    assert tgt.exact_stats is None
    assert tgt.count == pytest.approx(5.0)
    # all-exact concatenation keeps exactness
    c = sketch_of(np.array([10.0, 20.0]))
    dec2 = decode_sketch(encode_sketch(a) + encode_sketch(c), track_exact_stats=True)
    assert dec2.exact_stats is not None
    assert dec2.min == 1.0 and dec2.max == 20.0


def test_decode_stats_audit_is_structural_not_numeric():
    """A stats-less segment whose mass is far below any numeric tolerance of
    the total (100 rows appended to a 10^9-count sketch) must still drop
    exactness — the audit tracks per-segment flag structure, not a
    count-vs-bucket-total tolerance."""
    big = sketch_of(np.array([50.0]))
    big.accept(np.array([50.0]), np.array([1e9]))  # weighted: count 1e9 + 1
    tiny = sketch_of(np.full(100, 1e6), track_exact_stats=False)
    dec = decode_sketch(encode_sketch(big) + encode_sketch(tiny), track_exact_stats=True)
    assert dec.exact_stats is None
    # without the stale clamp [50, 50], the top quantile sees the 1e6 tail
    assert dec.value_at_quantile(1.0) > 1e5
    # order variant: stats-less first, stats segment second
    dec2 = decode_sketch(encode_sketch(tiny) + encode_sketch(big), track_exact_stats=True)
    assert dec2.exact_stats is None
    # three segments: stats + stats-less + stats — still dropped
    c = sketch_of(np.array([7.0, 8.0]))
    dec3 = decode_sketch(
        encode_sketch(big) + encode_sketch(tiny) + encode_sketch(c),
        track_exact_stats=True,
    )
    assert dec3.exact_stats is None


def test_decode_stats_flags_after_stores_keep_exactness():
    """The reference decoder accepts flags in ANY order (DDSketch.java:
    465-496); the exactness audit must not drop stats merely because a
    writer emitted COUNT/MIN/MAX after the store blocks."""
    import struct as _struct

    from ddsparkle.serde import _FLAG_COUNT, _FLAG_MAX, _FLAG_MIN, _encode_var_double

    sk = sketch_of(np.array([1.0, 2.0, 3.0]), track_exact_stats=False)
    base = encode_sketch(sk)  # [mapping][stores] only
    tail = bytearray([_FLAG_COUNT])
    _encode_var_double(tail, 3.0)
    tail.append(_FLAG_MIN)
    tail += _struct.pack("<d", 1.0)
    tail.append(_FLAG_MAX)
    tail += _struct.pack("<d", 3.0)
    dec = decode_sketch(base + bytes(tail), track_exact_stats=True)
    assert dec.exact_stats is not None
    assert dec.min == 1.0 and dec.max == 3.0 and dec.count == 3.0
    # but one trailing stats group cannot cover TWO mass-bearing segments
    other = sketch_of(np.array([10.0]), track_exact_stats=False)
    dec2 = decode_sketch(
        base + encode_sketch(other) + bytes(tail), track_exact_stats=True
    )
    assert dec2.exact_stats is None


def test_decode_omit_mapping_statless_segment_drops_exactness():
    """omit_index_mapping segments add no mapping flag, so the structural
    audit cannot see them — the complementary numeric count-vs-bucket-total
    audit must catch the uncovered mass."""
    a = sketch_of(np.array([1.0, 2.0, 3.0]))  # stats on
    b = sketch_of(np.array([100.0, 200.0]), track_exact_stats=False)
    blob = encode_sketch(a) + encode_sketch(b, omit_index_mapping=True)
    dec = decode_sketch(blob, track_exact_stats=True)
    assert dec.exact_stats is None  # stale [1,3] clamp would hide the 200 tail
    assert dec.count == pytest.approx(5.0)


def test_decode_into_mass_without_stats_drops_exactness():
    """track_exact_stats=True decoding a stats stream into a target that has
    mass but no stats must not produce stats covering only the stream."""
    tgt = sketch_of(np.array([100.0, 200.0]), track_exact_stats=False)
    src = sketch_of(np.array([1.0, 2.0]))
    out = decode_sketch(encode_sketch(src), into=tgt, track_exact_stats=True)
    assert out.exact_stats is None
    assert out.count == pytest.approx(4.0)
    # an EMPTY stats-less target is fine — no mass is uncovered
    empty = sketch_of(np.array([]), track_exact_stats=False)
    out2 = decode_sketch(encode_sketch(src), into=empty, track_exact_stats=True)
    assert out2.exact_stats is not None and out2.min == 1.0 and out2.max == 2.0
