"""Count-Sketch: exact-integer contract, sign-unbiased point estimates,
merge laws, and the distributed chassis build
(see ddsparkle/sketches/countsketch.py)."""

import hashlib

import numpy as np
import pytest

from ddsparkle.sketches.ams import MERSENNE_P61
from ddsparkle.sketches.countsketch import CountSketch, countsketch_coefficients


def _key(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_coefficients_are_portable_md5_pulls():
    sgn, bkt = countsketch_coefficients(3, 7)
    for j in range(3):
        for i in range(4):
            expect = int(hashlib.md5(f"csk:7:{j}:s{i}".encode()).hexdigest()[:15], 16)
            assert int(sgn[i, j]) == expect
        for i in range(2):
            expect = int(hashlib.md5(f"csk:7:{j}:b{i}".encode()).hexdigest()[:15], 16)
            assert int(bkt[i, j]) == expect


def test_hashes_match_bigint_reference():
    """Bucket AND sign per (row, key) against an independent Python-bigint
    derivation (the AMS _signs permutation lesson: pin shared-with-SQL
    conventions against something that is NOT the implementation)."""
    sk = CountSketch(depth=5, width=64, seed=3)
    keys = np.array([_key(f"k{i}") for i in range(200)], np.int64)
    signs, buckets = sk._hashes(keys)
    sgn, bkt = countsketch_coefficients(5, 3)
    for j in range(5):
        s0, s1, s2, s3 = (int(sgn[i, j]) for i in range(4))
        b0, b1 = int(bkt[0, j]), int(bkt[1, j])
        for t, x in enumerate(keys.tolist()):
            h = s3
            for c in (s2, s1, s0):
                h = (h * x + c) % MERSENNE_P61
            assert signs[j, t] == (1 if h & 1 else -1)
            assert buckets[j, t] == ((b1 * x + b0) % MERSENNE_P61) % 64


def _fixture(n_keys=500, seed=11):
    rng = np.random.default_rng(seed)
    keys = np.array([_key(f"item{i}") for i in range(n_keys)], np.int64)
    freqs = rng.integers(1, 50, n_keys).astype(np.int64)
    freqs[0] = 5000  # one heavy key so the probe spread matters
    return keys, freqs


def test_estimates_within_four_sigma_and_weighted_equals_repeated():
    keys, freqs = _fixture()
    sk = CountSketch(depth=7, width=64, seed=0)
    sk.update(keys, freqs)
    rep = CountSketch(depth=7, width=64, seed=0)
    rep.update(np.repeat(keys, freqs))
    assert (sk.counters == rep.counters).all()
    f2 = int((freqs.astype(object) ** 2).sum())
    est = sk.estimates(keys)
    err = est - freqs
    # 4-sigma Chebyshev + odd-median amplification, integer form:
    # err^2 * width <= 16 * F2 (allow <=1% of probes outside at 4 sigma)
    outside = int((err.astype(object) ** 2 * 64 > 16 * f2).sum())
    assert outside <= max(1, len(keys) // 100)
    # the heavy key must be well-estimated in relative terms
    assert abs(int(est[0]) - 5000) <= int(4 * (f2 / 64) ** 0.5)


def test_merge_laws_and_serde():
    keys, freqs = _fixture()
    a = CountSketch(depth=5, width=32, seed=2)
    b = CountSketch(depth=5, width=32, seed=2)
    a.update(keys[:250], freqs[:250])
    b.update(keys[250:], freqs[250:])
    ab = CountSketch.from_bytes(a.to_bytes())
    ab.merge(b)
    ba = CountSketch.from_bytes(b.to_bytes())
    ba.merge(a)
    whole = CountSketch(depth=5, width=32, seed=2)
    whole.update(keys, freqs)
    assert (ab.counters == ba.counters).all()
    assert (ab.counters == whole.counters).all()
    rt = CountSketch.from_bytes(ab.to_bytes())
    assert (rt.counters == ab.counters).all()
    assert (rt.depth, rt.width, rt.seed) == (5, 32, 2)
    with pytest.raises(ValueError, match="not mergeable"):
        ab.merge(CountSketch(depth=5, width=64, seed=2))


def test_validation():
    with pytest.raises(ValueError, match="ODD"):
        CountSketch(depth=4, width=32)
    with pytest.raises(ValueError, match="width"):
        CountSketch(depth=5, width=1)
    sk = CountSketch(depth=3, width=8)
    with pytest.raises(ValueError, match="2\\^60"):
        sk.update(np.array([1 << 60], np.int64))
    sk.update(np.empty(0, np.int64))  # no-op
    assert (sk.counters == 0).all()
    assert sk.estimates(np.empty(0, np.int64)).size == 0


def test_median_is_int64_order_statistic():
    """Counters beyond 2^53 must survive the median exactly (np.median
    would round-trip through float64)."""
    sk = CountSketch(depth=3, width=2, seed=0)
    big = (1 << 60) + 3
    sk.counters = np.full((3, 2), big, np.int64)
    k = _key("whatever")
    assert sk.estimate(k) in (big, -big)


def test_spark_chassis_build_matches_local(spark):
    from ddsparkle.spark.approx import count_sketch

    keys, freqs = _fixture(n_keys=300, seed=4)
    rows = [(int(k),) for k, f in zip(keys, freqs) for _ in range(int(f) % 7 + 1)]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    got = count_sketch(df, "k", depth=5, width=32, seed=1)
    local = CountSketch(depth=5, width=32, seed=1)
    local.update(np.array([r[0] for r in rows], np.int64))
    assert (got.counters == local.counters).all()
