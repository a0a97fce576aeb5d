"""AMS tug-of-war F2 sketch: exact-integer contract, merge laws, and the
distributed chassis build (see ddsparkle/sketches/ams.py)."""

import hashlib

import numpy as np
import pytest

from ddsparkle.sketches.ams import (
    AMSSketch,
    MERSENNE_P61,
    _modmul,
    _signs,
    ams_coefficients,
)


def _key(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_modmul_matches_bigint():
    rng = np.random.default_rng(3)
    a = rng.integers(0, MERSENNE_P61, 5000, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE_P61, 5000, dtype=np.int64).astype(np.uint64)
    got = _modmul(a, b)
    assert (got < MERSENNE_P61).all()
    for x, y, g in zip(a[:500].tolist(), b[:500].tolist(), got[:500].tolist()):
        assert g == (x * y) % MERSENNE_P61
    # boundary values: 0, 1, p-1 in both operands
    edge = np.array([0, 1, MERSENNE_P61 - 1], np.uint64)
    for x in edge:
        for y in edge:
            assert _modmul(np.array([x]), np.array([y]))[0] == (int(x) * int(y)) % MERSENNE_P61


def test_signs_match_bigint_horner():
    coeffs = ams_coefficients(16, 0)
    keys = np.array([_key(f"k{i}") for i in range(200)], np.uint64)
    s = _signs(keys, coeffs)
    for j in range(16):
        # row i = degree-i coefficient: Horner walks a3 -> a0
        a0, a1, a2, a3 = (int(coeffs[i, j]) for i in range(4))
        for t, x in enumerate(keys.tolist()):
            h = a3
            for c in (a2, a1, a0):
                h = (h * x + c) % MERSENNE_P61
            assert s[j, t] == (1 if h & 1 else -1)


def test_coefficients_are_portable_md5_pulls():
    coeffs = ams_coefficients(4, 7)
    for j in range(4):
        for i in range(4):
            expect = int(hashlib.md5(f"ams:7:{j}:{i}".encode()).hexdigest()[:15], 16)
            assert int(coeffs[i, j]) == expect


def _fixture_keys(n_rows=4000, n_keys=400):
    keys, freqs = [], {}
    for i in range(n_rows):
        k = _key(f"conv{i % n_keys}")
        keys.append(k)
        freqs[k] = freqs.get(k, 0) + 1
    return np.array(keys, np.int64), sum(v * v for v in freqs.values()), freqs


def test_estimate_within_four_sigma_and_weighted_equals_repeated():
    keys, f2, freqs = _fixture_keys()
    sk = AMSSketch(n_counters=256, seed=0)
    sk.update(keys)
    assert abs(sk.f2_estimate() - f2) <= 4 * sk.relative_standard_error * f2
    sw = AMSSketch(n_counters=256, seed=0)
    sw.update(
        np.array(list(freqs.keys()), np.int64),
        np.array(list(freqs.values()), np.int64),
    )
    assert (sw.counters == sk.counters).all()


def test_merge_laws_and_serde():
    keys, _, _ = _fixture_keys()
    whole = AMSSketch(64, 0)
    whole.update(keys)
    parts = [AMSSketch(64, 0) for _ in range(3)]
    for i, p in enumerate(parts):
        p.update(keys[i::3])
    # associativity: (a+b)+c == a+(b+c); commutativity: order-free
    ab = AMSSketch.from_bytes(parts[0].to_bytes())
    ab.merge(parts[1])
    ab.merge(parts[2])
    cb = AMSSketch.from_bytes(parts[2].to_bytes())
    cb.merge(parts[1])
    cb.merge(parts[0])
    assert (ab.counters == cb.counters).all()
    assert (ab.counters == whole.counters).all()
    rt = AMSSketch.from_bytes(whole.to_bytes())
    assert rt.n_counters == 64 and rt.seed == 0
    assert (rt.counters == whole.counters).all()
    with pytest.raises(ValueError):
        whole.merge(AMSSketch(32, 0))
    with pytest.raises(ValueError):
        whole.merge(AMSSketch(64, 1))


def test_key_domain_enforced():
    sk = AMSSketch(16, 0)
    with pytest.raises(ValueError):
        sk.update(np.array([-1], np.int64))
    with pytest.raises(ValueError):
        sk.update(np.array([1 << 60], np.int64))


def test_spark_chassis_build_matches_local(spark):
    from pyspark.sql import functions as F

    from ddsparkle.spark.approx import ams_f2_sketch

    rows = [(f"conv{i % 50}",) for i in range(1500)]
    df = spark.createDataFrame(rows, "conv_id string").repartition(7)
    keyed = df.select(
        F.conv(F.substring(F.md5("conv_id"), 1, 15), 16, 10).cast("long").alias("k")
    )
    sk = ams_f2_sketch(keyed, "k", n_counters=64, seed=0)
    local = AMSSketch(64, 0)
    local.update(np.array([_key(f"conv{i % 50}") for i in range(1500)], np.int64))
    assert (sk.counters == local.counters).all()
    assert sk.f2_numerator() == local.f2_numerator()
    # empty input -> zero counters
    empty = ams_f2_sketch(keyed.filter(F.lit(False)), "k", n_counters=64)
    assert (empty.counters == 0).all()


def test_inner_product_estimates_join_size():
    """<sketch_a, sketch_b>/c is an unbiased equijoin-size estimate; the
    self case degenerates to F2; mismatched params raise."""
    keys_a, _, _ = _fixture_keys(3000, 300)
    a = AMSSketch(n_counters=256, seed=0)
    a.update(keys_a)
    # b: half-overlapping key set with its own frequencies
    uk = np.unique(np.asarray(keys_a, np.int64))
    half = uk[: len(uk) // 2]
    b = AMSSketch(n_counters=256, seed=0)
    b.update(np.repeat(half, 3))
    ca = {int(k): c for k, c in zip(*np.unique(np.asarray(keys_a, np.int64), return_counts=True))}
    exact = sum(int(ca[int(k)]) * 3 for k in half)
    dot = a.inner_product_numerator(b)
    f2a = a.f2_numerator() / 256
    f2b = b.f2_numerator() / 256
    assert abs(dot / 256 - exact) <= 4 * (2 * f2a * f2b / 256) ** 0.5
    assert a.inner_product_numerator(a) == a.f2_numerator()
    with pytest.raises(ValueError, match="not comparable"):
        a.inner_product_numerator(AMSSketch(n_counters=128, seed=0))
