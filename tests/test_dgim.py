"""DGIM exponential-histogram invariants vs brute force (no Spark)."""

import random

import pytest

from ddsparkle.sketches.dgim import DgimSketch


def test_bound_and_space_brute_force():
    rng = random.Random(7)
    for trial in range(300):
        n = rng.randrange(1, 500)
        r = rng.choice([2, 3, 4, 8])
        ts = sorted(rng.randrange(0, 10_000) for _ in range(n))
        sk = DgimSketch(r=r)
        sk.update_batch(ts)
        assert sk.space_ok(), (trial, sk.sizes)
        assert sk.n_seen == n and sum(sk.sizes) == n
        # sizes non-increasing oldest -> newest, newest is size 1
        assert all(a >= b for a, b in zip(sk.sizes, sk.sizes[1:]))
        assert sk.sizes[-1] == 1
        for _ in range(25):
            cutoff = rng.randrange(-10, 10_010)
            true = sum(1 for t in ts if t > cutoff)
            est2, oldest = sk.estimate2(cutoff)
            if oldest == 0:
                assert true == 0 and est2 == 0
            else:
                d = 2 * true - est2
                assert 2 - oldest <= d <= oldest, (
                    trial, cutoff, true, est2, oldest, sk.sizes,
                )


def test_deterministic_and_exact_small():
    a, b = DgimSketch(r=2), DgimSketch(r=2)
    ts = [1, 1, 2, 5, 5, 5, 9]
    a.update_batch(ts)
    b.update_batch(ts)
    assert a.sizes == b.sizes and a.ts == b.ts
    # window past everything is provably empty and exact
    assert a.estimate2(9) == (0, 0)
    # full-window estimate counts every bucket (half the oldest)
    est2, oldest = a.estimate2(0)
    assert est2 == 2 * len(ts) - oldest


def test_monotone_enforced_and_merge_unsupported():
    sk = DgimSketch(r=2)
    sk.update(5)
    with pytest.raises(ValueError):
        sk.update(4)
    sk.update(5)  # equal is fine
    with pytest.raises(NotImplementedError):
        sk.merge(DgimSketch(r=2))
    with pytest.raises(ValueError):
        DgimSketch(r=1)


def test_expire_preserves_estimates():
    sk = DgimSketch(r=3)
    sk.update_batch(range(200))
    keep = [sk.estimate2(c) for c in (150, 180, 199)]
    sk.expire(150)
    assert [sk.estimate2(c) for c in (150, 180, 199)] == keep
    # expired buckets actually left
    assert all(t > 150 for t in sk.ts)
