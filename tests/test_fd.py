"""Frequent Directions matrix sketch: bound, PSD, mergeability, and the
distributed operator's exact parts."""

import numpy as np
import pytest

from ddsparkle.sketches.frequent_directions import FrequentDirections


def _err(a, b):
    d = a.T @ a - b.T @ b
    return float(np.max(np.abs(np.linalg.eigvalsh(d))))


def _check(a, fd):
    b = fd.compact()
    fro = float((a * a).sum())
    bound = 2.0 * fro / fd.l
    diff = a.T @ a - b.T @ b
    eig = np.linalg.eigvalsh(diff)
    assert eig.min() >= -1e-6 * max(fro, 1.0), "A'A - B'B must be PSD"
    assert _err(a, b) <= bound + 1e-9, f"spec err {_err(a, b)} > bound {bound}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n,d,l", [(300, 16, 8), (1000, 32, 12), (64, 8, 4)])
def test_fd_bound_random(seed, n, d, l):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d))
    # low-rank + noise mix exercises meaningful shrink deltas
    a[:, : d // 2] *= 5.0
    fd = FrequentDirections(l, d).insert(a)
    _check(a, fd)


def test_fd_exact_when_rank_fits():
    rng = np.random.default_rng(7)
    # rank-3 matrix, l = 8 >= rank: after one pass err must stay tiny
    base = rng.standard_normal((3, 16))
    coef = rng.standard_normal((200, 3))
    a = coef @ base
    fd = FrequentDirections(8, 16).insert(a)
    fro = float((a * a).sum())
    assert _err(a, fd.compact()) <= 2.0 * fro / 8 + 1e-9


@pytest.mark.parametrize("splits", [2, 3, 7])
def test_fd_merge_keeps_bound(splits):
    rng = np.random.default_rng(11)
    a = rng.standard_normal((700, 24))
    a[:, :4] *= 10.0
    parts = np.array_split(a, splits)
    sketches = [FrequentDirections(10, 24).insert(p) for p in parts]
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    _check(a, acc)


def test_fd_merge_tree_vs_sequential_both_bounded():
    rng = np.random.default_rng(13)
    a = rng.standard_normal((400, 12))
    quarters = np.array_split(a, 4)
    seq = FrequentDirections(6, 12)
    for qq in quarters:
        seq.insert(qq)
    left = FrequentDirections(6, 12).insert(quarters[0]).merge(
        FrequentDirections(6, 12).insert(quarters[1])
    )
    right = FrequentDirections(6, 12).insert(quarters[2]).merge(
        FrequentDirections(6, 12).insert(quarters[3])
    )
    tree = left.merge(right)
    _check(a, seq)
    _check(a, tree)


def test_fd_input_validation():
    with pytest.raises(ValueError):
        FrequentDirections(0, 4)
    fd = FrequentDirections(4, 4)
    with pytest.raises(ValueError):
        fd.insert(np.zeros((2, 5)))
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(4, 5))


def test_fd_covariance_operator(spark):
    from ddsparkle.spark.dataops import fd_covariance

    rng = np.random.default_rng(3)
    vecs = (rng.standard_normal((257, 8)) * 0.2).clip(-0.9, 0.9)
    vecs[:, 2] *= 3.0  # dominant dimension 3 (1-based)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = fd_covariance(df, "embedding", l=4, scale_bits=20)
    assert res["n_vectors"] == 257
    assert res["dims"] == 8
    assert res["spec_bound_ok"] and res["psd_ok"] and res["top_dim_within_bound"]
    # exact parts replicate the quantized definition
    q = np.floor(vecs * 2.0**20 + 0.5).astype(np.int64)
    m2 = (q.astype(object) ** 2).sum(axis=0)
    assert res["top_dim"] == int(np.argmax(m2.astype(np.float64))) + 1
    assert res["fro_sq"] == pytest.approx(float(sum(m2)) / 2.0**40, rel=0, abs=0)
    assert res["top_dim_m2"] == pytest.approx(
        float(m2[res["top_dim"] - 1]) / 2.0**40, rel=0, abs=0
    )
    assert res["spec_err"] <= res["bound"]
