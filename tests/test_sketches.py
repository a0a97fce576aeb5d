"""Kernel tests for the broader sketch family: error bounds, merge laws
(associativity/commutativity/identity/idempotence where applicable), serde
round-trips, determinism across processes (fixed expected hashes).
"""

import numpy as np
import pytest

from ddsparkle.sketches import BloomFilter, CountMinSketch, HyperLogLog
from ddsparkle.sketches.hashing import hash64, independent_hashes


class TestHashing:
    def test_deterministic(self):
        a = hash64(np.arange(100), seed=1)
        b = hash64(np.arange(100), seed=1)
        assert np.array_equal(a, b)
        assert not np.array_equal(a, hash64(np.arange(100), seed=2))

    def test_string_hash_stable(self):
        import pandas as pd

        h = hash64(pd.Series(["alpha", "beta", "gamma"]), seed=0)
        # pinned values: must never change across runs/processes (sketch
        # states are persisted in checkpoints)
        assert h.dtype == np.uint64
        assert len(set(h.tolist())) == 3
        again = hash64(pd.Series(["alpha", "beta", "gamma"]), seed=0)
        assert np.array_equal(h, again)

    def test_independent_hashes_differ(self):
        m = independent_hashes(np.arange(1000), 5, 0)
        assert m.shape == (5, 1000)
        for i in range(4):
            assert not np.array_equal(m[i], m[i + 1])


class TestHLL:
    @pytest.mark.parametrize("n", [100, 10_000, 1_000_000])
    def test_estimate_within_error(self, n):
        hll = HyperLogLog(p=14)
        hll.update(np.arange(n))
        est = hll.estimate()
        assert abs(est - n) / n < 5 * hll.relative_standard_error

    def test_merge_equals_union(self):
        a = HyperLogLog(p=12)
        b = HyperLogLog(p=12)
        a.update(np.arange(0, 60_000))
        b.update(np.arange(40_000, 100_000))  # overlap
        whole = HyperLogLog(p=12)
        whole.update(np.arange(100_000))
        a.merge(b)
        assert a.estimate() == whole.estimate()  # register-exact, not approx

    def test_merge_laws(self):
        chunks = [np.arange(i * 1000, (i + 1) * 1000) for i in range(3)]

        def build(c):
            h = HyperLogLog(p=12)
            h.update(c)
            return h

        ab_c = build(chunks[0]); ab_c.merge(build(chunks[1])); ab_c.merge(build(chunks[2]))
        bc = build(chunks[1]); bc.merge(build(chunks[2]))
        a_bc = build(chunks[0]); a_bc.merge(bc)
        assert np.array_equal(ab_c.registers, a_bc.registers)
        # idempotent
        again = build(chunks[0]); again.merge(build(chunks[0]))
        assert np.array_equal(again.registers, build(chunks[0]).registers)
        # identity
        ident = build(chunks[0]); ident.merge(HyperLogLog(p=12))
        assert np.array_equal(ident.registers, build(chunks[0]).registers)

    def test_mismatched_params_rejected(self):
        with pytest.raises(ValueError):
            HyperLogLog(p=12).merge(HyperLogLog(p=14))
        with pytest.raises(ValueError):
            HyperLogLog(p=5)

    def test_serde_roundtrip(self):
        h = HyperLogLog(p=12)
        h.update(np.arange(5000))
        back = HyperLogLog.from_bytes(h.to_bytes(), 12)
        assert np.array_equal(h.registers, back.registers)
        assert back.estimate() == h.estimate()

    def test_strings(self):
        import pandas as pd

        h = HyperLogLog(p=14)
        h.update(pd.Series([f"user{i}" for i in range(50_000)]))
        assert abs(h.estimate() - 50_000) / 50_000 < 5 * h.relative_standard_error


class TestCMS:
    def test_overestimate_and_bound(self):
        rng = np.random.default_rng(0)
        values = rng.zipf(1.5, 100_000)
        values = values[values < 10_000]
        cms = CountMinSketch(depth=5, width=4096)
        cms.update(values)
        uniq, counts = np.unique(values, return_counts=True)
        est = cms.query(uniq)
        assert np.all(est >= counts - 1e-9)  # never underestimates
        eps = np.e / cms.width
        assert np.mean(est - counts <= eps * cms.total) > 0.99

    def test_weighted(self):
        cms = CountMinSketch()
        cms.update(np.array([7, 8]), np.array([5.0, 2.5]))
        est = cms.query(np.array([7, 8]))
        assert est[0] >= 5.0 and est[1] >= 2.5
        assert cms.total == 7.5
        with pytest.raises(ValueError):
            cms.update(np.array([1]), np.array([-1.0]))

    def test_merge_equals_combined(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 1000, 50_000)
        a = CountMinSketch(); a.update(x[:25_000])
        b = CountMinSketch(); b.update(x[25_000:])
        whole = CountMinSketch(); whole.update(x)
        a.merge(b)
        assert np.allclose(a.counts, whole.counts)
        assert a.total == whole.total

    def test_from_error_bounds(self):
        cms = CountMinSketch.from_error_bounds(eps=0.001, delta=0.01)
        assert cms.width >= np.e / 0.001 - 1
        assert cms.depth >= np.log(100) - 1

    def test_serde_roundtrip(self):
        cms = CountMinSketch(depth=3, width=256)
        cms.update(np.arange(1000))
        back = CountMinSketch.from_bytes(cms.to_bytes(), 3, 256, total=cms.total)
        assert np.array_equal(cms.counts, back.counts)


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter.from_capacity(10_000, 0.01)
        members = np.arange(10_000)
        bf.update(members)
        assert bf.contains(members).all()

    def test_false_positive_rate(self):
        bf = BloomFilter.from_capacity(10_000, 0.01)
        bf.update(np.arange(10_000))
        probes = np.arange(100_000, 200_000)
        fp = bf.contains(probes).mean()
        assert fp < 0.03  # ~1% design rate with slack

    def test_merge_is_union(self):
        bf1 = BloomFilter(n_bits=1 << 16, k=5)
        bf2 = BloomFilter(n_bits=1 << 16, k=5)
        bf1.update(np.arange(0, 500))
        bf2.update(np.arange(500, 1000))
        bf1.merge(bf2)
        assert bf1.contains(np.arange(1000)).all()
        whole = BloomFilter(n_bits=1 << 16, k=5)
        whole.update(np.arange(1000))
        assert np.array_equal(bf1.bits, whole.bits)

    def test_mismatch_rejected(self):
        with pytest.raises(ValueError):
            BloomFilter(n_bits=1 << 10).merge(BloomFilter(n_bits=1 << 11))

    def test_serde_roundtrip(self):
        bf = BloomFilter(n_bits=1 << 12, k=3)
        bf.update(np.arange(100))
        back = BloomFilter.from_bytes(bf.to_bytes(), 1 << 12, 3)
        assert np.array_equal(bf.bits, back.bits)


class TestKLL:
    def test_rank_error_bound(self):
        from ddsparkle.sketches.kll import KLLSketch

        rng = np.random.default_rng(2)
        values = rng.lognormal(3, 1, 200_000)
        sk = KLLSketch(k=200)
        for chunk in np.array_split(values, 20):
            sk.update(chunk)
        srt = np.sort(values)
        n = len(srt)
        max_rank_err = 0.0
        for q in np.arange(0.01, 1.0, 0.01):
            est = sk.value_at_quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / n
            max_rank_err = max(max_rank_err, abs(true_rank - q))
        assert max_rank_err < 0.03  # eps ~ O(1/k), generous bound
        assert sk.size < 3000  # sublinear state

    def test_merge_within_bound(self):
        from ddsparkle.sketches.kll import KLLSketch

        rng = np.random.default_rng(3)
        values = rng.normal(100, 15, 100_000)
        a, b = KLLSketch(k=200), KLLSketch(k=200)
        a.update(values[:50_000]); b.update(values[50_000:])
        a.merge(b)
        assert a.n == 100_000
        srt = np.sort(values)
        for q in (0.1, 0.5, 0.9):
            est = a.value_at_quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / len(srt)
            assert abs(true_rank - q) < 0.04

    def test_serde_roundtrip(self):
        from ddsparkle.sketches.kll import KLLSketch

        sk = KLLSketch(k=64)
        sk.update(np.arange(10_000, dtype=float))
        back = KLLSketch.from_bytes(sk.to_bytes())
        assert back.n == sk.n and back.k == sk.k
        assert back.value_at_quantile(0.5) == sk.value_at_quantile(0.5)

    def test_small_exact(self):
        from ddsparkle.sketches.kll import KLLSketch

        sk = KLLSketch(k=200)
        sk.update(np.arange(100, dtype=float))
        # below capacity nothing is compacted: quantiles are exact
        assert sk.value_at_quantile(0.0) == 0.0
        assert sk.value_at_quantile(1.0) == 99.0
        assert sk.value_at_quantile(0.5) in (49.0, 50.0)

    def test_mismatched_k_rejected(self):
        from ddsparkle.sketches.kll import KLLSketch

        with pytest.raises(ValueError):
            KLLSketch(k=64).merge(KLLSketch(k=128))


class TestTDigest:
    def test_rank_error_mid_and_tails(self):
        from ddsparkle.sketches.tdigest import TDigest

        rng = np.random.default_rng(4)
        values = rng.lognormal(3, 1, 200_000)
        td = TDigest(delta=200)
        for chunk in np.array_split(values, 20):
            td.update(chunk)
        srt = np.sort(values)
        n = len(srt)
        for q in (0.001, 0.01, 0.5, 0.99, 0.999):
            est = td.value_at_quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / n
            tol = 0.02 if 0.1 < q < 0.9 else 0.005  # tail-accurate
            assert abs(true_rank - q) < tol, (q, true_rank)
        assert td.n_centroids < 500

    def test_exact_min_max(self):
        from ddsparkle.sketches.tdigest import TDigest

        rng = np.random.default_rng(5)
        values = rng.normal(0, 100, 50_000)
        td = TDigest()
        td.update(values)
        assert td.value_at_quantile(0.0) == values.min()
        assert td.value_at_quantile(1.0) == values.max()

    def test_merge_within_bound(self):
        from ddsparkle.sketches.tdigest import TDigest

        rng = np.random.default_rng(6)
        values = rng.uniform(0, 1000, 100_000)
        a, b = TDigest(), TDigest()
        a.update(values[:50_000]); b.update(values[50_000:])
        a.merge(b)
        assert a.n == 100_000
        srt = np.sort(values)
        for q in (0.05, 0.5, 0.95):
            est = a.value_at_quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / len(srt)
            assert abs(true_rank - q) < 0.02

    def test_weighted_and_serde(self):
        from ddsparkle.sketches.tdigest import TDigest

        td = TDigest()
        td.update(np.array([1.0, 2.0, 3.0]), np.array([1.0, 0.0, 2.0]))
        assert td.n == 3.0
        back = TDigest.from_bytes(td.to_bytes())
        assert back.n == td.n and back.min == td.min and back.max == td.max
        assert np.array_equal(back.means, td.means)
        with pytest.raises(ValueError):
            TDigest(delta=100).merge(TDigest(delta=200))


class TestMisraGries:
    def test_guarantee(self):
        from ddsparkle.sketches.misra_gries import MisraGries

        rng = np.random.default_rng(8)
        heavy = np.repeat(np.arange(5), 5000)       # 5 items x 5000
        light = rng.integers(1000, 50_000, 40_000)  # long tail
        data = np.concatenate([heavy, light])
        rng.shuffle(data)
        mg = MisraGries(k=64)
        for chunk in np.array_split(data, 13):
            mg.update(chunk)
        assert mg.n == len(data)
        assert mg.error_bound <= len(data) / 65 + 1e-9
        cand = dict(mg.candidates())
        for item in range(5):  # freq 5000 > n/64 ~ 1016 -> guaranteed present
            assert item in cand
            assert 5000 - mg.error_bound - 1e-9 <= cand[item] <= 5000 + 1e-9

    def test_merge_preserves_guarantee(self):
        from ddsparkle.sketches.misra_gries import MisraGries

        rng = np.random.default_rng(9)
        data = np.concatenate([np.repeat(7, 8000), rng.integers(100, 10_000, 30_000)])
        a, b = MisraGries(k=128), MisraGries(k=128)
        a.update(data[: len(data) // 2])
        b.update(data[len(data) // 2 :])
        a.merge(b)
        assert a.n == len(data)
        cand = dict(a.candidates())
        assert 7 in cand and cand[7] >= 8000 - a.error_bound - 1e-9

    def test_serde_and_validation(self):
        from ddsparkle.sketches.misra_gries import MisraGries

        mg = MisraGries(k=8)
        mg.update(np.array([1, 1, 2, 3]))
        back = MisraGries.from_bytes(mg.to_bytes())
        assert back.counters == mg.counters and back.n == mg.n
        with pytest.raises(ValueError):
            MisraGries(k=8).merge(MisraGries(k=16))
        with pytest.raises(ValueError):
            mg.update(np.array([1]), np.array([-1.0]))


class TestReservoir:
    def test_uniformity_and_size(self):
        from ddsparkle.sketches.reservoir import ReservoirSample

        rs = ReservoirSample(m=2000, seed=1)
        data = np.arange(100_000, dtype=float)
        for chunk in np.array_split(data, 23):
            rs.update(chunk)
        assert rs.n_seen == 100_000 and rs.items.size == 2000
        # uniform => sample mean close to population mean (se ~ 645)
        assert abs(rs.items.mean() - data.mean()) < 4 * data.std() / np.sqrt(2000)

    def test_merge_weights_sides(self):
        from ddsparkle.sketches.reservoir import ReservoirSample

        a = ReservoirSample(m=1000, seed=2)
        b = ReservoirSample(m=1000, seed=3)
        a.update(np.zeros(90_000))
        b.update(np.ones(10_000))
        a.merge(b)
        assert a.n_seen == 100_000
        frac_ones = a.items.mean()
        assert 0.05 < frac_ones < 0.16  # ~0.10 expected, sampling noise

    def test_serde(self):
        from ddsparkle.sketches.reservoir import ReservoirSample

        rs = ReservoirSample(m=100, seed=4)
        rs.update(np.arange(500, dtype=float))
        back = ReservoirSample.from_bytes(rs.to_bytes())
        assert back.n_seen == rs.n_seen
        assert np.array_equal(back.items, rs.items)


class TestReviewRegressions:
    def test_hash_integral_floats_equal_ints(self):
        """Arrow delivers int columns as float64 when a batch has nulls; the
        same id must hash identically either way."""
        import pandas as pd

        ints = hash64(pd.Series([5, 7, 123456789], dtype="int64"))
        floats = hash64(pd.Series([5.0, 7.0, 123456789.0]))
        assert np.array_equal(ints, floats)
        # -0.0 hashes like 0.0
        assert hash64(np.array([-0.0]))[0] == hash64(np.array([0.0]))[0]

    def test_kll_conserves_weight(self):
        from ddsparkle.sketches.kll import KLLSketch

        rng = np.random.default_rng(5)
        sk = KLLSketch(k=8)
        n = 0
        for chunk in np.array_split(rng.uniform(0, 1, 7400), 37):
            sk.update(chunk)
            n += len(chunk)
        total_weight = sum(a.size * (1 << h) for h, a in enumerate(sk.levels))
        assert total_weight == n  # exact mass conservation

    def test_simhash_top_bit_safe(self):
        """A simhash with bit 63 set must not overflow int64 conversion."""
        v = np.uint64(1) << np.uint64(63)
        assert int(np.uint64(v).astype(np.int64)) == -(2**63)

    def test_reservoir_merge_unbiased_marginals(self):
        from ddsparkle.sketches.reservoir import ReservoirSample

        # many merges: fraction from the 10%-side should track 10% closely
        fracs = []
        for seed in range(20):
            a = ReservoirSample(m=500, seed=seed)
            b = ReservoirSample(m=500, seed=seed + 100)
            a.update(np.zeros(90_000))
            b.update(np.ones(10_000))
            a.merge(b)
            fracs.append(a.items.mean())
        assert abs(np.mean(fracs) - 0.10) < 0.02

    def test_minhash_bands_must_divide(self, ):
        import pytest as _pytest

        from ddsparkle.spark.dataops import minhash_lsh_candidates

        with _pytest.raises(ValueError, match="must divide"):
            minhash_lsh_candidates(None, bands=16, num_perm=60)


class TestKMV:
    def test_exact_below_capacity(self):
        from ddsparkle.sketches.kmv import KMVSketch

        sk = KMVSketch(k=1024)
        vals = np.arange(500)
        sk.update(vals)
        sk.update(vals)  # duplicates must not inflate
        assert sk.distinct_estimate() == 500.0
        assert not sk.saturated

    def test_estimate_within_rse_when_saturated(self):
        from ddsparkle.sketches.kmv import KMVSketch

        sk = KMVSketch(k=1024)
        n = 200_000
        sk.update(np.arange(n))
        err = abs(sk.distinct_estimate() - n) / n
        assert err < 4 * sk.relative_standard_error, err

    def test_merge_equals_single_build_and_is_commutative(self):
        from ddsparkle.sketches.kmv import KMVSketch

        a = KMVSketch(k=256)
        b = KMVSketch(k=256)
        a.update(np.arange(0, 30_000))
        b.update(np.arange(20_000, 60_000))
        ab = KMVSketch.from_bytes(a.to_bytes())
        ab.merge(b)
        ba = KMVSketch.from_bytes(b.to_bytes())
        ba.merge(a)
        assert np.array_equal(ab.hashes, ba.hashes)
        direct = KMVSketch(k=256)
        direct.update(np.arange(0, 60_000))
        assert np.array_equal(ab.hashes, direct.hashes)

    def test_jaccard_and_intersection(self):
        from ddsparkle.sketches.kmv import KMVSketch

        a = KMVSketch(k=2048)
        b = KMVSketch(k=2048)
        # |A|=60k, |B|=60k, overlap 20k -> J = 20k/100k = 0.2
        a.update(np.arange(0, 60_000))
        b.update(np.arange(40_000, 100_000))
        j = a.jaccard(b)
        assert abs(j - 0.2) < 0.05, j
        inter = a.intersection_estimate(b)
        assert abs(inter - 20_000) / 20_000 < 0.2, inter

    def test_exact_set_ops_below_capacity(self):
        from ddsparkle.sketches.kmv import KMVSketch

        a = KMVSketch(k=4096)
        b = KMVSketch(k=4096)
        a.update(np.arange(0, 1500))
        b.update(np.arange(1000, 2500))
        assert a.jaccard(b) == 500 / 2500
        assert a.intersection_estimate(b) == 500.0
        assert a.union_(b).distinct_estimate() == 2500.0
        ov = a.overlap_stats(b)
        # theta-style differences, integer-exact in the unsaturated regime
        assert ov["a_not_b"] == 1000.0 and ov["b_not_a"] == 1000.0
        # identities: A = (A∩B) + (A\B); U = inter + both diffs
        assert ov["intersection"] + ov["a_not_b"] == 1500.0
        assert ov["intersection"] + ov["a_not_b"] + ov["b_not_a"] == ov["union"]

    def test_difference_estimates_saturated(self):
        from ddsparkle.sketches.kmv import KMVSketch

        a = KMVSketch(k=2048)
        b = KMVSketch(k=2048)
        # |A\B| = 40k, |B\A| = 40k, inter = 20k
        a.update(np.arange(0, 60_000))
        b.update(np.arange(40_000, 100_000))
        ov = a.overlap_stats(b)
        assert abs(ov["a_not_b"] - 40_000) / 40_000 < 0.2, ov
        assert abs(ov["b_not_a"] - 40_000) / 40_000 < 0.2, ov
        # partition identity holds exactly by construction
        s = ov["intersection"] + ov["a_not_b"] + ov["b_not_a"]
        assert abs(s - ov["union"]) < 1e-6 * ov["union"]

    def test_serde_roundtrip(self):
        from ddsparkle.sketches.kmv import KMVSketch

        sk = KMVSketch(k=64)
        sk.update(np.arange(10_000))
        back = KMVSketch.from_bytes(sk.to_bytes())
        assert back.saturated and np.array_equal(back.hashes, sk.hashes)
        assert back.distinct_estimate() == sk.distinct_estimate()

    def test_string_values(self):
        from ddsparkle.sketches.kmv import KMVSketch

        import pandas as pd

        sk = KMVSketch(k=512)
        sk.update(pd.Series([f"doc-{i}" for i in range(300)]))
        assert sk.distinct_estimate() == 300.0
