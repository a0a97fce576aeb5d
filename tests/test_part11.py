"""Part-11 operators: rate_anomaly, leakage_safe_split, dgim_window_counts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ddsparkle.spark.approx import dgim_window_counts
from ddsparkle.spark.dataops import leakage_safe_split, rate_anomaly

pytestmark = pytest.mark.spark


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


def test_rate_anomaly_planted_spike(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 30 steady hours of 5 events, then one 50-event spike hour
    for h in range(30):
        for _ in range(5):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), "a"))
            eid += 1
    for _ in range(50):
        rows.append((eid, base + dt.timedelta(hours=30, minutes=1), "a"))
        eid += 1
    out = rate_anomaly(
        _events(spark, rows), bucket_seconds=3600, baseline_buckets=24,
        min_baseline=12, mad_mult=4,
    ).orderBy("bucket_epoch_s").collect()
    assert len(out) == 31
    # cold-start rows never alert; first bucket has the -1 sentinel
    assert out[0].baseline_n == 0 and out[0].med == -1 and out[0].mad == -1
    assert not any(r.is_anomaly for r in out[:30])
    spike = out[30]
    assert spike.n == 50 and spike.med == 5 and spike.mad == 0
    assert spike.is_anomaly  # |50-5| > 4*max(0,1)
    # steady rows have exact order-statistic medians
    assert out[15].med == 5 and out[15].mad == 0 and not out[15].is_anomaly


def test_rate_anomaly_spike_not_in_own_baseline(spark):
    # frame ends at -1: the spike's own bucket must not shift its median,
    # and the bucket AFTER a spike sees it in the baseline but the median
    # absorbs it (robustness — a mean-based gate would alert on the echo)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(20):
        n = 100 if h == 18 else 5
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), "a"))
            eid += 1
    out = rate_anomaly(
        _events(spark, rows), bucket_seconds=3600, baseline_buckets=24,
        min_baseline=12, mad_mult=4,
    ).orderBy("bucket_epoch_s").collect()
    assert out[18].med == 5 and out[18].is_anomaly
    after = out[19]
    assert after.med == 5 and after.mad == 0 and not after.is_anomaly


def test_leakage_safe_split_cluster_atomic(spark):
    # two planted near-dup pairs + singletons: every cluster lands in ONE
    # split, and membership is keyed on the representative's hash
    long_a = " ".join(f"tok{i}" for i in range(40))
    long_b = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    rows = [(0, long_a), (1, long_b), (2, "totally different text here"),
            (3, "another unrelated document entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(
        df, num_perm=32, bands=32, max_bucket_size=None
    ).collect()
    assert len(out) == 4
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].rep_id == 0 and by_id[1].rep_id == 0
    assert by_id[0].split == by_id[1].split
    splits = {r.rep_id: set() for r in out}
    for r in out:
        splits[r.rep_id].add(r.split)
    assert all(len(s) == 1 for s in splits.values())


def test_dgim_window_counts_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        rows.append((i, base + dt.timedelta(minutes=7 * i), "a"))
    for i in range(80):
        rows.append((10_000 + i, base + dt.timedelta(minutes=31 * i), "b"))
    df = _events(spark, rows)
    mx = df.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    windows = (3600, 86_400)
    out = dgim_window_counts(
        df, windows_s=windows, r=4, as_of_micros=mx
    ).collect()
    assert len(out) == 4
    for r in out:
        cut = mx - r.window_s * 1_000_000
        true = df.filter(
            (F.col("event_type") == r.event_type)
            & (F.unix_micros(F.col("ts").cast("timestamp")) > cut)
        ).count()
        if r.oldest_size == 0:
            assert true == 0 and r.est2 == 0
        else:
            d = 2 * true - r.est2
            assert 2 - r.oldest_size <= d <= r.oldest_size
        assert r.n_buckets <= 4 * max(r.n_seen, 1).bit_length()


def test_streaming_dgim_multibatch_equals_batch(spark, tmp_path):
    # two time-ordered files -> two micro-batches: cross-batch state must
    # continue the histogram exactly where batch replay of the union ends
    import os
    import time

    from ddsparkle.sketches.dgim import DgimSketch
    from ddsparkle.spark.approx import dgim_window_counts
    from ddsparkle.spark.streaming import streaming_dgim_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=3 * i), "a" if i % 3 else "b")
        for i in range(400)
    ]
    df = _events(spark, rows)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    early = df.filter(F.col("event_id") < 200)
    late = df.filter(F.col("event_id") >= 200)
    early.coalesce(1).write.parquet(f"{src}/f0.parquet")
    time.sleep(1.1)  # file-source ordering is modification-time based
    late.coalesce(1).write.parquet(f"{src}/f1.parquet")

    schema = df.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    states = {}
    n_batches = [0]

    def sink(bdf, _bid):
        n_batches[0] += 1
        for r in bdf.collect():
            states[r["event_type"]] = r

    q = (
        streaming_dgim_counts(stream, r=3)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert n_batches[0] == 2  # the cross-batch path actually ran

    mx = df.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    batch = dgim_window_counts(
        df, windows_s=(3600, 7200), r=3, as_of_micros=mx
    ).collect()
    for b in batch:
        s = states[b.event_type]
        sk = DgimSketch(
            r=3, sizes=list(s["sizes"]), ts=list(s["ts"]),
            n_seen=int(s["n_seen"]),
        )
        est2, oldest = sk.estimate2(mx - b.window_s * 1_000_000)
        assert (est2, oldest, sk.n_buckets, sk.n_seen) == (
            b.est2, b.oldest_size, b.n_buckets, b.n_seen,
        )


def test_chi2_2x2_hand_computed(spark):
    from ddsparkle.spark.dataops import chi2_2x2

    # classic textbook table: a=10 b=20 c=30 d=40 -> chi2 = 100*(400-600)^2
    # / (30*70*40*60) = 4e6/5.04e6 = 0.7936...
    rows = (
        [(False, False)] * 10 + [(False, True)] * 20
        + [(True, False)] * 30 + [(True, True)] * 40
    )
    df = spark.createDataFrame(rows, "x boolean, y boolean")
    r = chi2_2x2(df, "x", "y").collect()[0]
    assert (r.n, r.n_x0_y0, r.n_x0_y1, r.n_x1_y0, r.n_x1_y1) == (
        100, 10, 20, 30, 40,
    )
    assert abs(r.chi2 - 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)) < 1e-12
    assert not r.significant_95
    # strongly dependent -> significant
    dep = spark.createDataFrame(
        [(False, False)] * 50 + [(True, True)] * 50, "x boolean, y boolean"
    )
    assert chi2_2x2(dep, "x", "y").collect()[0].significant_95


def test_chi2_2x2_degenerate_and_nulls(spark):
    from ddsparkle.spark.dataops import chi2_2x2

    # empty column margin (everyone converted) -> chi2 NULL, not significant
    df = spark.createDataFrame(
        [(False, True)] * 5 + [(True, True)] * 5, "x boolean, y boolean"
    )
    r = chi2_2x2(df, "x", "y").collect()[0]
    assert r.chi2 is None and not r.significant_95
    # NULL rows excluded
    df2 = spark.createDataFrame(
        [(None, True), (False, None), (False, True), (True, False)],
        "x boolean, y boolean",
    )
    assert chi2_2x2(df2, "x", "y").collect()[0].n == 2


def test_mann_whitney_vs_brute_force(spark):
    import math
    import random
    from collections import Counter

    from ddsparkle.spark.dataops import mann_whitney_u

    def brute(pairs):
        vals = sorted(v for _, v in pairs)
        n = len(vals)
        rank = {}
        i = 0
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            rank[vals[i]] = (i + 1 + j) / 2
            i = j
        r1 = sum(rank[v] for g, v in pairs if g)
        n1 = sum(1 for g, _ in pairs if g)
        n2 = n - n1
        u1 = r1 - n1 * (n1 + 1) / 2
        t = sum(c**3 - c for c in Counter(vals).values())
        var = n1 * n2 / 12 * ((n + 1) - t / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2) / math.sqrt(var)
        return n1, n2, int(2 * u1), t, z * z

    rng = random.Random(11)
    for _ in range(4):
        pairs = [
            (rng.random() < 0.5, rng.randrange(0, 10))
            for _ in range(rng.randrange(30, 150))
        ]
        df = spark.createDataFrame(pairs, "g boolean, v long")
        r = mann_whitney_u(df, "g", "v").collect()[0]
        n1, n2, u2, t, z2 = brute(pairs)
        assert (r.n_true, r.n_false, r.u2_true, r.tie_term) == (n1, n2, u2, t)
        assert abs(r.z2 - z2) < 1e-9
        assert abs(r.rank_biserial - (u2 - n1 * n2) / (n1 * n2)) < 1e-12


def test_mann_whitney_shift_detected_and_nulls(spark):
    from ddsparkle.spark.dataops import mann_whitney_u

    # clear location shift -> significant, positive effect
    rows = [(False, v) for v in range(50)] + [(True, v + 30) for v in range(50)]
    r = mann_whitney_u(
        spark.createDataFrame(rows, "g boolean, v long"), "g", "v"
    ).collect()[0]
    assert r.significant_95 and r.rank_biserial > 0.5
    # NULLs excluded
    df = spark.createDataFrame(
        [(None, 1), (True, None), (True, 2), (False, 1)],
        "g boolean, v long",
    )
    r2 = mann_whitney_u(df, "g", "v").collect()[0]
    assert r2.n_true == 1 and r2.n_false == 1


def test_rate_anomaly_seasonal_same_phase_only(spark):
    # hourly series with a strong daily pattern: hour-6 always runs hot
    # (50/hour), every other hour 5/hour. A trailing baseline would flag
    # every hour-6 bucket; the seasonal baseline (same-hour history) sees
    # 50 as that phase's NORMAL level and stays quiet — until one day the
    # hour-6 bucket spikes to 200, which only the same-phase median catches
    # as anomalous relative to 50.
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(20):
        for h in range(24):
            n = 50 if h == 6 else 5
            if day == 19 and h == 6:
                n = 200
            for _ in range(n):
                rows.append((eid, base + dt.timedelta(days=day, hours=h), "a"))
                eid += 1
    df = _events(spark, rows)
    seasonal = rate_anomaly(
        df, bucket_seconds=3600, baseline_buckets=14, min_baseline=7,
        mad_mult=4, seasonal_period=24,
    ).orderBy("bucket_epoch_s").collect()
    hot = [r for r in seasonal if (r.bucket_epoch_s // 3600) % 24 == 6]
    # steady hot hours: same-phase median is 50 -> no alert
    mature = [r for r in hot if r.baseline_n >= 7 and r.n == 50]
    assert mature and all(r.med == 50 and not r.is_anomaly for r in mature)
    # the planted 200-spike against the 50-median phase IS anomalous
    spike = [r for r in hot if r.n == 200]
    assert len(spike) == 1 and spike[0].med == 50 and spike[0].is_anomaly
    # trailing mode would alert on EVERY mature hot hour (50 vs med 5)
    trailing = rate_anomaly(
        df, bucket_seconds=3600, baseline_buckets=24, min_baseline=12,
        mad_mult=4,
    ).orderBy("bucket_epoch_s").collect()
    tr_hot = [
        r for r in trailing
        if (r.bucket_epoch_s // 3600) % 24 == 6 and r.baseline_n >= 12
        and r.n == 50
    ]
    assert tr_hot and all(r.is_anomaly for r in tr_hot)


def test_cusum_detects_sustained_shift_median_misses(spark):
    # a sustained +40% level shift: each bucket is individually unremarkable
    # (|n - med| small), so the median/MAD point-outlier rule stays quiet,
    # while CUSUM accumulates the drift and alarms — the two detectors'
    # complementary contract
    from ddsparkle.spark.dataops import cusum_changepoints

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(75):
        n = 10 if h < 40 else 14  # shift at h=40
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), "a"))
            eid += 1
    df = _events(spark, rows)
    out = cusum_changepoints(
        df, bucket_seconds=3600, slack=0, h_mult=8
    ).orderBy("bucket_epoch_s").collect()
    assert len(out) == 75
    # reference is the lower median over the whole series (mostly 10s)
    assert out[0].ref == 10
    pre = [r for r in out[:40]]
    assert not any(r.alarm_hi for r in pre)
    # post-shift the hi statistic accumulates +4/hour: alarm once
    # cusum_hi > 8*10, i.e. 21 shifted buckets in
    assert any(r.alarm_hi for r in out[40:])
    assert out[-1].cusum_hi == 35 * 4  # 35 shifted buckets accumulated
    # the point-outlier rule never fires: each shifted bucket is only +4
    # against a med/MAD of (10, ~0) -> |14-10| > 4*max(mad,1) is false
    point = rate_anomaly(
        df, bucket_seconds=3600, baseline_buckets=24, min_baseline=12,
        mad_mult=4,
    ).collect()
    assert not any(r.is_anomaly for r in point)


def test_cusum_prefix_form_matches_recursion(spark):
    # the closed form S_t = P_t - min(0, running_min(P)) must equal the
    # textbook recursion S_t = max(0, S_{t-1} + d_t) on an arbitrary series
    import random

    from ddsparkle.spark.dataops import cusum_changepoints

    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    counts = [rng.randrange(1, 12) for _ in range(50)]
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), "a"))
            eid += 1
    out = cusum_changepoints(
        _events(spark, rows), bucket_seconds=3600, slack=0, h_mult=8
    ).orderBy("bucket_epoch_s").collect()
    ref = out[0].ref
    s_hi = s_lo = 0
    for r, n in zip(out, counts):
        s_hi = max(0, s_hi + (n - ref))
        s_lo = max(0, s_lo + (ref - n))
        assert (r.cusum_hi, r.cusum_lo) == (s_hi, s_lo)


def test_ks_2sample_vs_brute_force(spark):
    import bisect
    import random

    from ddsparkle.spark.dataops import ks_2sample

    def brute(pairs):
        a = sorted(v for g, v in pairs if g)
        b = sorted(v for g, v in pairs if not g)
        n1, n2 = len(a), len(b)
        m = 0
        for v in sorted(set(v for _, v in pairs)):
            c1 = bisect.bisect_right(a, v)
            c2 = bisect.bisect_right(b, v)
            m = max(m, abs(c1 * n2 - c2 * n1))
        sig = m * m * 1_000_000 > 1_844_164 * (n1 + n2) * n1 * n2
        return n1, n2, m, m / (n1 * n2), sig

    rng = random.Random(9)
    for trial in range(4):
        shift = trial % 2 == 0
        pairs = (
            [(True, rng.gauss(0, 1)) for _ in range(rng.randrange(60, 250))]
            + [
                (False, rng.gauss(0.8 if shift else 0, 1))
                for _ in range(rng.randrange(60, 250))
            ]
            + [(rng.random() < 0.5, float(rng.randrange(3))) for _ in range(40)]
        )
        df = spark.createDataFrame(pairs, "g boolean, v double")
        r = ks_2sample(df, "g", "v").collect()[0]
        n1, n2, m, ks, sig = brute(pairs)
        assert (r.n_true, r.n_false, r.ks_numer, r.significant_95) == (
            n1, n2, m, sig,
        )
        assert abs(r.ks - ks) < 1e-12
        assert r.significant_95 == shift  # planted shifts detected, nulls not


def test_ks_2sample_sees_shape_mann_whitney_misses(spark):
    # equal medians/means, different VARIANCE: the rank test reads ~no
    # location shift while KS flags the shape change — the trio's
    # division of labor
    import random

    from ddsparkle.spark.dataops import ks_2sample, mann_whitney_u

    rng = random.Random(4)
    pairs = [(True, rng.gauss(0, 1)) for _ in range(900)] + [
        (False, rng.gauss(0, 4)) for _ in range(900)
    ]
    df = spark.createDataFrame(pairs, "g boolean, v double")
    assert ks_2sample(df, "g", "v").collect()[0].significant_95
    assert not mann_whitney_u(df, "g", "v").collect()[0].significant_95


def test_spearman_vs_brute_force_and_degenerate(spark):
    import bisect
    import random

    from ddsparkle.spark.dataops import spearman_rho

    def brute(pairs):
        def midranks(vals):
            sv = sorted(vals)
            return [
                bisect.bisect_left(sv, v) + bisect.bisect_right(sv, v) + 1
                for v in vals
            ]

        rx = midranks([p[0] for p in pairs])
        ry = midranks([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(a * a for a in rx)
        syy = sum(a * a for a in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        rho2 = (num / d1) * (num / d2)
        return n, rho2, (num > 0) - (num < 0), rho2 * (n - 1) > 3.8416

    rng = random.Random(13)
    for trial in range(4):
        mono = trial % 2 == 0
        pairs = []
        for _ in range(rng.randrange(50, 200)):
            xv = rng.randrange(0, 20)
            yv = xv + rng.randrange(0, 8) if mono else rng.randrange(0, 20)
            pairs.append((float(xv), float(yv)))
        df = spark.createDataFrame(pairs, "x double, y double")
        r = spearman_rho(df, "x", "y").collect()[0]
        n, rho2, sign, sig = brute(pairs)
        assert (r.n, r.sign, r.significant_95) == (n, sign, sig)
        assert abs(r.rho2 - rho2) < 1e-12
        if mono:
            assert r.significant_95 and r.sign == 1
    # monotone-transform invariance: spearman(x, exp-like y) == spearman(x, y)
    pairs = [(float(i % 17), float((i * 7) % 23)) for i in range(120)]
    df1 = spark.createDataFrame(pairs, "x double, y double")
    df2 = spark.createDataFrame(
        [(x, y * y * y + 5) for x, y in pairs], "x double, y double"
    )
    a = spearman_rho(df1, "x", "y").collect()[0]
    b = spearman_rho(df2, "x", "y").collect()[0]
    assert a.rho2 == b.rho2 and a.sign == b.sign
    # constant column -> NULL rho2, not significant
    dfc = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "x double, y double"
    )
    rc = spearman_rho(dfc, "x", "y").collect()[0]
    assert rc.rho2 is None and not rc.significant_95


def test_kruskal_wallis_vs_brute_force(spark):
    import bisect
    import random
    from collections import Counter

    from ddsparkle.spark.dataops import kruskal_wallis

    def brute(pairs):
        vals = sorted(v for _, v in pairs)
        n = len(pairs)

        def mr2(v):
            return bisect.bisect_left(vals, v) + bisect.bisect_right(vals, v) + 1

        groups = {}
        for g, v in pairs:
            groups.setdefault(g, []).append(v)
        fold = 0.0
        for g in sorted(groups):  # the pinned fold order
            sg2 = sum(mr2(v) for v in groups[g])
            fold = fold + (sg2 * sg2) / (4.0 * len(groups[g]))
        t = sum(c**3 - c for c in Counter(vals).values())
        h_raw = 12.0 / (n * (n + 1.0)) * fold - 3.0 * (n + 1.0)
        return len(groups), n, t, h_raw / (1.0 - t / (float(n) ** 3 - n))

    rng = random.Random(21)
    for trial in range(4):
        shift = trial % 2 == 0
        pairs = []
        for gi, gname in enumerate(["a", "b", "c", "d"]):
            off = gi * 3 if shift else 0
            for _ in range(rng.randrange(40, 120)):
                pairs.append((gname, float(rng.randrange(0, 25) + off)))
        df = spark.createDataFrame(pairs, "g string, v double")
        r = kruskal_wallis(df, "g", "v").collect()[0]
        k, n, t, h = brute(pairs)
        assert (r.k, r.n, r.tie_term) == (k, n, t)
        assert abs(r.h - h) < 1e-9
        assert r.significant_95 == (h > 7.8147) == shift
    # explicit crit overrides the dof table
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0), ("b", 10.0)], "g string, v double"
    )
    loose = kruskal_wallis(df, "g", "v", crit=0.1).collect()[0]
    strict = kruskal_wallis(df, "g", "v", crit=1e9).collect()[0]
    assert loose.significant_95 and not strict.significant_95


def test_wilcoxon_signed_rank_vs_brute_force(spark):
    import bisect
    import random
    from collections import Counter

    from ddsparkle.spark.dataops import wilcoxon_signed_rank

    def brute(pairs):
        ds = [x - y for x, y in pairs if x != y]
        n = len(ds)
        ads = sorted(abs(d) for d in ds)

        def mr2(v):
            return bisect.bisect_left(ads, v) + bisect.bisect_right(ads, v) + 1

        w2 = sum(mr2(abs(d)) for d in ds if d > 0)
        t = sum(c**3 - c for c in Counter(ads).values())
        d2 = 2 * w2 - n * (n + 1)
        denom = 2.0 * n * (n + 1.0) * (2.0 * n + 1.0) - t
        z2 = 3.0 * d2 * d2 / denom
        return n, w2, t, z2, (d2 > 0) - (d2 < 0), z2 > 3.8416

    rng = random.Random(31)
    for trial in range(4):
        biased = trial % 2 == 0
        pairs = []
        for _ in range(rng.randrange(60, 200)):
            xv = float(rng.randrange(0, 30))
            yv = xv - (
                rng.randrange(0, 4) if biased else rng.randrange(-3, 4)
            )
            pairs.append((xv, yv))
        df = spark.createDataFrame(pairs, "x double, y double")
        r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
        n, w2, t, z2, sign, sig = brute(pairs)
        assert (r.n_nonzero, r.w2_pos, r.tie_term, r.sign) == (n, w2, t, sign)
        assert abs(r.z2 - z2) < 1e-9
        assert r.significant_95 == sig == biased
    # all-equal pairs -> everything drops, NULL z2, not significant
    dfz = spark.createDataFrame([(1.0, 1.0)] * 5, "x double, y double")
    rz = wilcoxon_signed_rank(dfz, "x", "y").collect()[0]
    assert rz.n_nonzero == 0 and rz.z2 is None and not rz.significant_95


def test_poisson_bootstrap_ci_vs_brute_force(spark):
    import hashlib
    import math
    import random

    from ddsparkle.spark.dataops import POISSON1_T60, poisson_bootstrap_ci

    B, scale_bits = 40, 20
    scale = float(2**scale_bits)
    klo = math.ceil(B * 0.05 / 2)  # 1
    khi = B + 1 - klo

    def weight(key, r):
        h = int(hashlib.md5(f"{key}:{r}".encode()).hexdigest()[:15], 16)
        return sum(h >= t for t in POISSON1_T60)

    def brute(rows):
        by_g = {}
        for g, k, v in rows:
            by_g.setdefault(g, []).append((k, math.floor(v * scale + 0.5)))
        out = {}
        for g, items in by_g.items():
            means = []
            for r in range(1, B + 1):
                num = sum(weight(k, r) * q for k, q in items)
                den = sum(weight(k, r) for k, _ in items)
                if den > 0:
                    means.append((num / den / scale, r))
            means.sort()
            n = len(items)
            mq = sum(q for _, q in items) / n / scale
            lo = means[klo - 1][0] if len(means) >= klo else None
            hi = means[khi - 1][0] if len(means) >= khi else None
            out[g] = (n, len(means), lo, hi, mq, lo <= mq <= hi)
        return out

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", 1000 + j * 3 + i, float(rng.randrange(0, 500)) / 7.0)
        for i in range(3)
        for j in range(rng.randrange(40, 120))
    ]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    got = {
        r.g: r
        for r in poisson_bootstrap_ci(
            df, "v", "k", group_cols=["g"], n_replicates=B
        ).collect()
    }
    want = brute(rows)
    assert set(got) == set(want)
    for g, (n, reff, lo, hi, mq, cov) in want.items():
        r = got[g]
        assert (r.n_rows, r.r_eff) == (n, reff)
        assert r.ci_lo == lo and r.ci_hi == hi  # identical pinned IEEE trees
        assert r.mean_q == mq and r.covers_mean == cov
        assert r.ci_nondegenerate
    # tiny group: fewer surviving replicates than khi -> NULL hi, still sane
    df1 = spark.createDataFrame([("a", 1, 5.0)], "g string, k long, v double")
    r1 = poisson_bootstrap_ci(
        df1, "v", "k", group_cols=["g"], n_replicates=B
    ).collect()[0]
    assert r1.n_rows == 1 and r1.r_eff < B and r1.ci_hi is None


def test_jl_project_vs_numpy_brute_force(spark):
    import math
    import random

    import numpy as np

    from ddsparkle.spark.dataops import jl_project, jl_sign_matrix

    d_in, k = 12, 6
    S = np.array(jl_sign_matrix(d_in, k), dtype=np.int64)
    assert set(S.flatten().tolist()) == {-1, 1}
    # the matrix is pinned: same call, same literals
    assert jl_sign_matrix(d_in, k) == jl_sign_matrix(d_in, k)
    assert jl_sign_matrix(d_in, k, "other") != jl_sign_matrix(d_in, k)

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(d_in)]) for i in range(80)
    ]
    rows.append((900, None))  # dropped
    rows.append((901, [0.5] * (d_in - 1)))  # wrong length -> dropped
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    got = {
        r.vid: list(r.proj)
        for r in jl_project(df, "emb", "vid", d_in=d_in, k=k).collect()
    }
    assert set(got) == {i for i, _ in rows[:80]}
    for vid, emb in rows[:80]:
        q = np.array(
            [math.floor(x * 1048576.0 + 0.5) for x in emb], dtype=np.int64
        )
        assert got[vid] == (q @ S).tolist()


def test_linreg_vs_brute_force(spark):
    import random

    from ddsparkle.spark.dataops import linreg

    def brute(pts, dx, dy):
        import math

        # Spark ROUND is HALF-UP; python round() is half-even
        def hu(v):
            return math.floor(v + 0.5)

        n = len(pts)
        qs = [
            (hu(x * 10**dx), hu(y * 10**dy)) for x, y in pts
        ]
        sx = sum(q for q, _ in qs)
        sy = sum(q for _, q in qs)
        sxx = sum(q * q for q, _ in qs)
        syy = sum(q * q for _, q in qs)
        sxy = sum(a * b for a, b in qs)
        nd = float(n)
        mx, my = float(sx) / nd, float(sy) / nd
        cov = float(sxy) / nd - mx * my
        varx = float(sxx) / nd - mx * mx
        vary = float(syy) / nd - my * my
        dnum = n * sxy - sx * sy
        if varx <= 0:
            return n, None, None, None, None, (dnum > 0) - (dnum < 0), False
        slope = (cov / varx) * float(10.0 ** (dx - dy))
        ic = (my - (cov / varx) * mx) / float(10.0**dy)
        r2 = (cov / varx) * (cov / vary) if vary > 0 else None
        t2 = (
            r2 * (nd - 2.0) / (1.0 - r2)
            if r2 is not None and n > 2 and 1.0 - r2 > 0
            else None
        )
        return (
            n, slope, ic, r2, t2,
            (dnum > 0) - (dnum < 0),
            t2 is not None and t2 > 3.8416,
        )

    rng = random.Random(23)
    # x, y on a 1/8 grid -> *10^d is exact, no rounding edge
    pts = [
        (rng.randrange(0, 400) / 8.0, 0.0) for _ in range(150)
    ]
    pts = [(x, 3.25 * x + 10.0 + rng.randrange(-80, 81) / 8.0) for x, _ in pts]
    for dx, dy in ((0, 0), (2, 1)):
        df = spark.createDataFrame(pts, "x double, y double")
        r = linreg(df, "x", "y", x_decimals=dx, y_decimals=dy).collect()[0]
        n, slope, ic, r2, t2, sign, sig = brute(pts, dx, dy)
        assert r.n == n and r.slope_sign == sign and r.significant_95 == sig
        assert r.slope == slope and r.intercept == ic  # identical IEEE trees
        assert r.r2 == r2 and r.t2 == t2
        assert sig and 3.0 < r.slope < 3.5 and r.r2 > 0.9
    # grouped + degenerate: one group is a vertical line (var(x)=0)
    rows = [("a", x, y) for (x, y) in pts] + [("b", 5.0, float(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in linreg(df, "x", "y", group_cols=["g"], x_decimals=0, y_decimals=0).collect()}
    assert got["a"].significant_95 and got["a"].slope is not None
    b = got["b"]
    assert b.slope is None and b.r2 is None and not b.significant_95
    assert b.slope_sign == 0


def test_corr_matrix_matches_linreg_pairs(spark):
    import random

    from ddsparkle.spark.dataops import corr_matrix, linreg

    rng = random.Random(5)
    rows = []
    for i in range(300):
        a = float(rng.randrange(0, 100))
        rows.append(
            (a, 2.0 * a + rng.randrange(0, 50), float(rng.randrange(0, 9)))
        )
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r.x_col, r.y_col): r
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), r in got.items():
        # bit-equal to the pairwise linreg (same sums, same shared trees)
        lr = linreg(df, x, y, x_decimals=0, y_decimals=0).collect()[0]
        assert (r.n, r.r2, r.t2, r.sign, r.significant_95) == (
            lr.n,
            lr.r2,
            lr.t2,
            lr.slope_sign,
            lr.significant_95,
        )
    assert got[("a", "b")].significant_95 and got[("a", "b")].r2 > 0.8
    assert not got[("a", "c")].significant_95
    # complete-case: a NULL in any column drops the whole row
    rows_n = rows + [(None, 1.0, 1.0), (1.0, None, 1.0)]
    dfn = spark.createDataFrame(rows_n, "a double, b double, c double")
    rn = corr_matrix(dfn, ["a", "b", "c"]).collect()[0]
    assert rn.n == len(rows)


def test_winsorize_by_sketch_clamps_and_null_passthrough(spark):
    from ddsparkle.config import SketchConfig
    from ddsparkle.spark.dataops import winsorize_by_sketch

    cfg = SketchConfig(
        mapping_kind="log", relative_accuracy=0.01, track_exact_stats=False
    )
    rows = [("g", float(i)) for i in range(1, 201)] + [("g", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorize_by_sketch(df, "v", "k", config=cfg).collect()
    assert len(out) == 201
    vals = [r for r in out if r.v is not None]
    lo = min(r.v_winsorized for r in vals)
    hi = max(r.v_winsorized for r in vals)
    # bounds within the sketch's relative accuracy of the exact p5/p95
    assert abs(lo - 10.0) <= 0.01 * 10.0 + 1.5
    assert abs(hi - 190.0) <= 0.01 * 190.0 + 1.5
    for r in vals:
        assert lo <= r.v_winsorized <= hi
        assert r.clamped_lo == (r.v < lo) and r.clamped_hi == (r.v > hi)
        if not r.clamped_lo and not r.clamped_hi:
            assert r.v_winsorized == r.v
    n_lo = sum(r.clamped_lo for r in vals)
    n_hi = sum(r.clamped_hi for r in vals)
    assert 5 <= n_lo <= 15 and 5 <= n_hi <= 15  # ~5% tails of 200
    nul = [r for r in out if r.v is None][0]
    assert nul.v_winsorized is None
    assert not nul.clamped_lo and not nul.clamped_hi


def test_benford_audit_vs_hand_computed(spark):
    from ddsparkle.spark.dataops import (
        BENFORD_P10,
        benford_audit,
    )

    # counts proportional to Benford -> consistent; values d * 10^k so
    # the first digit is unambiguous
    rows = []
    counts = [round(1000 * p) for p in BENFORD_P10]
    for d, c in enumerate(counts, start=1):
        for i in range(c):
            rows.append((float(d) * (10.0 ** (i % 3)),))
    df = spark.createDataFrame(rows, "v double")
    r = benford_audit(df, "v").collect()[0]
    assert [getattr(r, f"c{d}") for d in range(1, 10)] == counts
    n = sum(counts)
    chi2 = 0.0
    for d, p in enumerate(BENFORD_P10, start=1):
        e = float(n) * p
        chi2 = chi2 + (float(counts[d - 1]) - e) * (
            float(counts[d - 1]) - e
        ) / e
    assert r.n == n and r.chi2 == chi2  # identical pinned IEEE fold
    assert r.benford_consistent
    # uniform digits -> wildly inconsistent; zeros and NULLs drop
    rows_u = [(float(d),) for d in range(1, 10) for _ in range(200)]
    rows_u += [(0.0,), (None,)]
    du = spark.createDataFrame(rows_u, "v double")
    ru = benford_audit(du, "v").collect()[0]
    assert ru.n == 1800 and ru.c1 == 200
    assert ru.chi2 > 100 and not ru.benford_consistent
    # grouped path
    both = df.withColumn("g", F.lit("a")).unionByName(
        du.withColumn("g", F.lit("b"))
    )
    got = {
        r.g: r for r in benford_audit(both, "v", group_cols=["g"]).collect()
    }
    assert got["a"].benford_consistent and not got["b"].benford_consistent


def test_theil_sen_vs_brute_force_and_robustness(spark):
    import math
    import random

    from ddsparkle.spark.dataops import linreg, theil_sen

    def hu(v):
        return math.floor(v + 0.5)

    def brute(rows, dx, dy):
        q = [
            (i, hu(x * 10**dx), hu(y * 10**dy)) for i, x, y in rows
        ]
        slopes = []
        for ai in range(len(q)):
            for bi in range(ai + 1, len(q)):
                ia, xa, ya = q[ai]
                ib, xb, yb = q[bi]
                if ia > ib:
                    ia, xa, ya, ib, xb, yb = ib, xb, yb, ia, xa, ya
                if xa != xb:
                    slopes.append(
                        (
                            float(yb - ya) / float(xb - xa)
                            * float(10.0 ** (dx - dy)),
                            ia,
                            ib,
                        )
                    )
        slopes.sort()
        m = slopes[(len(slopes) + 1) // 2 - 1][0]
        resid = sorted(
            (
                float(qy) / 10**dy - m * (float(qx) / 10**dx),
                i,
            )
            for i, qx, qy in q
        )
        ic = resid[(len(resid) + 1) // 2 - 1][0]
        return len(q), len(slopes), m, ic

    rng = random.Random(77)
    rows = [
        (i, float(rng.randrange(1, 200)) / 8.0, 0.0) for i in range(60)
    ]
    rows = [
        (i, x, 3.0 * x + 5.0 + rng.randrange(-16, 17) / 8.0)
        for i, x, _ in rows
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    r = theil_sen(df, "x", "y", "id", x_decimals=1, y_decimals=1).collect()[0]
    n, npairs, m, ic = brute(rows, 1, 1)
    assert (r.n, r.n_pairs) == (n, npairs)
    assert r.slope == m and r.intercept == ic  # pure order statistics
    assert 2.8 < r.slope < 3.2
    # robustness: corrupt 10% of y by 100x — OLS slope explodes, TS holds
    bad = [
        (i, x, y * (100.0 if i % 10 == 0 else 1.0)) for i, x, y in rows
    ]
    dfb = spark.createDataFrame(bad, "id long, x double, y double")
    rb = theil_sen(dfb, "x", "y", "id", x_decimals=1, y_decimals=1).collect()[0]
    ols = linreg(dfb, "x", "y", x_decimals=1, y_decimals=1).collect()[0]
    assert abs(rb.slope - r.slope) < 0.5 * r.slope
    assert ols.slope > 3.0 * r.slope


def test_mann_kendall_vs_brute_force(spark):
    import random

    from ddsparkle.spark.dataops import mann_kendall

    def brute(rows):
        srt = sorted(rows, key=lambda r: (r[0], r[1]))
        vs = [v for _, _, v in srt]
        n = len(vs)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (vs[j] > vs[i]) - (vs[j] < vs[i])
        from collections import Counter

        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(vs).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tt
        z2 = (
            18.0 * float((abs(s) - 1) ** 2) / float(var18)
            if s != 0 and var18 > 0
            else None
        )
        return n, s, var18, z2, (s > 0) - (s < 0), bool(z2 and z2 > 3.8416)

    rng = random.Random(13)
    for trend in (0.0, 0.8):
        rows = [
            (float(t), t, float(rng.randrange(0, 40)) + trend * t)
            for t in range(80)
        ]
        df = spark.createDataFrame(rows, "o double, id long, v double")
        r = mann_kendall(df, "o", "v", "id").collect()[0]
        n, s, var18, z2, sign, sig = brute(rows)
        assert (r.n, r.s, r.var18, r.trend_sign) == (n, s, var18, sign)
        assert r.z2 == z2 and r.significant_95 == sig
        assert sig == (trend > 0)
    # all-constant -> S = 0, var18 = 0, NULL z2
    dfc = spark.createDataFrame(
        [(float(t), t, 5.0) for t in range(10)], "o double, id long, v double"
    )
    rc = mann_kendall(dfc, "o", "v", "id").collect()[0]
    assert rc.s == 0 and rc.var18 == 0 and rc.z2 is None
    assert not rc.significant_95


def test_gini_coefficient_vs_brute_force(spark):
    import random

    from ddsparkle.spark.dataops import gini_coefficient

    def brute(vals):
        xs = sorted(vals)
        n = len(xs)
        tot = sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        return n, float(tot), num / float(n * tot)

    rng = random.Random(3)
    # uniform-ish -> low G; heavy tail -> high G
    uni = [float(rng.randrange(90, 110)) for _ in range(300)]
    heavy = [float(rng.randrange(1, 5)) for _ in range(290)] + [
        float(rng.randrange(5000, 9000)) for _ in range(10)
    ]
    for vals, lo, hi in ((uni, 0.0, 0.1), (heavy, 0.7, 1.0)):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v double"
        )
        r = gini_coefficient(df, "v", "id").collect()[0]
        n, tot, g = brute(vals)
        assert (r.n, r.total_q) == (n, tot)
        assert abs(r.gini - g) < 1e-12 and lo <= r.gini <= hi
    # all-equal -> exactly 0; all-zero -> NULL
    dfe = spark.createDataFrame([(i, 7.0) for i in range(9)], "id long, v double")
    assert gini_coefficient(dfe, "v", "id").collect()[0].gini == 0.0
    dfz = spark.createDataFrame([(i, 0.0) for i in range(9)], "id long, v double")
    assert gini_coefficient(dfz, "v", "id").collect()[0].gini is None
