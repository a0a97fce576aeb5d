"""Gopher repetition signals: parity against a from-scratch pure-Python
reference of the documented contract (md5-key identity, min-key tie break,
interval-union coverage), plus the NULL/short-text edges."""

import hashlib

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def _ref_signals(text, top_ns, dup_ns):
    toks = text.split(" ")
    T = len(toks)
    out = {}

    def key(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    for n in sorted(set(top_ns) | set(dup_ns)):
        if T < n:
            if n in top_ns:
                out[f"top_{n}gram_frac"] = 0.0
            if n in dup_ns:
                out[f"dup_{n}gram_frac"] = 0.0
            continue
        ks = [key(" ".join(toks[i : i + n])) for i in range(T - n + 1)]
        from collections import Counter

        cnt = Counter(ks)

        def cover(idxs):
            covered = set()
            for i in idxs:
                covered.update(range(i, i + n))
            return len(covered) / T

        if n in top_ns:
            maxc = max(cnt.values())
            modal = min(k for k, c in cnt.items() if c == maxc)
            out[f"top_{n}gram_frac"] = cover(
                [i for i, k in enumerate(ks) if k == modal]
            )
        if n in dup_ns:
            out[f"dup_{n}gram_frac"] = cover(
                [i for i, k in enumerate(ks) if cnt[k] >= 2]
            )
    return out


def test_repetition_signals_reference_parity(spark):
    from ddsparkle.spark.repetition import repetition_signals

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spam spam spam spam spam spam spam spam",
        "buy cheap pills now buy cheap pills now buy cheap pills now tail",
        "a b a b a b c d e f g h",
        "one two",          # shorter than every dup n
        "solo",             # single token: shorter than every n
        "",                 # one empty token
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    rows = {r["id"]: r.asDict() for r in repetition_signals(df).collect()}
    for i, t in enumerate(texts):
        r = rows[i]
        if t is None:
            assert all(
                r[c] is None
                for c in r
                if c.endswith("gram_frac")
            )
            continue
        want = _ref_signals(t, top_ns, dup_ns)
        for c, v in want.items():
            assert r[c] == pytest.approx(v, abs=0), (i, c)
    # hand-pinned values: 8x 'spam' -> every 5..8-gram duplicated fully
    assert rows[1]["dup_5gram_frac"] == 1.0
    assert rows[1]["top_2gram_frac"] == 1.0
    # unique modal n-gram floor: n / n_tokens
    assert rows[0]["top_3gram_frac"] == pytest.approx(3 / 9)
    # cache off must give identical values
    nocache = {
        r["id"]: r.asDict()
        for r in repetition_signals(df, cache_keys=False).collect()
    }
    assert nocache == rows


def test_repetition_signals_bad_n(spark):
    from ddsparkle.spark.repetition import repetition_signals

    df = spark.createDataFrame([(0, "x")], "id long, text string")
    with pytest.raises(ValueError):
        repetition_signals(df, top_ns=(0,))


def test_curate_repetition_stage_accounting(spark):
    """repetition_thresholds adds a filter-shaped stage between the Catalyst
    gates and the model stage: counts reconcile, only the named n values
    are computed, survivors are exactly the docs under every threshold, and
    unknown signal names raise."""
    from pyspark.sql import functions as F

    from ddsparkle.spark.dataprep import curate
    from ddsparkle.spark.repetition import repetition_signals

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} doc {i} " + ("spam " * 12 if i % 4 == 0 else "") + "end")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    thresholds = {"dup_5gram_frac": 0.2, "top_2gram_frac": 0.5}
    curated, stats = curate(
        docs, min_tokens=3, repetition_thresholds=thresholds
    )
    assert curated.columns == docs.columns
    assert stats["after_repetition"] <= stats["after_quality_language"]
    assert (
        stats["dropped_repetition"]
        == stats["after_quality_language"] - stats["after_repetition"]
    )
    assert curated.count() == stats["after_repetition"]
    # survivors re-scored: every signal under its threshold
    sig = repetition_signals(curated, top_ns=(2,), dup_ns=(5,))
    assert sig.filter(
        (F.col("dup_5gram_frac") > 0.2) | (F.col("top_2gram_frac") > 0.5)
    ).count() == 0
    # the spam docs were really dropped by this stage
    assert stats["dropped_repetition"] > 0
    # without the flag the stage keys are absent
    _, base_stats = curate(docs, min_tokens=3)
    assert "after_repetition" not in base_stats
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate(docs, repetition_thresholds={"nope_frac": 0.5})
