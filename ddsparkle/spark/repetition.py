"""Gopher/MassiveText-style intra-document repetition signals.

The published repetition filters (Rae et al. 2021, table A1) drop documents
whose text is dominated by repeated n-grams. This module computes the two
signal families over the single-space tokenization:

- ``top_{n}gram_frac`` (n = 2, 3, 4 by default): the fraction of TOKEN
  POSITIONS covered by occurrences of the single most frequent word n-gram
  (computed whether or not it repeats — a unique modal n-gram contributes
  the small floor n / n_tokens, exactly like the published fraction).
- ``dup_{n}gram_frac`` (n = 5..10 by default): the fraction of token
  positions covered by ANY n-gram occurring at least twice, overlapping
  occurrences counted ONCE (interval union via a difference array).

Cross-engine-exact contract (the quality_model.py discipline): n-gram
IDENTITY is the portable 60-bit md5 of the space-joined n-gram — Spark
groups on ``int(md5(g)[:15 hex], 16)`` and the DuckDB twin on ``('0x' ||
substr(md5(g),1,15))::BIGINT``, so even a hash collision (odds ~k^2/2^61
per document) merges the same two grams in both engines. Modal ties break
to the MINIMUM key. Each fraction is one integer/integer double division,
so values are IEEE-bit-equal across engines and the driver gate hash-matches
them end-to-end.

Execution shape: one Arrow-batched ``mapInPandas`` pass (the
``_batch_shingle_hashes`` / model-scorer chassis — a per-token Catalyst HOF
measured 13x slower on long documents, BENCH/AB_r04.md), row-local with all
input columns passed through, zero shuffle; per-row cost is
O(n_tokens * sum(ns)) string joins + one ``np.unique`` per (doc, n). NULL
text yields NULL signals. Beyond-reference, brief-driven (the reference has
no text surface).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .quality_model import _md5_bucket

__all__ = ["repetition_signals", "DEFAULT_TOP_NS", "DEFAULT_DUP_NS"]

DEFAULT_TOP_NS = (2, 3, 4)
DEFAULT_DUP_NS = (5, 6, 7, 8, 9, 10)

_KEY_SPACE = 1 << 60  # md5-60bit values are already < 2^60: mod is identity


def _coverage(idx: np.ndarray, n: int, n_tokens: int) -> int:
    """Token positions covered by the n-gram occurrences starting at
    ``idx`` (0-based), overlaps counted once: difference array + cumsum."""
    delta = np.zeros(n_tokens + 1, np.int64)
    np.add.at(delta, idx, 1)
    np.add.at(delta, idx + n, -1)
    return int((np.cumsum(delta[:n_tokens]) > 0).sum())


def _doc_signals(text: str, top_ns, dup_ns, cache: bool) -> dict:
    toks = text.split(" ")
    n_tokens = len(toks)
    out = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        want_top, want_dup = n in top_ns, n in dup_ns
        if n_tokens < n:
            if want_top:
                out[f"top_{n}gram_frac"] = 0.0
            if want_dup:
                out[f"dup_{n}gram_frac"] = 0.0
            continue
        grams = np.array(
            [" ".join(toks[i : i + n]) for i in range(n_tokens - n + 1)], object
        )
        uniq, inv = np.unique(grams, return_inverse=True)
        keys = _md5_bucket(uniq, _KEY_SPACE, use_cache=cache)
        # re-group by KEY (not string): a 60-bit collision must merge grams
        # exactly as the SQL twin's key grouping does
        ukeys, kinv, kcnt = np.unique(
            keys[inv], return_inverse=True, return_counts=True
        )
        if want_top:
            maxc = kcnt.max()
            modal = ukeys[kcnt == maxc].min()  # tie -> minimum key
            idx = np.flatnonzero(keys[inv] == modal)
            out[f"top_{n}gram_frac"] = _coverage(idx, n, n_tokens) / n_tokens
        if want_dup:
            idx = np.flatnonzero(kcnt[kinv] >= 2)
            out[f"dup_{n}gram_frac"] = _coverage(idx, n, n_tokens) / n_tokens
    return out


def repetition_signals(
    df,
    text_col: str = "text",
    top_ns: Sequence[int] = DEFAULT_TOP_NS,
    dup_ns: Sequence[int] = DEFAULT_DUP_NS,
    cache_keys: bool = True,
):
    """Append the Gopher repetition-signal columns (module docstring) to
    ``df``, row-locally — all input columns pass through, so curation
    pipelines filter on the fractions with no join. Columns:
    ``top_{n}gram_frac`` for each n in ``top_ns``, ``dup_{n}gram_frac`` for
    each n in ``dup_ns`` (all double, NULL for NULL text).

    ``cache_keys`` reuses the model scorer's cross-batch gram->key memo
    (identical values with it on or off — speed only; repetition-heavy
    corpora hit it hard since repeated grams are the signal)."""
    from pyspark.sql import types as T

    from .dataops import _ensure_parallelism

    top_ns = tuple(int(n) for n in top_ns)
    dup_ns = tuple(int(n) for n in dup_ns)
    if any(n < 1 for n in (*top_ns, *dup_ns)):
        raise ValueError("n-gram sizes must be >= 1")
    cols = [f"top_{n}gram_frac" for n in top_ns] + [
        f"dup_{n}gram_frac" for n in dup_ns
    ]
    schema = T.StructType(
        list(df.schema) + [T.StructField(c, T.DoubleType()) for c in cols]
    )

    def compute(batches):
        for pdf in batches:
            sig = {c: np.full(len(pdf), np.nan) for c in cols}
            for j, t in enumerate(pdf[text_col]):
                if t is None:
                    continue
                for c, v in _doc_signals(t, top_ns, dup_ns, cache_keys).items():
                    sig[c][j] = v
            out = pdf.copy()
            for c in cols:
                out[c] = pd.Series(sig[c]).where(~np.isnan(sig[c]), None)
            yield out

    return _ensure_parallelism(df).mapInPandas(compute, schema=schema)
