"""Deterministic vectorized 64-bit hashing for sketch inputs.

All sketch hashes must be identical across Python processes, executors and
runs (no PYTHONHASHSEED dependence): integers go through a splitmix64 finalize
(public-domain constant set), everything else through pandas'
``hash_pandas_object`` (vectorized murmur-based hashing with an explicit,
fixed hash key) followed by the same finalize. Seeds derive independent hash
functions for multi-hash sketches (CMS rows, Bloom probes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["hash64", "independent_hashes"]

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer; numpy uint64 arithmetic wraps mod 2^64
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x ^= x >> _U64(30)
    x = (x * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
    x ^= x >> _U64(27)
    x = (x * _U64(0x94D049BB133111EB)).astype(_U64)
    x ^= x >> _U64(31)
    return x


def hash64(values, seed: int = 0) -> np.ndarray:
    """uint64 hash of a 1-D array-like; deterministic across processes.

    Numeric canonicalization: float64 values that are exactly integral hash
    identically to the same integers. This matters because Arrow delivers an
    int64 column as float64 whenever a batch contains a null — without
    canonicalization the same id would hash two different ways across
    batches (double-counted by HLL, false negatives from Bloom). -0.0 is
    canonicalized to 0.0 (equal values must hash equally).
    """
    if isinstance(values, pd.Series):
        s = values
    else:
        s = pd.Series(np.asarray(values))
    if s.dtype.kind in "iu":
        base = s.to_numpy().astype(_U64)
    elif s.dtype.kind == "f":
        arr = s.to_numpy(np.float64) + 0.0  # -0.0 -> 0.0
        integral = (arr == np.floor(arr)) & (np.abs(arr) < 2**63)
        as_int = np.zeros(arr.shape, np.int64)
        as_int[integral] = arr[integral].astype(np.int64)
        base = np.where(integral, as_int.view(np.uint64), arr.view(np.uint64))
    else:
        # fixed 16-byte key -> stable across processes
        base = pd.util.hash_pandas_object(s, index=False, hash_key="ddsparkle-hash!!").to_numpy()
    return _splitmix64(base ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))


def independent_hashes(values, n: int, base_seed: int = 0) -> np.ndarray:
    """(n, len(values)) matrix of independent uint64 hashes via double
    hashing: h_i = h1 + i*h2 (Kirsch-Mitzenmacher), two real hash passes."""
    h1 = hash64(values, base_seed)
    h2 = hash64(values, base_seed ^ 0x5BD1E995) | _U64(1)  # odd, so strides cover
    i = np.arange(n, dtype=_U64).reshape(-1, 1)
    return (h1.reshape(1, -1) + i * h2.reshape(1, -1)).astype(_U64)
