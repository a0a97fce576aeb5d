"""t-digest: mergeable quantile sketch with tail-accurate rank error.

Merging-style t-digest (Dunning) with a fully vectorized compression pass:
centroids are sorted by mean and assigned to clusters by the arcsine scale
function k(q) = delta * (asin(2q-1)/pi + 1/2) evaluated at each centroid's
mid-quantile — cluster id = floor(k). This keeps cluster weights within the
scale-function bound (small near q=0/1, larger mid-distribution) without the
sequential greedy pass, so ingesting a 64k-row Arrow batch is a sort +
cumsum + group-sum. min/max are tracked exactly and quantile interpolation
is linear between centroid means.

Rank error: ~O(1/delta) mid-distribution, asymptotically better toward the
tails (the property that distinguishes t-digest from KLL).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["TDigest"]


@dataclass
class TDigest:
    delta: float = 200.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    n: float = 0.0
    min: float = math.inf
    max: float = -math.inf

    def __post_init__(self) -> None:
        if self.delta < 20:
            raise ValueError("delta must be >= 20")

    # -- ingestion -----------------------------------------------------------
    def update(self, values, weights=None) -> None:
        v = np.asarray(values, np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        if v.size == 0:
            return
        w = (
            np.ones(v.size)
            if weights is None
            else np.asarray(weights, np.float64)[keep]
        )
        if np.any(w < 0):
            raise ValueError("The count cannot be negative.")
        nz = w > 0
        v, w = v[nz], w[nz]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, w])
        self.n += float(w.sum())
        self._compress()

    def merge(self, other: "TDigest") -> None:
        if self.delta != other.delta:
            raise ValueError("t-digests differ in delta; not mergeable")
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()

    def _compress(self) -> None:
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        if total <= 0:
            self.means = np.empty(0)
            self.weights = np.empty(0)
            return
        q_mid = (np.cumsum(w) - w / 2.0) / total
        k = self.delta * (np.arcsin(2.0 * q_mid - 1.0) / math.pi + 0.5)
        cluster = np.floor(k).astype(np.int64)
        # group-sum weights and weighted means per cluster
        uniq, inv = np.unique(cluster, return_inverse=True)
        cw = np.bincount(inv, weights=w)
        cm = np.bincount(inv, weights=w * m) / cw
        self.means, self.weights = cm, cw

    # -- queries --------------------------------------------------------------
    def values_at_quantiles(self, quantiles) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(quantiles, np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("The quantile must be between 0 and 1.")
        if self.means.size == 0:
            raise LookupError("The sketch is empty.")
        m, w = self.means, self.weights
        cum = np.cumsum(w) - w / 2.0  # centroid centers in rank space
        targets = qs * self.n
        idx = np.searchsorted(cum, targets)
        out = np.empty(qs.size)
        for i, (t, j) in enumerate(zip(targets, idx)):
            if j == 0:
                lo_r, lo_v = 0.0, self.min
                hi_r, hi_v = cum[0], m[0]
            elif j >= m.size:
                lo_r, lo_v = cum[-1], m[-1]
                hi_r, hi_v = self.n, self.max
            else:
                lo_r, lo_v = cum[j - 1], m[j - 1]
                hi_r, hi_v = cum[j], m[j]
            if hi_r == lo_r:
                out[i] = hi_v
            else:
                frac = (t - lo_r) / (hi_r - lo_r)
                out[i] = lo_v + frac * (hi_v - lo_v)
        return np.clip(out, self.min, self.max)

    def value_at_quantile(self, q: float) -> float:
        return float(self.values_at_quantiles([q])[0])

    @property
    def n_centroids(self) -> int:
        return int(self.means.size)

    # -- serde -----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack("<diddd", self.delta, self.means.size, self.n, self.min, self.max)
        out += self.means.astype("<f8").tobytes()
        out += self.weights.astype("<f8").tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, sz, n, mn, mx = struct.unpack_from("<diddd", data, 0)
        pos = struct.calcsize("<diddd")
        means = np.frombuffer(data, "<f8", sz, pos).copy()
        weights = np.frombuffer(data, "<f8", sz, pos + 8 * sz).copy()
        td = cls(delta=delta, means=means, weights=weights, n=n)
        td.min, td.max = mn, mx
        return td
