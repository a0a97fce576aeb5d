"""Mergeable uniform reservoir sample.

The at-scale accuracy-check companion: the north-star contract ("every
quantile within alpha of exact values on held-out samples") needs a uniform
sample at 10^12 rows, where exact sorting is impossible. A reservoir of size
m per task merges pairwise by drawing each slot from either side with
probability proportional to the rows each side has seen — the merged
reservoir is a uniform sample of the union.

Randomness is deterministic given (seed, item-arrival order): reruns on the
same partition layout reproduce the same sample; different layouts give a
different but equally-uniform sample (inherent to sampling, documented).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["ReservoirSample"]


@dataclass
class ReservoirSample:
    m: int = 10_000
    seed: int = 0
    items: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    n_seen: float = 0.0

    def __post_init__(self) -> None:
        if self.m < 1:
            raise ValueError("m must be >= 1")
        self._rng = np.random.default_rng(self.seed ^ 0x5EED)

    def update(self, values) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        if self.items.size < self.m:
            take = min(self.m - self.items.size, v.size)
            self.items = np.concatenate([self.items, v[:take]])
            self.n_seen += take
            v = v[take:]
        if v.size:
            # vectorized reservoir step: item i (global index n_seen + i)
            # replaces a random slot with prob m / (global index + 1)
            idx = self.n_seen + np.arange(1, v.size + 1)
            accept = self._rng.random(v.size) < self.m / idx
            slots = self._rng.integers(0, self.m, v.size)
            sel = np.nonzero(accept)[0]
            # later acceptances must win: assign in order
            self.items[slots[sel]] = v[sel]
            self.n_seen += v.size

    def merge(self, other: "ReservoirSample") -> None:
        """Unbiased merge: the number of output slots drawn from self follows
        Hypergeometric(total=nA+nB, good=nA, draws=k) — the exact law of how
        many of a uniform k-subset of the union fall on self's side — then
        items are drawn uniformly without replacement from each reservoir.
        (A fixed per-slot Bernoulli(nA/total) biases joint inclusion
        probabilities.)"""
        if self.m != other.m:
            raise ValueError("reservoirs differ in m; not mergeable")
        if other.n_seen == 0:
            return
        if self.n_seen == 0:
            self.items = other.items.copy()
            self.n_seen = other.n_seen
            return
        total = self.n_seen + other.n_seen
        k = min(self.m, int(min(self.n_seen, self.m) + min(other.n_seen, other.m)))
        k_self = int(
            self._rng.hypergeometric(int(self.n_seen), int(other.n_seen), k)
        )
        # clip to what each reservoir actually holds (only binds when a
        # reservoir is not yet full, where it matches the exact law anyway)
        k_self = min(k_self, self.items.size)
        k_other = min(k - k_self, other.items.size)
        k_self = k - k_other if k_self + k_other < k else k_self
        a = self._rng.permutation(self.items)[:k_self]
        b = self._rng.permutation(other.items)[:k_other]
        self.items = np.concatenate([a, b])
        self.n_seen = total

    def to_bytes(self) -> bytes:
        import struct

        return struct.pack("<iqd", self.m, self.items.size, self.n_seen) + self.items.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, seed: int = 0) -> "ReservoirSample":
        import struct

        m, sz, n_seen = struct.unpack_from("<iqd", data, 0)
        items = np.frombuffer(data, "<f8", sz, struct.calcsize("<iqd")).copy()
        rs = cls(m=m, seed=seed, items=items, n_seen=n_seen)
        return rs
