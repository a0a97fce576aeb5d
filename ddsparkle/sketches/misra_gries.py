"""Misra-Gries summary: deterministic mergeable heavy-hitters sketch.

k counters; every item with true frequency > n/k is guaranteed present, and
each reported count underestimates by at most n/k. Merge = counter union
followed by subtracting the (k+1)-th largest count (Agarwal et al.'s
mergeable-summaries construction) — associative within the error bound and
fully deterministic (no hashing, no randomness).

The batch update is vectorized: value-count the batch (pandas/np), add to the
counter dict, then decrement-prune to k counters in one pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

__all__ = ["MisraGries"]


@dataclass
class MisraGries:
    k: int = 64
    counters: dict = field(default_factory=dict)
    n: float = 0.0
    offset: float = 0.0  # total decremented mass (for the error bound)

    def __post_init__(self) -> None:
        if self.k < 1:
            raise ValueError("k must be >= 1")

    def _prune(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.sort(np.fromiter(self.counters.values(), np.float64))
        # subtract the (k+1)-th largest count from everything; drop <= 0
        dec = counts[-(self.k + 1)]
        self.offset += dec
        self.counters = {
            key: c - dec for key, c in self.counters.items() if c - dec > 0
        }

    def update(self, values, weights=None) -> None:
        s = pd.Series(values)
        if weights is None:
            vc = s.value_counts()
        else:
            w = np.asarray(weights, np.float64)
            if np.any(w < 0):
                raise ValueError("The count cannot be negative.")
            vc = pd.Series(w).groupby(s.to_numpy()).sum()
        for key, c in vc.items():
            self.counters[key] = self.counters.get(key, 0.0) + float(c)
        self.n += float(vc.sum())
        self._prune()

    def merge(self, other: "MisraGries") -> None:
        if self.k != other.k:
            raise ValueError("Misra-Gries summaries differ in k; not mergeable")
        for key, c in other.counters.items():
            self.counters[key] = self.counters.get(key, 0.0) + c
        self.n += other.n
        self.offset += other.offset
        self._prune()

    @property
    def error_bound(self) -> float:
        """Max underestimation of any reported count (= decremented mass,
        itself <= n/(k+1))."""
        return self.offset

    def candidates(self) -> list:
        """Every item with true frequency > error_bound is guaranteed here;
        reported counts are within [true - error_bound, true]."""
        return sorted(self.counters.items(), key=lambda kv: -kv[1])

    # -- serde -----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.counters, self.n, self.offset), protocol=4)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        import pickle

        k, counters, n, offset = pickle.loads(data)
        mg = cls(k=k, counters=counters, n=n)
        mg.offset = offset
        return mg
