"""Count-min sketch: mergeable frequency estimator.

depth x width counter matrix; item routed to one counter per row by
independent hashes; point query = min over rows (always an overestimate;
error <= eps*N with prob 1-delta for width=ceil(e/eps), depth=ceil(ln 1/d)).
Merge = elementwise add (associative, commutative). Weighted updates
supported (non-negative, like DDSketch counts).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .hashing import independent_hashes

__all__ = ["CountMinSketch"]


@dataclass
class CountMinSketch:
    depth: int = 5
    width: int = 2048
    seed: int = 0
    counts: np.ndarray = field(default=None)
    total: float = 0.0

    def __post_init__(self) -> None:
        if self.depth < 1 or self.width < 8:
            raise ValueError("invalid CMS dimensions")
        if self.counts is None:
            self.counts = np.zeros((self.depth, self.width), np.float64)

    @classmethod
    def from_error_bounds(cls, eps: float, delta: float, seed: int = 0) -> "CountMinSketch":
        return cls(
            depth=max(1, math.ceil(math.log(1.0 / delta))),
            width=max(8, math.ceil(math.e / eps)),
            seed=seed,
        )

    def _cols(self, values) -> np.ndarray:
        h = independent_hashes(values, self.depth, self.seed)
        return (h % np.uint64(self.width)).astype(np.int64)

    def update(self, values, weights=None) -> None:
        if len(values) == 0:
            return
        w = np.ones(len(values)) if weights is None else np.asarray(weights, np.float64)
        if np.any(w < 0):
            raise ValueError("The count cannot be negative.")
        cols = self._cols(values)
        for r in range(self.depth):
            np.add.at(self.counts[r], cols[r], w)
        self.total += float(w.sum())

    def merge(self, other: "CountMinSketch") -> None:
        if (self.depth, self.width, self.seed) != (other.depth, other.width, other.seed):
            raise ValueError("CMS sketches differ in shape/seed; not mergeable")
        self.counts += other.counts
        self.total += other.total

    def query(self, values) -> np.ndarray:
        """Estimated frequency of each probe value (vectorized min over rows)."""
        cols = self._cols(values)
        ests = np.stack([self.counts[r][cols[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    # -- serde -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(
        cls, data: bytes, depth: int, width: int, seed: int = 0, total: float = 0.0
    ) -> "CountMinSketch":
        counts = np.frombuffer(data, np.float64).reshape(depth, width).copy()
        return cls(depth=depth, width=width, seed=seed, counts=counts, total=total)
