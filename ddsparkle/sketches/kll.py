"""KLL sketch: mergeable rank-error quantile sketch (Karnin-Lang-Liberty).

Complements DDSketch in the family: KLL bounds *rank* error (|est_rank -
true_rank| <= eps*n with eps ~ O(1/k)), whereas DDSketch bounds *value*
relative error. Standard compactor hierarchy: level h holds items of weight
2^h; when total size exceeds capacity, the lowest over-capacity level is
sorted and every other item is promoted to level h+1.

Determinism: the compaction offset alternates deterministically (per-level
toggle seeded by the level's compaction count) instead of using a random
bit, so a given update/merge sequence is exactly reproducible. The classic
probabilistic guarantee assumes random offsets; the deterministic variant is
standard practice for reproducible pipelines and is validated against exact
ranks in tests. Merge concatenates levels then re-compacts, so results are
merge-order-dependent within the eps bound (like every KLL implementation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["KLLSketch"]


def _capacity(k: int, depth_from_top: int) -> int:
    # level capacities shrink geometrically (ratio ~2/3) from the top
    return max(2, int(np.ceil(k * (2.0 / 3.0) ** depth_from_top)))


@dataclass
class KLLSketch:
    k: int = 200
    levels: list = field(default_factory=list)  # list[np.ndarray], level h weight 2^h
    n: float = 0.0
    _compaction_count: int = 0

    def __post_init__(self) -> None:
        if self.k < 8:
            raise ValueError("k must be >= 8")
        if not self.levels:
            self.levels = [np.empty(0, np.float64)]

    # -- update --------------------------------------------------------------
    def update(self, values) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += v.size
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        if self.k != other.k:
            raise ValueError("KLL sketches differ in k; not mergeable")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, arr in enumerate(other.levels):
            if arr.size:
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self._compress()

    def _total_capacity(self) -> int:
        H = len(self.levels)
        return sum(_capacity(self.k, H - 1 - h) for h in range(H))

    def _compress(self) -> None:
        while sum(a.size for a in self.levels) > self._total_capacity():
            H = len(self.levels)
            for h in range(H):
                cap = _capacity(self.k, H - 1 - h)
                if self.levels[h].size > cap:
                    arr = np.sort(self.levels[h])
                    offset = self._compaction_count & 1
                    self._compaction_count += 1
                    # weight conservation: an odd level keeps one unpaired
                    # item at this level (standard KLL); pairs promote at
                    # double weight, so total item mass is exactly preserved
                    if arr.size % 2 == 1:
                        if offset:
                            leftover, body = arr[-1:], arr[:-1]
                        else:
                            leftover, body = arr[:1], arr[1:]
                    else:
                        leftover, body = np.empty(0, np.float64), arr
                    promoted = body[offset::2]
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    self.levels[h] = leftover
                    break
            else:
                # every level within capacity but total above: grow hierarchy
                self.levels.append(np.empty(0, np.float64))

    # -- queries ---------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, float(1 << h)))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def values_at_quantiles(self, quantiles) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(quantiles, np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("The quantile must be between 0 and 1.")
        items, weights = self._weighted_items()
        if items.size == 0:
            raise LookupError("The sketch is empty.")
        cum = np.cumsum(weights)
        total = cum[-1]
        ranks = qs * (total - 1)
        pos = np.minimum(np.searchsorted(cum, ranks, side="right"), items.size - 1)
        return items[pos]

    def value_at_quantile(self, q: float) -> float:
        return float(self.values_at_quantiles([q])[0])

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        items, weights = self._weighted_items()
        if items.size == 0:
            raise LookupError("The sketch is empty.")
        idx = np.searchsorted(items, value, side="right")
        return float(weights[:idx].sum() / weights.sum())

    @property
    def size(self) -> int:
        return int(sum(a.size for a in self.levels))

    # -- serde -----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack("<iid", self.k, len(self.levels), self.n)
        out += struct.pack("<i", self._compaction_count)
        for arr in self.levels:
            out += struct.pack("<i", arr.size)
            out += arr.astype("<f8").tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        k, n_levels, n = struct.unpack_from("<iid", data, 0)
        (cc,) = struct.unpack_from("<i", data, 16)
        pos = 20
        levels = []
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<i", data, pos)
            pos += 4
            levels.append(np.frombuffer(data, "<f8", sz, pos).copy())
            pos += 8 * sz
        sk = cls(k=k, levels=levels, n=n)
        sk._compaction_count = cc
        return sk
