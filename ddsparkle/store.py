"""Bucket stores: index -> count maps with optional bounded-memory collapse.

The reference (``/root/reference/src/main/java/com/datadoghq/sketch/ddsketch/
store/Store.java:23-27``) models a store as a collection of
``(index: int, count: double >= 0)`` bins, with four user-facing behaviors:
unbounded dense, collapsing-lowest dense, collapsing-highest dense
(``CollapsingLowestDenseStore.java``, ``CollapsingHighestDenseStore.java``),
and sparse (``SparseStore.java``). Dense vs sparse vs paginated is a JVM
memory-layout concern; the *observable* semantics (asserted by the reference's
own StoreTest model, ``CollapsingLowestDenseStoreTest.java:23-37``) are:

- unbounded / sparse: counts aggregate exactly by index;
- collapsing_lowest(max_bins): every index is clamped to
  ``max(index, global_max_index - max_bins + 1)`` where ``global_max_index``
  is the running maximum ever observed — mass collapsed into the boundary
  bucket, total count conserved;
- collapsing_highest(max_bins): mirror image, clamp to
  ``min(index, global_min_index + max_bins - 1)``.

We implement those semantics once over a sorted coordinate representation
``(indexes: int64[], counts: float64[])`` with fully vectorized batch add and
merge. This representation is what ships inside Spark sketch rows (two Arrow
arrays), handles int32-extreme indexes that a dense array cannot, and is
exactly the protobuf sparse encoding. A dense ``(offset, contiguous counts)``
view is available for the contiguous wire encodings (serde.py).

Note on a reference quirk (documented deviation): ``CollapsingLowestDenseStore
.mergeWith(Store)`` for a *foreign* store type iterates ``this`` instead of
``store`` (``CollapsingLowestDenseStore.java:95-101``) — an unobserved bug in
the reference's own tests. We implement the evidently intended semantics
(merge the other store's bins into self, as the ``Store.java:73-75`` default
does).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["BucketStore", "STORE_POLICIES"]

STORE_POLICIES = ("unbounded", "collapsing_lowest", "collapsing_highest", "sparse")

_INT32_MIN = -(2**31)
_INT32_MAX = 2**31 - 1


def _group_sum(indexes: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Aggregate duplicate indexes; returns sorted unique indexes + summed counts.

    For narrow ranges uses bincount (O(n + range)); falls back to
    sort/reduceat for wide or extreme ranges.
    """
    if indexes.size == 0:
        return indexes.astype(np.int64), counts.astype(np.float64)
    lo = int(indexes.min())
    hi = int(indexes.max())
    span = hi - lo + 1
    if span <= 4 * indexes.size + 4096:
        dense = np.bincount(indexes - lo, weights=counts, minlength=span)
        nz = np.nonzero(dense)[0]
        return (nz + lo).astype(np.int64), dense[nz]
    order = np.argsort(indexes, kind="stable")
    si = indexes[order]
    sc = counts[order]
    boundaries = np.empty(si.size, dtype=bool)
    boundaries[0] = True
    np.not_equal(si[1:], si[:-1], out=boundaries[1:])
    starts = np.nonzero(boundaries)[0]
    sums = np.add.reduceat(sc, starts)
    return si[starts].astype(np.int64), sums.astype(np.float64)


@dataclass
class BucketStore:
    """Vectorized bin store with a collapse policy.

    ``indexes`` is strictly increasing; ``counts`` strictly positive and
    aligned with ``indexes``. Both empty for an empty store.
    """

    policy: str = "unbounded"
    max_bins: int = 0  # only meaningful for collapsing_* policies
    indexes: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    counts: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))

    def __post_init__(self) -> None:
        if self.policy not in STORE_POLICIES:
            raise ValueError(f"unknown store policy {self.policy!r}")
        if self.policy.startswith("collapsing") and self.max_bins <= 0:
            raise ValueError("collapsing stores require max_bins >= 1")

    # -- mutation ----------------------------------------------------------
    def add(self, indexes, counts=None) -> None:
        """Vectorized bulk add of (index, count) pairs; scalars accepted."""
        idx = np.atleast_1d(np.asarray(indexes, np.int64))
        if counts is None:
            cnt = np.ones(idx.shape, np.float64)
        else:
            cnt = np.broadcast_to(np.asarray(counts, np.float64), idx.shape).astype(np.float64)
            if np.any(cnt < 0):
                raise ValueError("The count cannot be negative.")
        keep = cnt != 0
        if not keep.all():
            idx, cnt = idx[keep], cnt[keep]
        if idx.size == 0:
            return
        new_idx, new_cnt = _group_sum(idx, cnt)
        self._merge_pairs(new_idx, new_cnt)

    def merge(self, other: "BucketStore") -> None:
        """Merge another store's bins into self (order-insensitive result)."""
        if other.is_empty():
            return
        self._merge_pairs(other.indexes, other.counts)

    def _merge_pairs(self, new_idx: np.ndarray, new_cnt: np.ndarray) -> None:
        if self.indexes.size:
            all_idx = np.concatenate([self.indexes, new_idx])
            all_cnt = np.concatenate([self.counts, new_cnt])
        else:
            all_idx, all_cnt = new_idx, new_cnt
        all_idx = self._clamp(all_idx)
        idx, cnt = _group_sum(all_idx, all_cnt)
        nz = cnt != 0
        self.indexes, self.counts = idx[nz], cnt[nz]

    def _clamp(self, idx: np.ndarray) -> np.ndarray:
        if self.policy == "collapsing_lowest":
            hi = int(idx.max()) if self.indexes.size == 0 else max(int(idx.max()), int(self.indexes[-1]))
            bound = max(_INT32_MIN, hi - self.max_bins + 1)
            return np.maximum(idx, bound)
        if self.policy == "collapsing_highest":
            lo = int(idx.min()) if self.indexes.size == 0 else min(int(idx.min()), int(self.indexes[0]))
            bound = min(_INT32_MAX, lo + self.max_bins - 1)
            return np.minimum(idx, bound)
        return idx

    def clear(self) -> None:
        self.indexes = np.empty(0, np.int64)
        self.counts = np.empty(0, np.float64)

    # -- queries -----------------------------------------------------------
    def is_empty(self) -> bool:
        return self.indexes.size == 0

    @property
    def total_count(self) -> float:
        return float(self.counts.sum())

    @property
    def min_index(self) -> int:
        if self.is_empty():
            raise KeyError("empty store")
        return int(self.indexes[0])

    @property
    def max_index(self) -> int:
        if self.is_empty():
            raise KeyError("empty store")
        return int(self.indexes[-1])

    def as_dict(self) -> dict[int, float]:
        return {int(i): float(c) for i, c in zip(self.indexes, self.counts)}

    def copy(self) -> "BucketStore":
        return BucketStore(
            self.policy, self.max_bins, self.indexes.copy(), self.counts.copy()
        )

    # -- dense view (for contiguous wire encodings) ------------------------
    def to_dense(self) -> tuple[int, np.ndarray]:
        """(offset, contiguous counts[min_index..max_index]) — empty -> (0, [])."""
        if self.is_empty():
            return 0, np.empty(0, np.float64)
        lo, hi = self.min_index, self.max_index
        dense = np.zeros(hi - lo + 1, np.float64)
        dense[self.indexes - lo] = self.counts
        return lo, dense

    @classmethod
    def from_dense(
        cls, policy: str, max_bins: int, offset: int, dense: np.ndarray
    ) -> "BucketStore":
        dense = np.asarray(dense, np.float64)
        nz = np.nonzero(dense)[0]
        store = cls(policy, max_bins)
        if nz.size:
            # go through add() so collapsing policies clamp immediately
            store.add((nz + offset).astype(np.int64), dense[nz])
        return store
