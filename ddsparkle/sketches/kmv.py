"""KMV (k-minimum-values) distinct-value sketch with set operations.

The set-operations member of the sketch family (theta-sketch style): keep
the k smallest distinct 64-bit hashes of the values seen. Union = merge the
hash sets and re-trim to k; the union sample is simultaneously a uniform
sample of BOTH inputs' distinct universes, so intersection/Jaccard estimates
fall out of membership counting (Beyer et al., "On Synopses for Distinct-
Value Estimation Under Multiset Operations", SIGMOD 2007).

Estimator: with fewer than k distinct hashes the sketch is the exact
distinct set (collision probability ~n^2/2^65). At capacity, the classic
unbiased estimate is (k-1) / U(k) where U(k) is the k-th smallest hash
mapped to (0,1]. Relative standard error ~ 1/sqrt(k-2).

Merge is associative/commutative/idempotent (set union + deterministic
trim), so it distributes on the same chassis as the other sketches. The
reference repo has no set-operation sketch; this extends the family per the
north rule (mergeable approximate aggregation library).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .hashing import hash64

__all__ = ["KMVSketch"]


@dataclass
class KMVSketch:
    k: int = 1024
    seed: int = 0
    hashes: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint64))
    # True once at least k distinct hashes were seen (estimator switch)
    saturated: bool = False

    def __post_init__(self) -> None:
        if self.k < 16:
            raise ValueError("k must be >= 16")

    def _trim(self, h: np.ndarray) -> None:
        h = np.unique(h)  # sorted + distinct
        if h.size > self.k:
            h = h[: self.k]
            self.saturated = True
        self.hashes = h

    def update(self, values) -> None:
        if len(values) == 0:
            return
        h = hash64(values, self.seed)
        if self.saturated:
            # threshold optimization: once at capacity only hashes at or
            # below the current k-th minimum can enter — skips the
            # concatenate+unique for the common all-too-large batch
            h = h[h <= self.hashes[-1]]
            if h.size == 0:
                return
        self._trim(np.concatenate([self.hashes, h]))

    def merge(self, other: "KMVSketch") -> None:
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("KMV sketches differ in (k, seed); not mergeable")
        self.saturated = self.saturated or other.saturated
        self._trim(np.concatenate([self.hashes, other.hashes]))

    # -- estimators ----------------------------------------------------------
    def distinct_estimate(self) -> float:
        if not self.saturated:
            return float(self.hashes.size)  # exact below capacity
        kth = float(self.hashes[self.k - 1]) + 1.0  # map to (0, 2^64]
        return (self.k - 1) * (2.0**64) / kth

    @property
    def relative_standard_error(self) -> float:
        return 1.0 / np.sqrt(max(self.k - 2, 1))

    def union_(self, other: "KMVSketch") -> "KMVSketch":
        out = KMVSketch(k=self.k, seed=self.seed, hashes=self.hashes.copy())
        out.saturated = self.saturated
        out.merge(other)
        return out

    def overlap_stats(self, other: "KMVSketch") -> dict:
        """One union construction -> {union, jaccard, intersection,
        a_not_b, b_not_a} (the full theta-sketch set algebra: union,
        intersect, and both A-not-B differences from ONE k-min sample).

        J(A, B) is membership counting over the union's k-min sample: every
        sample hash is <= both inputs' k-th minima (the union's k smallest
        of A∪B are bounded by either side's k-th smallest alone), so 'in A'
        is decidable exactly from A's retained set — and therefore so are
        'in A only' / 'in B only', giving the difference cardinalities from
        the same membership pass."""
        u = self.union_(other)
        if u.hashes.size == 0:
            return {
                "union": 0.0,
                "jaccard": 1.0,
                "intersection": 0.0,
                "a_not_b": 0.0,
                "b_not_a": 0.0,
            }
        in_a = np.isin(u.hashes, self.hashes, assume_unique=True)
        in_b = np.isin(u.hashes, other.hashes, assume_unique=True)
        n_both = int(np.count_nonzero(in_a & in_b))
        n_a_only = int(np.count_nonzero(in_a & ~in_b))
        n_b_only = int(np.count_nonzero(in_b & ~in_a))
        j = float(n_both / u.hashes.size)
        u_est = u.distinct_estimate()
        # (count * u_est) / size, NOT j * u_est: in the unsaturated regime
        # u_est == size exactly, so this order is integer-exact in floats
        # ((1 * 499.0) / 499 == 1.0) while (1/499) * 499 rounds to 0.999…,
        # which an integer cast would truncate to a wrong exact count
        return {
            "union": u_est,
            "jaccard": j,
            "intersection": (n_both * u_est) / u.hashes.size,
            "a_not_b": (n_a_only * u_est) / u.hashes.size,
            "b_not_a": (n_b_only * u_est) / u.hashes.size,
        }

    def jaccard(self, other: "KMVSketch") -> float:
        return self.overlap_stats(other)["jaccard"]

    def intersection_estimate(self, other: "KMVSketch") -> float:
        return self.overlap_stats(other)["intersection"]

    # -- serde ----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        # seed travels in the payload like k: hashes from different seeds
        # must never silently merge or be extended under the wrong seed
        head = struct.pack("<iqBq", self.k, self.hashes.size, int(self.saturated), self.seed)
        return head + self.hashes.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, seed: int | None = None) -> "KMVSketch":
        k, sz, sat, pseed = struct.unpack_from("<iqBq", data, 0)
        if seed is not None and seed != pseed:
            raise ValueError(f"payload was built with seed {pseed}, not {seed}")
        h = np.frombuffer(data, "<u8", sz, struct.calcsize("<iqBq")).copy()
        out = cls(k=k, seed=pseed, hashes=h)
        out.saturated = bool(sat)
        return out
