"""Bloom filter: mergeable approximate-membership set.

m bits (packed uint64), k hash probes per item via double hashing; merge =
bitwise OR (associative, commutative, idempotent). No false negatives; false
positive rate ~= (1 - e^{-kn/m})^k, optimal k = (m/n) ln 2.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .hashing import independent_hashes

__all__ = ["BloomFilter"]


@dataclass
class BloomFilter:
    n_bits: int = 1 << 20
    k: int = 7
    seed: int = 0
    bits: np.ndarray = field(default=None)

    def __post_init__(self) -> None:
        if self.n_bits < 64 or self.k < 1:
            raise ValueError("invalid Bloom parameters")
        self.n_bits = int(self.n_bits)
        n_words = (self.n_bits + 63) // 64
        if self.bits is None:
            self.bits = np.zeros(n_words, np.uint64)

    @classmethod
    def from_capacity(cls, n_items: int, fp_rate: float = 0.01, seed: int = 0) -> "BloomFilter":
        n_bits = max(64, math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / n_items * math.log(2))) if n_items else 1
        return cls(n_bits=n_bits, k=k, seed=seed)

    def _positions(self, values) -> np.ndarray:
        h = independent_hashes(values, self.k, self.seed)
        return (h % np.uint64(self.n_bits)).astype(np.int64)

    def update(self, values) -> None:
        if len(values) == 0:
            return
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership probe; True may be a false positive."""
        pos = self._positions(values)
        probed = (self.bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return probed.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> None:
        if (self.n_bits, self.k, self.seed) != (other.n_bits, other.k, other.seed):
            raise ValueError("Bloom filters differ in shape/seed; not mergeable")
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / (len(self.bits) * 64)

    # -- serde -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, k: int, seed: int = 0) -> "BloomFilter":
        bits = np.frombuffer(data, np.uint64).copy()
        return cls(n_bits=n_bits, k=k, seed=seed, bits=bits)
