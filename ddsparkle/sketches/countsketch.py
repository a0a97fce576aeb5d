"""Count-Sketch: sign-unbiased point-frequency estimation.

The point-query member of the sketch family (Charikar, Chen &
Farach-Colton, "Finding Frequent Items in Data Streams", ICALP 2002),
complementing the Count-Min sketch: CMS point estimates are biased UP
(every collision adds), while Count-Sketch multiplies each update by a
+/-1 sign hash so collisions cancel in expectation — ``E[est] = f_key``
exactly, ``Var <= F2 / width`` per row, and the median over an odd
``depth`` of independent rows amplifies the per-row Chebyshev bound to
exponentially-high confidence. At the 10^12-turn design point this is the
"how frequent is THIS key" probe (turns of one conversation, occurrences
of one boilerplate line) answered from KB-scale mergeable state with no
groupBy and no raw-row exchange.

Everything is INTEGER end-to-end (the repo's hash-gate rule — a SQL
engine replays the sketch bit-for-bit, see the
``transcripts_conv_freq_countsketch`` gate twin):

- sign hash per row j: parity of a degree-3 Horner polynomial over the
  Mersenne field p = 2^61 - 1 on the 60-bit portable md5 key — the same
  four-wise family as :mod:`.ams`, with coefficients md5 pulls of
  ``"csk:{seed}:{j}:s{i}"`` so any engine rederives the table;
- bucket hash per row j: the pairwise ``((b1 * x + b0) mod p) mod width``
  with coefficients from ``"csk:{seed}:{j}:b{i}"``;
- counters: (depth, width) int64; merge = matrix addition (associative,
  commutative, mapping equality enforced like every family member);
- point estimate: ``median_j(sign_j(x) * C[j, bucket_j(x)])`` — depth is
  enforced ODD so the median is an order statistic, an exact integer.

The reference repo has no point-frequency sketch (its CMS-adjacent store
collapse is a quantile-store policy, not a frequency sketch); this extends
the family per the north rule, reusing the ``kmv.py``/``ams.py`` chassis
conventions.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field

import numpy as np

from .ams import _fold, _modmul, _signs

__all__ = ["CountSketch", "countsketch_coefficients"]

_U64 = np.uint64


def countsketch_coefficients(depth: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """((4, depth) sign coeffs, (2, depth) bucket coeffs), every entry the
    portable 60-bit md5 of ``"csk:{seed}:{j}:s{i}"`` / ``"csk:{seed}:{j}:b{i}"``
    — rederivable verbatim by DuckDB/Spark SQL (row i = degree-i
    coefficient, the convention pinned against an independent derivation
    after the :mod:`.ams` ``_signs`` permutation incident)."""
    sgn = np.empty((4, depth), _U64)
    bkt = np.empty((2, depth), _U64)
    for j in range(depth):
        for i in range(4):
            h = hashlib.md5(f"csk:{seed}:{j}:s{i}".encode()).hexdigest()[:15]
            sgn[i, j] = int(h, 16)
        for i in range(2):
            h = hashlib.md5(f"csk:{seed}:{j}:b{i}".encode()).hexdigest()[:15]
            bkt[i, j] = int(h, 16)
    return sgn, bkt


def _buckets(keys: np.ndarray, bkt_coeffs: np.ndarray, width: int) -> np.ndarray:
    """(depth, n_keys) int64 bucket indices: ((b1*x + b0) mod p) mod width
    per (row, key); canonical residue before the width reduction so the
    SQL twin's ``((b1*x % p + b0) % p) % width`` matches exactly."""
    x = keys.astype(_U64).reshape(1, -1)
    b0 = bkt_coeffs[0].reshape(-1, 1)
    b1 = bkt_coeffs[1].reshape(-1, 1)
    h = _fold(_modmul(b1, x) + b0)  # modmul < p < 2^61, b0 < 2^60: sum < 2^62
    return (h % _U64(width)).astype(np.int64)


@dataclass
class CountSketch:
    """Count-Sketch over 60-bit integer keys (< 2^60)."""

    depth: int = 7
    width: int = 64
    seed: int = 0
    counters: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))

    def __post_init__(self) -> None:
        if self.depth < 1 or self.depth % 2 == 0:
            raise ValueError("depth must be a positive ODD integer (integer median)")
        if self.width < 2:
            raise ValueError("width must be >= 2")
        if self.counters.size == 0:
            self.counters = np.zeros((self.depth, self.width), np.int64)
        elif self.counters.shape != (self.depth, self.width):
            self.counters = self.counters.reshape(self.depth, self.width)
        self._sgn_coeffs, self._bkt_coeffs = countsketch_coefficients(
            self.depth, self.seed
        )

    def _hashes(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if np.any(keys < 0) or np.any(keys >= (1 << 60)):
            raise ValueError(
                "Count-Sketch keys must lie in [0, 2^60) (portable md5-60bit)"
            )
        return (
            _signs(keys, self._sgn_coeffs),
            _buckets(keys, self._bkt_coeffs, self.width),
        )

    def update(self, keys, counts=None) -> None:
        """Add ``counts[i]`` (default 1) occurrences of each 60-bit key;
        the batch pre-aggregates to distinct keys first (one hash column
        per distinct key, not per row — Zipfian batches amortize)."""
        keys = np.asarray(keys, np.int64)
        if keys.size == 0:
            return
        if counts is None:
            uk, inv_counts = np.unique(keys, return_counts=True)
            w = inv_counts.astype(np.int64)
        else:
            counts = np.asarray(counts, np.int64)
            uk, inv = np.unique(keys, return_inverse=True)
            w = np.zeros(uk.size, np.int64)
            np.add.at(w, inv, counts)
        signs, buckets = self._hashes(uk)
        for j in range(self.depth):
            np.add.at(self.counters[j], buckets[j], signs[j] * w)

    def merge(self, other: "CountSketch") -> None:
        if (self.depth, self.width, self.seed) != (
            other.depth,
            other.width,
            other.seed,
        ):
            raise ValueError(
                "Count-Sketches differ in (depth, width, seed); not mergeable"
            )
        self.counters = self.counters + other.counters

    # -- estimators ----------------------------------------------------------
    def estimate(self, key: int) -> int:
        """Point-frequency estimate: median over rows of
        ``sign_j(key) * C[j, bucket_j(key)]`` — an exact integer (odd
        depth), unbiased per row, |est - f| <= 4*sqrt(F2/width) with
        failure probability <= C(d, ceil(d/2)) / 16^ceil(d/2)."""
        return int(np.asarray(self.estimates(np.asarray([key], np.int64)))[0])

    def estimates(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized :meth:`estimate` over an int64 key array."""
        keys = np.asarray(keys, np.int64)
        if keys.size == 0:
            return np.empty(0, np.int64)
        signs, buckets = self._hashes(keys)
        per_row = signs * np.take_along_axis(
            self.counters, buckets, axis=1
        )  # (depth, n)
        # odd-depth median is an order statistic: partition in int64 and
        # take the middle row (np.median would round-trip through float64,
        # losing exactness above 2^53 — counters can reach that at 10^12)
        mid = self.depth // 2
        return np.partition(per_row, mid, axis=0)[mid]

    # -- serialization (counters as raw int64, like the other family members)
    def to_bytes(self) -> bytes:
        return struct.pack(
            "<iiq", self.depth, self.width, self.seed
        ) + self.counters.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        d, w, seed = struct.unpack_from("<iiq", data)
        counters = np.frombuffer(data, "<i8", offset=16).astype(np.int64)
        if counters.size != d * w:
            raise ValueError("Count-Sketch payload length mismatch")
        return cls(depth=d, width=w, seed=seed, counters=counters.reshape(d, w))
