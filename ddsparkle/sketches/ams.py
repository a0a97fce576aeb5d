"""AMS "tug-of-war" second-frequency-moment (F2) sketch.

The frequency-moment member of the sketch family (Alon, Matias & Szegedy,
"The Space Complexity of Approximating the Frequency Moments", STOC 1996):
``c`` integer counters, each accumulating ``sign_j(key) * count`` where
``sign_j`` is a +/-1 four-wise-independent hash; ``mean_j(counter_j^2)`` is
an unbiased estimate of ``F2 = sum_key f_key^2`` with
``Var <= 2 * F2^2 / c`` (relative standard error ``sqrt(2/c)``).

F2 of a join key IS the size of the self-equijoin on that key, so the
sketch prices a shuffle's skew hazard (the hot-key blowup term) from one
pass over the rows — no groupBy, no exchange, just a ``c``-vector of int64
partials per task that merge by addition. That makes it a natural planning
probe for the adjacency self-joins the transcript operators lean on.

Everything is INTEGER end-to-end so a SQL engine can replay the sketch
bit-exactly (the repo's hash-gate rule: never gate a cross-row float sum):

- sign hash: degree-3 polynomial over the Mersenne field p = 2^61 - 1,
  evaluated by Horner on the 60-bit portable key (md5 of the value, first
  15 hex digits — injective into [0, 2^60) < p), sign = parity of the
  canonical residue. Four uniform coefficients give the textbook four-wise
  independent family; coefficients are themselves 60-bit md5 pulls of
  ``"ams:{seed}:{j}:{i}"`` so DuckDB can derive the identical table with
  its own md5 (the [0, 2^60) coefficient range covers half the field — a
  2x bias on the top bit of one coefficient, immaterial for the variance
  bound and the price of cross-engine derivability).
- counters: int64 sums of +/-count; merge = vector addition (associative,
  commutative; mapping equality enforced like every other family member).
- estimate numerator: ``sum_j counter_j^2`` in exact (Python bigint)
  arithmetic; the single division by ``c`` happens only in the float
  convenience accessor, never in a gated column.

The reference repo has no frequency-moment sketch; this extends the family
per the north rule (mergeable approximate-aggregation library), reusing the
chassis conventions of ``kmv.py``/``hll.py``.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["AMSSketch", "MERSENNE_P61", "ams_coefficients"]

#: Mersenne prime 2^61 - 1: 60-bit md5 keys embed injectively, and modular
#: products reduce with shifts/masks only (2^61 === 1 mod p).
MERSENNE_P61 = (1 << 61) - 1

_U64 = np.uint64
_P = _U64(MERSENNE_P61)
_MASK30 = _U64((1 << 30) - 1)
_MASK31 = _U64((1 << 31) - 1)


def ams_coefficients(n_counters: int, seed: int) -> np.ndarray:
    """(4, n_counters) uint64 coefficient matrix, row i = degree-i
    coefficient a_i of every estimator's polynomial. a_i[j] =
    int(md5("ams:{seed}:{j}:{i}")[:15 hex], 16) — the portable 60-bit hash,
    rederivable verbatim by DuckDB/Spark SQL."""
    out = np.empty((4, n_counters), _U64)
    for j in range(n_counters):
        for i in range(4):
            h = hashlib.md5(f"ams:{seed}:{j}:{i}".encode()).hexdigest()[:15]
            out[i, j] = int(h, 16)
    return out


def _fold(z: np.ndarray) -> np.ndarray:
    """Canonical residue mod p of z < 2^64: fold the >=2^61 part back
    (2^61 === 1), then one conditional subtract (fold output < p + 8)."""
    z = (z >> _U64(61)) + (z & _P)
    return np.where(z >= _P, z - _P, z)


def _modmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod p for a, b < p, entirely in uint64 (no 128-bit dtype):
    split both factors at 2^31 and reduce each partial product with the
    Mersenne identity. Every intermediate is < 2^63 (bounds inline)."""
    a1, a0 = a >> _U64(31), a & _MASK31  # a1 < 2^30, a0 < 2^31
    b1, b0 = b >> _U64(31), b & _MASK31
    # a*b = a1*b1*2^62 + (a1*b0 + a0*b1)*2^31 + a0*b0
    t1 = (a1 * b1) << _U64(1)  # 2^62 === 2; < 2^61
    m = a1 * b0 + a0 * b1  # < 2^62
    # m*2^31 = (m>>30)*2^61 + (m & (2^30-1))*2^31 === (m>>30) + low<<31
    t2 = (m >> _U64(30)) + ((m & _MASK30) << _U64(31))  # < 2^61 + 2^32
    t3 = a0 * b0  # < 2^62
    return _fold(_fold(t1) + _fold(t2) + _fold(t3))  # sum < 3*2^61 < 2^63


def _signs(keys: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """(n_counters, n_keys) int64 matrix of +/-1: parity of the canonical
    Horner residue ((a3*x + a2)*x + a1)*x + a0 mod p per (estimator, key)."""
    x = keys.astype(_U64).reshape(1, -1)
    # coeffs row i is the DEGREE-i coefficient (the twin derives a_i from
    # md5("ams:{seed}:{j}:{i}") under the same convention)
    a0, a1, a2, a3 = (c.reshape(-1, 1) for c in coeffs)
    h = a3
    for c in (a2, a1, a0):
        h = _fold(_modmul(h, x) + c)  # modmul < p < 2^61, c < 2^60: sum < 2^62
    return np.where((h & _U64(1)).astype(bool), np.int64(1), np.int64(-1))


@dataclass
class AMSSketch:
    """Tug-of-war F2 sketch over 60-bit integer keys (< 2^60)."""

    n_counters: int = 256
    seed: int = 0
    counters: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))

    def __post_init__(self) -> None:
        if self.n_counters < 16:
            raise ValueError("n_counters must be >= 16")
        if self.counters.size == 0:
            self.counters = np.zeros(self.n_counters, np.int64)
        self._coeffs = ams_coefficients(self.n_counters, self.seed)

    def update(self, keys, counts=None) -> None:
        """Add ``counts[i]`` (default 1) occurrences of each 60-bit key.
        Batch work is one (n_counters x n_distinct) vectorized Horner pass:
        the batch pre-aggregates to distinct keys first, so a turn-heavy
        conversation costs one column, not one per row."""
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
        if np.any(uk < 0) or np.any(uk >= (1 << 60)):
            raise ValueError("AMS keys must lie in [0, 2^60) (portable md5-60bit)")
        self.counters += _signs(uk, self._coeffs) @ w

    def merge(self, other: "AMSSketch") -> None:
        if (self.n_counters, self.seed) != (other.n_counters, other.seed):
            raise ValueError("AMS sketches differ in (n_counters, seed); not mergeable")
        self.counters = self.counters + other.counters

    # -- estimators ----------------------------------------------------------
    def inner_product_numerator(self, other: "AMSSketch") -> int:
        """Exact integer ``<counters_a, counters_b>`` (Python bigint). For
        two sketches with the SAME (n_counters, seed) over keys of two
        relations, ``dot / n_counters`` is an unbiased estimate of the
        frequency-vector inner product ``sum_k f_a(k) * f_b(k)`` — i.e.
        the EQUIJOIN SIZE of the two relations on that key (AMS 1996 §4;
        Var <= 2 * F2(a) * F2(b) / n_counters) — the join-cardinality
        probe: price "how big is A join B" from two KB payloads without
        running the join."""
        if (self.n_counters, self.seed) != (other.n_counters, other.seed):
            raise ValueError("AMS sketches differ in (n_counters, seed); not comparable")
        return sum(int(a) * int(b) for a, b in zip(self.counters, other.counters))

    def f2_numerator(self) -> int:
        """Exact integer sum_j counter_j^2 (Python bigint — immune to the
        int64 overflow a 10^12-count corpus could reach). The unbiased F2
        estimate is this divided by n_counters."""
        return sum(int(v) * int(v) for v in self.counters)

    def f2_estimate(self) -> float:
        return self.f2_numerator() / self.n_counters

    @property
    def relative_standard_error(self) -> float:
        return float(np.sqrt(2.0 / self.n_counters))

    # -- serialization (counters as raw int64, like the other family members)
    def to_bytes(self) -> bytes:
        return struct.pack("<iq", self.n_counters, self.seed) + self.counters.astype(
            "<i8"
        ).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "AMSSketch":
        n, seed = struct.unpack_from("<iq", data)
        counters = np.frombuffer(data, "<i8", offset=12).astype(np.int64)
        if counters.size != n:
            raise ValueError("AMS payload length mismatch")
        return cls(n_counters=n, seed=seed, counters=counters)
