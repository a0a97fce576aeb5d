"""DDSketch: fully-mergeable quantile sketch with relative-error guarantees.

Re-expresses the reference's sketch algebra (``/root/reference/src/main/java/
com/datadoghq/sketch/ddsketch/DDSketch.java``) as a batch/NumPy-vectorized
object:

- sign routing (``DDSketch.java:218-229``): values ``> min_indexed_value`` go
  to the positive store at ``mapping.index(v)``; values ``< -min_indexed_value``
  to the negative store at ``mapping.index(-v)``; the rest to ``zero_count``;
- weighted accept (``DDSketch.java:238-253``): non-negative double weights;
- merge (``DDSketch.java:268-281``): requires equal mappings, merges both
  stores and zero counts — associative and commutative;
- quantile query (``DDSketch.java:343-388``): rank ``q * (count - 1)``; walk
  negative store by descending index, then zero, then positive store by
  ascending index, accumulating counts until the running total exceeds the
  rank; the returned value is ``±mapping.value(index)`` i.e.
  ``lower_bound * (1 + alpha)``;
- approximate count/sum/min/max/avg (``DDSketch.java:301-340``).

``ExactSummaryStatistics`` mirrors ``WithExactSummaryStatistics.java:17-207``:
exact count, Kahan-compensated exact sum (repaired via simple sum when
non-finite), exact min/max, and quantiles clamped into ``[min, max]``.

Documented deviation: the reference updates min/max unconditionally, so a
value accepted with count=0 still moves the exact extremes
(``WithExactSummaryStatistics.java:72-78``). Here zero-weight values are
no-ops everywhere (stores, stats, and the Spark builders agree), which keeps
``accept(v, 0)`` a true identity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .mapping import CubicallyInterpolatedMapping, IndexMapping
from .store import BucketStore

__all__ = ["DDSketch", "ExactSummaryStatistics", "sketch_of"]


@dataclass
class ExactSummaryStatistics:
    """Exact (count, sum, min, max) carried alongside the bucket arrays.

    Sum uses Kahan compensation like ``WithExactSummaryStatistics.java:24-26,
    108-113`` with the same non-finite repair through a simple sum
    (``:138-148``).
    """

    count: float = 0.0
    sum: float = 0.0
    sum_compensation: float = 0.0
    simple_sum: float = 0.0
    min: float = math.inf
    max: float = -math.inf

    def add_batch(self, values: np.ndarray, weights: Optional[np.ndarray]) -> None:
        if values.size == 0:
            return
        if weights is None:
            self.count += values.size
            batch_sum = float(values.sum())
        else:
            self.count += float(weights.sum())
            batch_sum = float(np.dot(values, weights))
            nz = weights > 0
            if not nz.any():
                return
            values = values[nz]
        self._add_sum(batch_sum)
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))

    def _add_sum(self, x: float) -> None:
        # Kahan step
        corrected = x - self.sum_compensation
        new_sum = self.sum + corrected
        self.sum_compensation = (new_sum - self.sum) - corrected
        self.sum = new_sum
        self.simple_sum += x

    def merge(self, other: "ExactSummaryStatistics") -> None:
        self.count += other.count
        self._add_sum(other.sum)
        self._add_sum(-other.sum_compensation)
        self.simple_sum += other.simple_sum
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)

    @property
    def repaired_sum(self) -> float:
        # Compensated sums can be spuriously NaN when intermediate values
        # overflow; fall back to the simple sum (WithExactSummaryStatistics
        # .java:138-148).
        s = self.sum
        if math.isnan(s) and not math.isnan(self.simple_sum):
            return self.simple_sum
        return s

    def copy(self) -> "ExactSummaryStatistics":
        return ExactSummaryStatistics(
            self.count, self.sum, self.sum_compensation, self.simple_sum, self.min, self.max
        )


def _default_mapping() -> IndexMapping:
    return CubicallyInterpolatedMapping.from_relative_accuracy(0.01)


@dataclass
class DDSketch:
    """Mergeable relative-error quantile sketch over doubles."""

    mapping: IndexMapping = field(default_factory=_default_mapping)
    store_policy: str = "unbounded"
    max_bins: int = 0
    min_indexed_value: float = 0.0
    track_exact_stats: bool = True

    negative_store: BucketStore = field(init=False)
    positive_store: BucketStore = field(init=False)
    zero_count: float = field(init=False, default=0.0)
    exact_stats: Optional[ExactSummaryStatistics] = field(init=False, default=None)

    def __post_init__(self) -> None:
        self.min_indexed_value = max(self.min_indexed_value, self.mapping.min_indexable_value)
        self.max_indexed_value = self.mapping.max_indexable_value
        self.negative_store = BucketStore(self.store_policy, self.max_bins)
        self.positive_store = BucketStore(self.store_policy, self.max_bins)
        if self.track_exact_stats:
            self.exact_stats = ExactSummaryStatistics()

    # -- ingestion ---------------------------------------------------------
    def accept(self, values, weights=None) -> None:
        """Vectorized accept of a batch of doubles with optional weights."""
        v = np.atleast_1d(np.asarray(values, np.float64))
        w = None
        if weights is not None:
            w = np.broadcast_to(np.asarray(weights, np.float64), v.shape).astype(np.float64)
            if np.any(w < 0):
                raise ValueError("The count cannot be negative.")
        if v.size == 0:
            return
        if np.any(np.abs(v) > self.max_indexed_value) or np.any(np.isnan(v)):
            raise ValueError(
                "The input value is outside the range that is tracked by the sketch."
            )
        pos = v > self.min_indexed_value
        neg = v < -self.min_indexed_value
        zero = ~(pos | neg)
        if pos.any():
            self.positive_store.add(
                self.mapping.index(v[pos]), None if w is None else w[pos]
            )
        if neg.any():
            self.negative_store.add(
                self.mapping.index(-v[neg]), None if w is None else w[neg]
            )
        if zero.any():
            self.zero_count += float(zero.sum()) if w is None else float(w[zero].sum())
        if self.exact_stats is not None:
            self.exact_stats.add_batch(v, w)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "DDSketch") -> None:
        if self.mapping != other.mapping:
            raise ValueError(
                "The sketches are not mergeable because they do not use the same index mappings."
            )
        self.negative_store.merge(other.negative_store)
        self.positive_store.merge(other.positive_store)
        self.zero_count += other.zero_count
        if self.exact_stats is not None and other.exact_stats is not None:
            self.exact_stats.merge(other.exact_stats)
        elif other.exact_stats is None and not other.is_empty():
            # exactness is lost only if the stats-less input carried data
            self.exact_stats = None
            self.track_exact_stats = False

    def copy(self) -> "DDSketch":
        out = DDSketch(
            self.mapping,
            self.store_policy,
            self.max_bins,
            self.min_indexed_value,
            self.track_exact_stats,
        )
        out.negative_store = self.negative_store.copy()
        out.positive_store = self.positive_store.copy()
        out.zero_count = self.zero_count
        out.exact_stats = None if self.exact_stats is None else self.exact_stats.copy()
        return out

    def clear(self) -> None:
        self.negative_store.clear()
        self.positive_store.clear()
        self.zero_count = 0.0
        if self.track_exact_stats:
            self.exact_stats = ExactSummaryStatistics()

    # -- summaries (approximate, from buckets; DDSketch.java:301-340) ------
    def is_empty(self) -> bool:
        return (
            self.zero_count == 0
            and self.negative_store.is_empty()
            and self.positive_store.is_empty()
        )

    @property
    def count(self) -> float:
        if self.exact_stats is not None:
            return self.exact_stats.count
        return (
            self.zero_count
            + self.negative_store.total_count
            + self.positive_store.total_count
        )

    @property
    def sum(self) -> float:
        if self.exact_stats is not None:
            return self.exact_stats.repaired_sum
        s = 0.0
        if not self.negative_store.is_empty():
            s -= float(
                np.dot(
                    self.mapping.value(self.negative_store.indexes),
                    self.negative_store.counts,
                )
            )
        if not self.positive_store.is_empty():
            s += float(
                np.dot(
                    self.mapping.value(self.positive_store.indexes),
                    self.positive_store.counts,
                )
            )
        return s

    @property
    def avg(self) -> float:
        # Java 0.0/0.0 yields NaN (QuantileSketch.getAverage on empty);
        # Python raises, so return NaN explicitly
        c = self.count
        return self.sum / c if c else math.nan

    @property
    def min(self) -> float:
        if self.exact_stats is not None and self.exact_stats.count > 0:
            return self.exact_stats.min
        if not self.negative_store.is_empty():
            return -float(self.mapping.value(self.negative_store.max_index))
        if self.zero_count > 0:
            return 0.0
        return float(self.mapping.value(self.positive_store.min_index))

    @property
    def max(self) -> float:
        if self.exact_stats is not None and self.exact_stats.count > 0:
            return self.exact_stats.max
        if not self.positive_store.is_empty():
            return float(self.mapping.value(self.positive_store.max_index))
        if self.zero_count > 0:
            return 0.0
        return -float(self.mapping.value(self.negative_store.min_index))

    # -- quantiles ---------------------------------------------------------
    def _walk_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(values ascending, counts) for the rank walk: negative store by
        descending index (most negative value first), zero bucket, positive
        store by ascending index."""
        parts_v = []
        parts_c = []
        ns = self.negative_store
        if not ns.is_empty():
            parts_v.append(-np.asarray(self.mapping.value(ns.indexes[::-1]), np.float64))
            parts_c.append(ns.counts[::-1])
        if self.zero_count > 0:
            parts_v.append(np.zeros(1))
            parts_c.append(np.asarray([self.zero_count]))
        ps = self.positive_store
        if not ps.is_empty():
            parts_v.append(np.asarray(self.mapping.value(ps.indexes), np.float64))
            parts_c.append(ps.counts)
        if not parts_v:
            return np.empty(0), np.empty(0)
        return np.concatenate(parts_v), np.concatenate(parts_c)

    def values_at_quantiles(self, quantiles) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(quantiles, np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("The quantile must be between 0 and 1.")
        # Use the bucket count for the walk: the walk's termination invariant
        # (cumulative > rank with rank = q*(count-1)) relies on the store's own
        # totals, as in DDSketch.java:343-345 where count = getCount().
        bucket_count = (
            self.zero_count
            + self.negative_store.total_count
            + self.positive_store.total_count
        )
        if bucket_count == 0:
            raise LookupError("The sketch is empty.")
        values, counts = self._walk_arrays()
        cum = np.cumsum(counts)
        ranks = qs * (bucket_count - 1)
        pos = np.searchsorted(cum, ranks, side="right")
        pos = np.minimum(pos, values.size - 1)
        out = values[pos]
        if self.exact_stats is not None and self.exact_stats.count > 0:
            # Clamp into the exact [min, max] like WithExactSummaryStatistics
            # .java:200-206.
            out = np.clip(out, self.exact_stats.min, self.exact_stats.max)
        return out

    def value_at_quantile(self, quantile: float) -> float:
        return float(self.values_at_quantiles([quantile])[0])

    def cdf_at_values(self, xs) -> np.ndarray:
        """Fraction of the sketched mass at or below each x — the rank walk
        of ``values_at_quantiles`` read in the inverse direction, over the
        same discrete representation: each bucket contributes its whole
        count at its representative value (``lowerBound*(1+alpha)`` signed,
        the zero bucket at 0). The reference answers rank->value only
        (`DDSketch.java:353-388`); value->rank is the natural inverse under
        the identical relative-accuracy contract: cdf_at_values(x) equals
        the exact CDF evaluated somewhere in [x/(1+2a), x*(1+2a)].

        Returns estimates in [0, 1]; raises LookupError on an empty sketch
        like the quantile walk.
        """
        xs = np.atleast_1d(np.asarray(xs, np.float64))
        bucket_count = (
            self.zero_count
            + self.negative_store.total_count
            + self.positive_store.total_count
        )
        if bucket_count == 0:
            raise LookupError("The sketch is empty.")
        values, counts = self._walk_arrays()
        cum = np.cumsum(counts)
        pos = np.searchsorted(values, xs, side="right")
        out = np.where(pos == 0, 0.0, cum[np.maximum(pos - 1, 0)]) / bucket_count
        # searchsorted sends NaN probes past the end (-> a confident 1.0);
        # propagate the NaN instead, like SQL aggregation of `val <= NaN`
        # yields no mass rather than full mass
        return np.where(np.isnan(xs), np.nan, out)

    def trimmed_means(self, lo: float, hi: float) -> tuple[float, float]:
        """(trimmed mean, winsorized mean) of the sketched mass after
        cutting the lowest ``floor(lo*n)`` and highest ``floor(hi*n)``
        observations — robust location estimates straight off the bucket
        representation, no raw data needed. The reference stops at the
        rank walk (`DDSketch.java:343-388`); the trimmed/winsorized means
        are that walk's natural integral: each bucket contributes its
        representative value times its count clipped to the kept rank
        window ``[k_lo, n - k_hi)``; winsorizing re-adds the cut tails at
        the boundary-rank representatives (rank ``k_lo`` and
        ``n - k_hi - 1`` under the same ``searchsorted(cum, r, 'right')``
        convention as the quantile walk).

        Cross-engine determinism contract (the reason this is hash-
        gateable): the kept-count arithmetic is exact (doubles on exact
        integers), and the dot ``sum(kept_i * v_i)`` folds LEFT-TO-RIGHT
        over buckets in ascending-value order starting from 0.0 — the
        DuckDB twin replays the identical fold with
        ``list_reduce(list_prepend(0.0, list(k*val ORDER BY val)))``, so
        both engines evaluate the same IEEE expression tree
        (`oracle.ddsketch_trimmed_mean_sql`). Estimates carry the
        mapping's relative-accuracy contract: every representative is
        within alpha of its true values, so both means are within
        relative ~alpha of the exact trimmed/winsorized means over the
        same rank cuts. With exact stats tracked, results clamp into the
        exact [min, max] like the quantile walk.
        """
        if not (0.0 <= lo and 0.0 <= hi and lo + hi < 1.0):
            raise ValueError("trim fractions must satisfy 0 <= lo, hi and lo + hi < 1")
        n = (
            self.zero_count
            + self.negative_store.total_count
            + self.positive_store.total_count
        )
        if n == 0:
            raise LookupError("The sketch is empty.")
        values, counts = self._walk_arrays()
        cum = np.cumsum(counts)
        k_lo = math.floor(lo * n)
        k_hi = math.floor(hi * n)
        kept = np.clip(
            np.minimum(cum, n - k_hi) - np.maximum(cum - counts, k_lo), 0.0, None
        )
        # deterministic left-to-right fold (ascending values, 0.0 start):
        # bucket counts are small, the Python loop is finalize-side only
        t = 0.0
        for kc, v in zip(kept.tolist(), values.tolist()):
            t += kc * v
        trimmed = t / (n - k_lo - k_hi)
        v_lo = values[min(int(np.searchsorted(cum, k_lo, side="right")), values.size - 1)]
        v_hi = values[min(int(np.searchsorted(cum, n - k_hi - 1, side="right")), values.size - 1)]
        winsorized = ((float(k_lo) * float(v_lo) + t) + float(k_hi) * float(v_hi)) / n
        if self.exact_stats is not None and self.exact_stats.count > 0:
            trimmed = float(np.clip(trimmed, self.exact_stats.min, self.exact_stats.max))
            winsorized = float(
                np.clip(winsorized, self.exact_stats.min, self.exact_stats.max)
            )
        return float(trimmed), float(winsorized)

    # -- config identity ---------------------------------------------------
    def config_tuple(self) -> tuple:
        return (
            self.mapping.kind,
            self.mapping.gamma,
            self.mapping.index_offset,
            self.store_policy,
            self.max_bins,
            self.track_exact_stats,
        )


def sketch_of(values, mapping: Optional[IndexMapping] = None, **kwargs) -> DDSketch:
    """Convenience constructor: build a sketch from a batch of values."""
    sk = DDSketch(mapping=mapping or _default_mapping(), **kwargs)
    sk.accept(values)
    return sk
