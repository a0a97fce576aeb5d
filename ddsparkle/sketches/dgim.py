"""DGIM exponential-histogram sketch: sliding-window counts over a stream.

The time-decayed member of the sketch family: count how many events landed
in the trailing W time units of a stream using O(r * log2(n)) buckets
instead of the window's raw events (Datar, Gionis, Indyk, Motwani,
"Maintaining Stream Statistics over Sliding Windows", SODA 2002 — the DGIM
algorithm, generalized to ``r`` buckets per size as in the exponential-
histogram formulation).

Invariants maintained by ``update``:

- every bucket has a power-of-two size and carries the timestamp of its
  MOST RECENT element;
- buckets are stored oldest -> newest with non-increasing sizes;
- at most ``r`` buckets of any one size exist — inserting the (r+1)-th
  merges the two OLDEST of that size into one of double size (cascading),
  which is what keeps the bucket count logarithmic.

Query: for a window cutoff, buckets whose most-recent timestamp falls
inside the window survive; every element of every surviving bucket except
the OLDEST one is provably inside the window, and the oldest surviving
bucket contributes between 1 and its full size. The estimate counts half
the oldest bucket, so the error is theorem-bounded by half the oldest
surviving bucket's size:

    2*true - est2 in [2 - oldest_size, oldest_size]

(``est2`` is twice the estimate, kept integral so the bound is exact
integer arithmetic — no float anywhere). Since the maintained sizes below
the oldest each appear ~(r-1) times, the oldest bucket is O(true/(r-1))
and the relative error is ~1/(2(r-1)) — the published asymptotic; gates
check only the exact half-oldest-bucket theorem above plus the space
invariant, never the asymptotic.

No ``merge``: DGIM is a sequential stream sketch — bucket boundaries
depend on arrival order, and two half-streams' histograms cannot be
recombined without the raw events. Distribution therefore happens BY KEY
(each key's stream is one sequential build; see
``ddsparkle.spark.approx.dgim_window_counts``), the same contract as any
per-entity streaming state. The reference repo has no sliding-window
sketch; this extends the family per the north rule (time-decayed
approximate aggregation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

__all__ = ["DgimSketch"]


@dataclass
class DgimSketch:
    """Generalized DGIM counter. ``r`` >= 2 is the max buckets per size."""

    r: int = 4
    # oldest -> newest; sizes non-increasing, each a power of two
    sizes: List[int] = field(default_factory=list)
    ts: List[int] = field(default_factory=list)  # most-recent element ts
    n_seen: int = 0
    _last_ts: int | None = None

    def __post_init__(self) -> None:
        if self.r < 2:
            raise ValueError("r must be >= 2")

    def update(self, ts: int) -> None:
        """Ingest one event at integer timestamp ``ts`` (monotone non-
        decreasing — this is a stream sketch; sort batch replays first)."""
        ts = int(ts)
        if self._last_ts is not None and ts < self._last_ts:
            raise ValueError("DGIM requires non-decreasing timestamps")
        self._last_ts = ts
        self.sizes.append(1)
        self.ts.append(ts)
        self.n_seen += 1
        # cascade: only the size just produced can exceed r. Runs of equal
        # size are contiguous (sizes non-increasing oldest->newest), so the
        # two oldest of size s sit at the run's left edge.
        s = 1
        while True:
            # left edge and count of the size-s run
            lo = 0
            n = len(self.sizes)
            while lo < n and self.sizes[lo] > s:
                lo += 1
            hi = lo
            while hi < n and self.sizes[hi] == s:
                hi += 1
            if hi - lo <= self.r:
                break
            # merge the two oldest of size s: most-recent ts of the merged
            # bucket is the NEWER one's (index lo+1)
            merged_ts = self.ts[lo + 1]
            del self.sizes[lo : lo + 2]
            del self.ts[lo : lo + 2]
            self.sizes.insert(lo, 2 * s)
            self.ts.insert(lo, merged_ts)
            s *= 2

    def update_batch(self, ts_values) -> None:
        for t in ts_values:
            self.update(t)

    def expire(self, cutoff_exclusive: int) -> None:
        """Drop buckets whose most-recent element is <= ``cutoff`` (their
        every element is provably outside any window that starts after the
        cutoff). Estimation does this implicitly; calling it just bounds
        memory for long replays."""
        j = 0
        while j < len(self.sizes) and self.ts[j] <= cutoff_exclusive:
            j += 1
        if j:
            del self.sizes[:j]
            del self.ts[:j]

    def estimate2(self, cutoff_exclusive: int) -> Tuple[int, int]:
        """(est2, oldest_size) for the window ``ts > cutoff_exclusive``:
        est2 = 2 * estimate (integral: full sizes of all surviving buckets
        except half the oldest). oldest_size = 0 means the window is
        provably empty (est2 = 0 exact)."""
        j = 0
        while j < len(self.sizes) and self.ts[j] <= cutoff_exclusive:
            j += 1
        kept = self.sizes[j:]
        if not kept:
            return 0, 0
        return 2 * sum(kept) - kept[0], kept[0]

    @property
    def n_buckets(self) -> int:
        return len(self.sizes)

    def space_ok(self) -> bool:
        """The logarithmic-space invariant: at most ``r`` buckets per size
        and every size a power of two <= n_seen."""
        from collections import Counter

        c = Counter(self.sizes)
        if any(v > self.r for v in c.values()):
            return False
        return all(s > 0 and (s & (s - 1)) == 0 and s <= max(self.n_seen, 1)
                   for s in self.sizes)

    def merge(self, other) -> None:  # pragma: no cover - contract stub
        raise NotImplementedError(
            "DGIM is a sequential stream sketch; distribute by key, do not "
            "split one stream (see module docstring)"
        )
