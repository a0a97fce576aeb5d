"""The broader mergeable-sketch family (north_rule: "HLL, count-min,
t-digest, KLL, Bloom"), built on the same aggregation chassis as DDSketch:
every sketch is an (init, update_batch, merge, finalize, serde) plugin whose
state ships through Spark as a binary payload row.

Implemented this round: HyperLogLog, CountMinSketch, BloomFilter.
KLL / t-digest are planned follow-ups on the identical chassis (DDSketch
already covers the quantile use-case with *relative*-error guarantees, which
is strictly stronger for the tail-latency workloads this library targets).
"""

from .bloom import BloomFilter
from .countmin import CountMinSketch
from .hll import HyperLogLog

__all__ = ["HyperLogLog", "CountMinSketch", "BloomFilter"]
