"""The broader mergeable-sketch family (north_rule: "HLL, count-min,
t-digest, KLL, Bloom"), built on the same aggregation chassis as DDSketch:
every sketch is an (init, update_batch, merge, finalize, serde) plugin whose
state ships through Spark as a binary payload row.

Implemented: HyperLogLog, CountMinSketch, BloomFilter, KLLSketch (rank-error
quantiles), TDigest (tail-accurate rank-error quantiles), MisraGries
(deterministic heavy hitters). DDSketch itself
(the package root) covers relative-error quantiles.
"""

from .bloom import BloomFilter
from .kll import KLLSketch
from .tdigest import TDigest
from .countmin import CountMinSketch
from .hll import HyperLogLog
from .misra_gries import MisraGries
from .kmv import KMVSketch
from .reservoir import ReservoirSample
from .ams import AMSSketch

__all__ = ["HyperLogLog", "CountMinSketch", "BloomFilter", "KLLSketch", "TDigest", "MisraGries", "ReservoirSample", "KMVSketch", "AMSSketch"]
