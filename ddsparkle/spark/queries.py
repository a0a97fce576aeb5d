"""The north-star transcript analytics queries (BASELINE.json north_star):

1. per-turn text length quantiles (global and per-role);
2. turn latency quantiles from ts deltas within a conversation;
3. turns-per-conversation quantiles.

Each derives its value column with Catalyst expressions (so column pruning
and predicate pushdown reach the scan) and then enters the two-stage sketch
pipeline from ``agg.py``.

Skew notes (the ``north_rule`` requires explicit handling):
- text length: no shuffle at all — stage 1 is scan-partition-local, so a hot
  ``conv_id`` is irrelevant;
- latency: the ``lag`` window shuffles by conv_id; a conversation's rows must
  be sortable within one task, which holds for bounded conversation lengths
  (documented contract: turn ordering is per-conversation state and cannot be
  salted without breaking lag). The sketch build AFTER the window is again
  partition-local, so the only skew exposure is the window sort itself;
- turns-per-conversation: uses Spark's native ``groupBy(conv_id).count()``,
  which does map-side partial aggregation — a hot key contributes one partial
  count per task, not one shuffled row per turn. The resulting counts then
  feed the sketch as values, shuffle-free.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..config import SketchConfig
from .agg import quantiles

__all__ = [
    "text_length_quantiles",
    "turn_latency_quantiles",
    "turns_per_conversation_quantiles",
]

DEFAULT_QS = (0.5, 0.95, 0.99)


def text_length_quantiles(
    df,
    by: Optional[str] = None,
    qs: Sequence[float] = DEFAULT_QS,
    config: Optional[SketchConfig] = None,
):
    """Quantiles of per-turn text length (characters), optionally per role."""
    from pyspark.sql import functions as F

    keys = [by] if by else []
    projected = df.select(*keys, F.length("text").cast("double").alias("text_len"))
    return quantiles(projected, "text_len", by=by, qs=qs, config=config)


def turn_latency_quantiles(
    df,
    qs: Sequence[float] = DEFAULT_QS,
    config: Optional[SketchConfig] = None,
    by: Optional[str] = None,
    method: str = "window",
):
    """Quantiles of turn latency in seconds: ts - lag(ts) over
    (partition by conv_id order by turn_idx); first turns excluded.

    ``method``:
    - 'window' — lag over (conv_id, turn_idx): one sort-based exchange. All
      of a conversation's rows must sort within one task, which is fine for
      bounded conversations but is THE skew exposure if one conv_id dominates.
    - 'join' — self-join turn t with turn t-1 on the composite key
      (conv_id, turn_idx): every join key is DISTINCT, so a hot conversation
      spreads uniformly across shuffle partitions — no skewed task exists by
      construction, and AQE never needs to intervene. The skew-proof
      formulation for adversarial conv_id distributions (requires dense
      turn_idx numbering, which the transcript contract guarantees).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [by] if by else []
    micros = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-tolerant
    if method == "join":
        cur = df.select(
            *keys, "conv_id", "turn_idx", micros.alias("__ts_us")
        )
        prev = df.select(
            "conv_id",
            (F.col("turn_idx") + 1).alias("turn_idx"),
            micros.alias("__prev_us"),
        )
        lat = cur.join(prev, ["conv_id", "turn_idx"]).select(
            *keys, ((F.col("__ts_us") - F.col("__prev_us")) / 1e6).alias("latency_s")
        )
    else:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        lat = (
            df.select(*keys, "conv_id", "turn_idx", "ts")
            .withColumn("prev", F.lag(micros).over(w))
            .filter(F.col("prev").isNotNull())
            .select(*keys, ((micros - F.col("prev")) / 1e6).alias("latency_s"))
        )
    return quantiles(lat, "latency_s", by=by, qs=qs, config=config)


def turns_per_conversation_quantiles(
    df,
    qs: Sequence[float] = DEFAULT_QS,
    config: Optional[SketchConfig] = None,
):
    """Quantiles of turns per conversation. The count aggregation is native
    Spark (map-side partial agg); counts then enter the sketch as values."""
    from pyspark.sql import functions as F

    counts = df.groupBy("conv_id").agg(F.count("*").cast("double").alias("n_turns"))
    return quantiles(counts, "n_turns", qs=qs, config=config)
