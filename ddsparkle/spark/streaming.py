"""Structured Streaming: continuously-updated sketch quantiles.

DDSketch is a natural streaming-state object — mergeable, bounded memory
under collapsing stores (SURVEY.md section 2.6) — so the stateful operator is
a direct fit for ``applyInPandasWithState``: per group key, the state is one
serialized sketch (the compact flag/varint binary from serde.py, a few KB
bounded by ``max_bins``); each micro-batch's values fold into it vectorized,
and an updated quantile row is emitted per trigger.

The binary state format means checkpointed streaming state is also readable
by any other component of this library (decode_sketch), and state size is
bounded regardless of stream length when a collapsing store policy is used.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..config import SketchConfig
from ..serde import decode_sketch, encode_sketch
from .agg import quantile_column_name

__all__ = [
    "streaming_quantiles",
    "windowed_streaming_quantiles",
    "windowed_streaming_counts",
    "streaming_dedup",
    "streaming_dgim_counts",
]


def windowed_streaming_counts(
    df,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    by: Sequence[str] | str | None = None,
):
    """Event-time tumbling-window row counts — entirely BUILT-IN Structured
    Streaming operators (withWatermark + window groupBy + count): the state
    store, late-data drop, and map-side partial aggregation are all Spark's
    own, with no Python in the stream at all (contrast the sketch operators
    above, which need ``applyInPandasWithState`` for custom state). Use this
    for rate/volume monitoring next to a sketch stream; it scales as an
    ordinary streaming hash aggregate.

    Emits [window_start (epoch seconds, double), *by, n (double)]. The
    window struct aligns to epoch boundaries in the session timezone —
    callers comparing against epoch-bucket SQL must pin the session tz (the
    driver gate pins UTC).
    """
    from pyspark.sql import functions as F

    keys = [by] if isinstance(by, str) else list(by or [])
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *keys)
        .agg(F.count("*").cast("double").alias("n"))
        .select(
            F.unix_seconds(F.col("window.start")).cast("double").alias("window_start"),
            *keys,
            "n",
        )
    )


def streaming_quantiles(
    df,
    value_col: str,
    by: Sequence[str] | str | None = None,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    config: Optional[SketchConfig] = None,
    timeout: str = "NoTimeout",
):
    """Stateful streaming quantiles of ``value_col`` per group ``by``.

    Returns a streaming DataFrame [*by, *qXX, count] in update semantics:
    one refreshed row per group per trigger. Use a collapsing store config
    for bounded state under unbounded streams.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    config = config or SketchConfig()
    keys = [by] if isinstance(by, str) else list(by or [])
    qs = [float(q) for q in qs]
    q_names = [quantile_column_name(q) for q in qs]

    if not keys:
        df = df.withColumn("__g", F.lit(0))
        keys = ["__g"]
        drop_key = True
    else:
        drop_key = False

    src = df.select(*keys, F.col(value_col).cast("double").alias("__value"))
    out_schema = T.StructType(
        [src.schema[k] for k in keys]
        + [T.StructField(n, T.DoubleType()) for n in q_names]
        + [T.StructField("count", T.DoubleType())]
    )
    state_schema = T.StructType([T.StructField("payload", T.BinaryType())])
    cfg = config

    def update_fn(key, pdfs, state):
        sk = None
        if state.exists:
            (payload,) = state.get
            sk = decode_sketch(
                bytes(payload),
                store_policy=cfg.store_policy,
                max_bins=cfg.max_bins,
                track_exact_stats=cfg.track_exact_stats,
            )
        for pdf in pdfs:
            v = pdf["__value"].to_numpy(np.float64, na_value=np.nan)
            v = v[~np.isnan(v)]
            if v.size == 0:
                continue
            if sk is None:
                sk = cfg.new_sketch()
            sk.accept(v)
        if sk is None or sk.count == 0:
            return iter(())
        state.update((bytearray(encode_sketch(sk)),))
        row = dict(zip(keys, key))
        for name, qv in zip(q_names, sk.values_at_quantiles(qs)):
            row[name] = float(qv)
        row["count"] = float(sk.count)
        return iter([pd.DataFrame([row])])

    timeout_conf = getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout)
    out = src.groupBy(*keys).applyInPandasWithState(
        update_fn, out_schema, state_schema, "update", timeout_conf
    )
    return out.drop("__g") if drop_key else out


def streaming_dedup(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout: str = "NoTimeout",
    exact_texts: bool = True,
):
    """First-seen streaming deduplication: emit each arriving row whose
    text has not appeared in any earlier micro-batch (within a batch, the
    min-id copy represents its duplicates) — ingest-time dedup, so
    downstream storage only ever sees one copy of each document.

    ``exact_texts=True`` (default, EXACT): state is keyed by
    ``xxhash64(text)`` and stores the exact texts seen under that key —
    almost always exactly one (a 64-bit collision only lengthens one key's
    list; it can never produce a wrong keep/drop decision, unlike hash-only
    dedup). State size is one text per DISTINCT document; at 100 TB the
    same operator runs with RocksDB state store backing, and keying by the
    hash keeps the shuffle 8-byte.

    ``exact_texts=False`` (hash-only, opt-in for scale): state is keyed by
    the 128-bit ``md5(text)`` digest and stores only a presence flag — no
    document text ever enters the state store, so state is ~16 bytes +
    store overhead per distinct document instead of the full text. The
    price is quantified collision risk: two DISTINCT documents sharing an
    md5 drops one of them. By the birthday bound p <= n^2 / 2^129, at
    n = 10^12 distinct documents p ~ 1.5e-15 — negligible, but nonzero,
    which is why exact mode stays the default. The shuffle key is 16 bytes
    (vs 8), still constant-size regardless of document length.

    Batch-order caveat (both modes): which copy of a cross-batch duplicate
    survives is first-seen by ARRIVAL (batch) order — deterministic for a
    deterministic file/batch order; within one batch it is min-id, matching
    ``exact_dedup``'s representative choice exactly when the input fits one
    batch. Returns an append-mode stream of [id_col, text_col].

    Throughput: ``applyInPandasWithState`` hands each state key's rows to
    Python as its own group (~1 ms of interpreter/Arrow overhead per
    group), and one distinct document = one group, so ingest throughput is
    bounded by groups/sec/core, not bytes — measured at local[32] in
    ``BENCH/streaming_ingest_r04.json`` (see AB_r04.md §streaming). The
    hash-only mode shrinks state, not group count, so its throughput gain
    is modest; the knob that matters at 100 TB is partitions × cores.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_expr = (
        F.xxhash64(F.col(text_col))
        if exact_texts
        else F.unhex(F.md5(F.col(text_col)))
    )
    src = df.select(key_expr.alias("__h"), F.col(id_col), F.col(text_col))
    out_schema = T.StructType([src.schema[id_col], src.schema[text_col]])

    timeout_conf = getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout)

    if exact_texts:
        state_schema = T.StructType(
            [T.StructField("texts", T.ArrayType(T.StringType()))]
        )

        def update_fn(key, pdfs, state):
            seen = list(state.get[0]) if state.exists else []
            batch = [pdf[[id_col, text_col]] for pdf in pdfs]
            if not batch:
                return iter(())
            rows = pd.concat(batch, ignore_index=True)
            # min-id per distinct text within the batch, in min-id order so
            # the emitted representative is deterministic
            reps = rows.groupby(text_col, sort=False)[id_col].min().reset_index()
            reps = reps.sort_values(id_col)
            keep = reps[~reps[text_col].isin(seen)]
            if len(keep):
                seen.extend(keep[text_col].tolist())
                state.update((seen,))
                return iter([keep[[id_col, text_col]]])
            if not state.exists:
                state.update((seen,))
            return iter(())

    else:
        state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

        def update_fn(key, pdfs, state):
            if state.exists:
                for _ in pdfs:  # drain — this digest was already emitted
                    pass
                return iter(())
            batch = [pdf[[id_col, text_col]] for pdf in pdfs]
            if not batch:
                return iter(())
            rows = pd.concat(batch, ignore_index=True)
            if not len(rows):
                return iter(())
            state.update((True,))
            # one digest = one distinct text (modulo md5 collision): emit
            # the min-id copy
            return iter([rows.loc[[rows[id_col].idxmin()], [id_col, text_col]]])

    return src.groupBy("__h").applyInPandasWithState(
        update_fn, out_schema, state_schema, "append", timeout_conf
    )


def windowed_streaming_quantiles(
    df,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    by: Sequence[str] | str | None = None,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    config: Optional[SketchConfig] = None,
):
    """Event-time tumbling-window quantiles with late-data handling.

    Grouping key = (window, *by). Unlike built-in aggregations, arbitrary
    stateful operators must enforce the watermark themselves: Spark does NOT
    drop late rows before ``applyInPandasWithState``. This operator checks
    ``state.getCurrentWatermarkMs()`` per group — once the watermark passes
    window_end, the window's state is removed and any later-arriving rows for
    it are discarded (the standard late-data contract; tested). State per
    open window is one bounded sketch. Emits [window_start, window_end, *by,
    *qXX, count] in update mode, one refreshed row per open window per
    trigger.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    config = config or SketchConfig()
    keys = [by] if isinstance(by, str) else list(by or [])
    qs = [float(q) for q in qs]
    q_names = [quantile_column_name(q) for q in qs]

    # group by the window STRUCT itself — the event-time watermark tag lives
    # on it; projecting start/end out before the stateful operator would
    # strip the tag and disable getCurrentWatermarkMs
    src = df.withWatermark(ts_col, watermark).select(
        F.window(ts_col, window).alias("__w"),
        *keys,
        F.col(value_col).cast("double").alias("__value"),
    )
    group_cols = ["__w", *keys]
    out_cols = ["window_start", "window_end", *keys]
    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
        ]
        + [src.schema[k] for k in keys]
        + [T.StructField(n, T.DoubleType()) for n in q_names]
        + [T.StructField("count", T.DoubleType())]
    )
    state_schema = T.StructType([T.StructField("payload", T.BinaryType())])
    cfg = config
    # key timestamps arrive as NAIVE datetimes in the Spark session timezone,
    # while getCurrentWatermarkMs() is epoch-UTC — capture the session tz at
    # plan time so the comparison is correct regardless of the workers' OS tz
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"

    def _epoch_ms(ts) -> float:
        t = pd.Timestamp(ts)
        if t.tzinfo is not None:
            return t.timestamp() * 1000.0
        try:
            # DST fold/gap: pick the later instant / shift forward — at worst
            # a window closes one hour conservatively late, never early-drops
            t = t.tz_localize(session_tz, ambiguous=False, nonexistent="shift_forward")
        except Exception:
            # Java-style zone ids (e.g. 'GMT+08:00') that pandas rejects:
            # fall back to UTC rather than killing the stream; the watermark
            # comparison is then offset by the zone delta (documented)
            t = t.tz_localize("UTC")
        return t.timestamp() * 1000.0

    def update_fn(key, pdfs, state):
        # watermark enforcement: key[0] is the (start, end) window struct; a
        # window whose end is older than the current watermark is closed —
        # drop late rows and free its state
        w = key[0]  # dict {'start': Timestamp, 'end': Timestamp}
        window_start, window_end = w["start"], w["end"]
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0 and _epoch_ms(window_end) <= wm_ms:
            if state.exists:
                state.remove()
            for _ in pdfs:  # drain
                pass
            return iter(())
        sk = None
        if state.exists:
            (payload,) = state.get
            sk = decode_sketch(
                bytes(payload),
                store_policy=cfg.store_policy,
                max_bins=cfg.max_bins,
                track_exact_stats=cfg.track_exact_stats,
            )
        for pdf in pdfs:
            v = pdf["__value"].to_numpy(np.float64, na_value=np.nan)
            v = v[~np.isnan(v)]
            if v.size == 0:
                continue
            if sk is None:
                sk = cfg.new_sketch()
            sk.accept(v)
        if sk is None or sk.count == 0:
            return iter(())
        state.update((bytearray(encode_sketch(sk)),))
        row = dict(zip(out_cols, (window_start, window_end, *key[1:])))
        for name, qv in zip(q_names, sk.values_at_quantiles(qs)):
            row[name] = float(qv)
        row["count"] = float(sk.count)
        return iter([pd.DataFrame([row])])

    return src.groupBy(*group_cols).applyInPandasWithState(
        update_fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_dgim_counts(
    df,
    ts_col: str = "ts",
    by: str = "event_type",
    id_col: str = "event_id",
    r: int = 4,
):
    """Streaming leg of the DGIM sliding-window counter
    (:class:`ddsparkle.sketches.dgim.DgimSketch`): per-key exponential-
    histogram state held in ``applyInPandasWithState`` across micro-
    batches; each trigger folds the batch's (epoch-micros-sorted) arrivals
    into the state and emits the key's updated histogram — [by, n_seen,
    n_buckets, sizes, ts] with the bucket arrays exposed so any consumer
    (or the parity gate) can answer ``estimate2(cutoff)`` for ANY window
    from the row without touching the stream again. State is the same
    O(r*log n) bucket pair the batch build holds — bytes, not events.

    Order contract (the sketch's semantics, not a limitation of this
    wrapper): DGIM consumes its stream in time order, so micro-batches
    must arrive in non-decreasing event time per key (file-per-trigger
    over time-ordered files, the rollup ingestion assumption; rows WITHIN
    a batch are sorted here). A late row below the key's high-water mark
    raises in the kernel rather than silently corrupting bucket history —
    pair with a watermark/reorder stage upstream if the source can stray.
    Single-batch replay of a sorted table therefore bit-equals the batch
    ``approx.dgim_window_counts`` build (the parity the gate pins).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..sketches.dgim import DgimSketch

    # r6 (ADVICE r5 #4): drop timestamp-less rows before the kernel — a
    # NULL ts arrives as NaN and DgimSketch.update raises in the executor
    src = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(by).cast("string").alias("__k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(id_col).cast("long").alias("__id"),
    )
    out_schema = T.StructType(
        [
            T.StructField(by, T.StringType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("n_buckets", T.LongType()),
            T.StructField("sizes", T.ArrayType(T.LongType())),
            T.StructField("ts", T.ArrayType(T.LongType())),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("sizes", T.ArrayType(T.LongType())),
            T.StructField("ts", T.ArrayType(T.LongType())),
            T.StructField("n_seen", T.LongType()),
            T.StructField("last_ts", T.LongType()),
        ]
    )

    def update_fn(key, pdfs, state):
        batch = [pdf[["__us", "__id"]] for pdf in pdfs]
        if not batch:
            return iter(())
        rows = pd.concat(batch, ignore_index=True)
        if not len(rows):
            return iter(())
        rows = rows.sort_values(["__us", "__id"], kind="mergesort")
        if state.exists:
            sizes, ts, n_seen, last_ts = state.get
            sk = DgimSketch(r=r, sizes=list(sizes), ts=list(ts), n_seen=int(n_seen))
            sk._last_ts = int(last_ts)
        else:
            sk = DgimSketch(r=r)
        sk.update_batch(rows["__us"].to_numpy())
        state.update((list(sk.sizes), list(sk.ts), sk.n_seen, sk._last_ts))
        out = pd.DataFrame(
            [
                (
                    key[0],
                    sk.n_seen,
                    sk.n_buckets,
                    list(sk.sizes),
                    list(sk.ts),
                )
            ],
            columns=[by, "n_seen", "n_buckets", "sizes", "ts"],
        )
        return iter([out])

    return src.groupBy("__k").applyInPandasWithState(
        update_fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
