"""Structured Streaming tests: stateful sketch accumulation across
micro-batches (file source -> memory sink), grouped and global, state
carry-over correctness vs a batch rebuild.
"""

import math
import time

import numpy as np
import pandas as pd
import pytest

from ddsparkle.config import SketchConfig
from ddsparkle.spark.streaming import streaming_quantiles

pytestmark = pytest.mark.spark


def _write_batch(spark, path, values, batch_id, key="a"):
    pdf = pd.DataFrame({"k": [key] * len(values), "v": values})
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(3)
    first = rng.lognormal(3, 1, 5000)
    _write_batch(spark, src, first, 0)
    yield spark, src, ckpt, rng, first


def test_streaming_accumulates_state(stream_env):
    spark, src, ckpt, rng, first = stream_env
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    cfg = SketchConfig(mapping_kind="log", store_policy="collapsing_lowest", max_bins=1024)
    out = streaming_quantiles(stream, "v", by="k", qs=(0.5, 0.99), config=cfg)
    q = (
        out.writeStream.format("memory")
        .queryName("sq")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows1 = spark.sql("select * from sq").collect()
        assert rows1, "no output after first batch"
        assert rows1[-1]["count"] == len(first)

        second = rng.lognormal(5, 1, 7000)
        _write_batch(spark, src, second, 1)
        q.processAllAvailable()
        rows2 = spark.sql("select * from sq").collect()
        latest = rows2[-1]
        assert latest["count"] == len(first) + len(second)  # state carried over

        # quantiles of the union within alpha of exact
        union = np.sort(np.concatenate([first, second]))
        for qq, col in [(0.5, "q50"), (0.99, "q99")]:
            lo = union[int(math.floor(qq * (len(union) - 1)))]
            hi = union[int(math.ceil(qq * (len(union) - 1)))]
            v = latest[col]
            err = 0.0 if lo <= v <= hi else min(abs(v - lo) / lo, abs(v - hi) / hi)
            assert err <= 0.01 + 1e-9
    finally:
        q.stop()


def test_streaming_multiple_keys(stream_env):
    spark, src, ckpt, rng, first = stream_env
    from pyspark.sql import types as T

    _write_batch(spark, src, rng.lognormal(2, 0.5, 3000), 1, key="b")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_quantiles(stream, "v", by="k", qs=(0.5,))
    q = (
        out.writeStream.format("memory")
        .queryName("sq2")
        .outputMode("update")
        .option("checkpointLocation", ckpt + "2")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from sq2").collect()
        keys = {r["k"] for r in rows}
        assert keys == {"a", "b"}
    finally:
        q.stop()


def test_streaming_dedup_first_seen(spark, tmp_path):
    """Cross-batch first-seen semantics: a duplicate text arriving in a
    LATER batch is dropped even when its id is smaller (arrival order wins
    across batches; min-id wins within a batch)."""
    from ddsparkle.spark.streaming import streaming_dedup

    src = str(tmp_path / "ded_src")
    ckpt = str(tmp_path / "ded_ckpt")
    b1 = pd.DataFrame({"doc_id": [10, 11, 12], "text": ["alpha", "beta", "alpha"]})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sded")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r["doc_id"], r["text"]) for r in spark.sql("select * from sded").collect()}
        assert got1 == {(10, "alpha"), (11, "beta")}  # min-id within batch

        b2 = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "gamma"]})
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {(r["doc_id"], r["text"]) for r in spark.sql("select * from sded").collect()}
        # doc 1 is a cross-batch duplicate of 'alpha' — dropped despite id 1 < 10
        assert got2 == {(10, "alpha"), (11, "beta"), (2, "gamma")}
    finally:
        q.stop()


def test_streaming_dedup_hash_only(spark, tmp_path):
    """exact_texts=False keeps first-seen/min-id semantics with only a
    16-byte digest + flag in state (no document text)."""
    from ddsparkle.spark.streaming import streaming_dedup

    src = str(tmp_path / "dedh_src")
    ckpt = str(tmp_path / "dedh_ckpt")
    b1 = pd.DataFrame({"doc_id": [10, 11, 12], "text": ["alpha", "beta", "alpha"]})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup(stream, exact_texts=False)
    q = (
        out.writeStream.format("memory")
        .queryName("sdedh")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r["doc_id"], r["text"]) for r in spark.sql("select * from sdedh").collect()}
        assert got1 == {(10, "alpha"), (11, "beta")}  # min-id within batch

        b2 = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "gamma"]})
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {(r["doc_id"], r["text"]) for r in spark.sql("select * from sdedh").collect()}
        # doc 1 is a cross-batch duplicate of 'alpha' — dropped despite id 1 < 10
        assert got2 == {(10, "alpha"), (11, "beta"), (2, "gamma")}
    finally:
        q.stop()


def test_windowed_streaming_quantiles(spark, tmp_path):
    """Event-time tumbling windows: values land in their window's sketch and
    windows report independent quantiles."""
    from ddsparkle.spark.streaming import windowed_streaming_quantiles

    src = str(tmp_path / "wsrc")
    ckpt = str(tmp_path / "wck")
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for i in range(2000):
        rows.append(("a", base + pd.Timedelta(minutes=i % 50), 10.0 + (i % 7)))
    for i in range(2000):
        rows.append(("a", base + pd.Timedelta(hours=2, minutes=i % 50), 1000.0 + (i % 7)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_streaming_quantiles(
        stream, "v", ts_col="ts", window="1 hour", watermark="5 minutes", by="k", qs=(0.5,)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wsq")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        res = {
            (r["window_start"].hour): r
            for r in spark.sql("select * from wsq").collect()
        }
        assert set(res) == {0, 2}
        assert res[0]["count"] == 2000 and res[2]["count"] == 2000
        assert 10 <= res[0]["q50"] <= 17
        assert 1000 <= res[2]["q50"] <= 1007
    finally:
        q.stop()


def test_windowed_streaming_drops_late_data(spark, tmp_path):
    """Watermark contract: rows arriving after (max event time - watermark)
    has passed their window do not resurrect the expired window."""
    from pyspark.sql import types as T

    from ddsparkle.spark.streaming import windowed_streaming_quantiles

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ck")
    base = pd.Timestamp("2026-01-01 00:00:00")
    # batch 1: hour-0 data, then hour-6 data (advances watermark far past hour 0)
    b1 = pd.DataFrame(
        {"k": ["a"] * 200, "ts": [base + pd.Timedelta(minutes=i % 30) for i in range(200)],
         "v": [10.0] * 200}
    )
    b1b = pd.DataFrame(
        {"k": ["a"] * 200, "ts": [base + pd.Timedelta(hours=6, minutes=i % 30) for i in range(200)],
         "v": [50.0] * 200}
    )
    spark.createDataFrame(pd.concat([b1, b1b])).coalesce(1).write.mode("append").parquet(src)
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType()),
         T.StructField("v", T.DoubleType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_streaming_quantiles(
        stream, "v", ts_col="ts", window="1 hour", watermark="10 minutes", by="k", qs=(0.5,)
    )
    q = (out.writeStream.format("memory").queryName("late").outputMode("update")
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        first = {r["window_start"].hour: r["count"] for r in spark.sql("select * from late").collect()}
        assert first.get(0) == 200.0 and first.get(6) == 200.0
        # batch 2: LATE rows for hour 0 — watermark (6:00 - 10min) long past
        late = pd.DataFrame(
            {"k": ["a"] * 100, "ts": [base + pd.Timedelta(minutes=i % 30) for i in range(100)],
             "v": [999.0] * 100}
        )
        spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("select * from late").collect()
        hour0_counts = [r["count"] for r in rows if r["window_start"].hour == 0]
        # the hour-0 window never reports more than its on-time 200 rows
        assert max(hour0_counts) == 200.0
    finally:
        q.stop()


def test_windowed_streaming_counts(spark, tmp_path):
    """Built-in windowed count stream: per-(window, key) totals equal the
    batch GROUP BY, and late rows past the watermark are dropped by Spark's
    own pre-aggregation filter (no resurrected windows in append-state)."""
    from pyspark.sql import types as T

    from ddsparkle.spark.streaming import windowed_streaming_counts

    src = str(tmp_path / "cnt_src")
    ckpt = str(tmp_path / "cnt_ck")
    base = pd.Timestamp("2026-01-01 00:00:00")
    b1 = pd.DataFrame(
        {"k": ["a"] * 120 + ["b"] * 30,
         "ts": [base + pd.Timedelta(minutes=i % 40) for i in range(150)]}
    )
    b1b = pd.DataFrame(
        {"k": ["a"] * 60,
         "ts": [base + pd.Timedelta(hours=6, minutes=i % 40) for i in range(60)]}
    )
    spark.createDataFrame(pd.concat([b1, b1b])).coalesce(1).write.mode("append").parquet(src)
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_streaming_counts(
        stream, ts_col="ts", window="1 hour", watermark="10 minutes", by="k"
    )
    q = (out.writeStream.format("memory").queryName("wcnt").outputMode("update")
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        got = {(int(r["window_start"]), r["k"]): r["n"]
               for r in spark.sql("select * from wcnt").collect()}
        h0 = int(base.timestamp())
        assert got == {(h0, "a"): 120.0, (h0, "b"): 30.0, (h0 + 6 * 3600, "a"): 60.0}
        # late hour-0 rows: watermark sits at 6:40-0:10 — must be dropped
        late = pd.DataFrame({"k": ["a"] * 50, "ts": [base + pd.Timedelta(minutes=5)] * 50})
        spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("select * from wcnt").collect()
        h0_counts = [r["n"] for r in rows if int(r["window_start"]) == h0 and r["k"] == "a"]
        assert max(h0_counts) == 120.0
    finally:
        q.stop()
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
