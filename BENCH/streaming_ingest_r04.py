"""Ingest throughput of the first-seen streaming dedup (VERDICT r3 #4).

    python BENCH/streaming_ingest_r04.py [--rows 100000] [--rounds 2]

Measures docs/sec at local[32] over a multi-batch parquet stream for BOTH
modes of ``streaming_dedup`` — exact_texts=True (texts in state, the
default) and exact_texts=False (md5 digest + flag only) — interleaved in
the same epoch per bench policy. Also records the state-store memory and
row counts from the query's last progress, evidencing the state-size
contract (hash-only state carries no text).

The expected shape: throughput is bounded by applyInPandasWithState's
~1 ms-per-group Python/Arrow overhead (one distinct document = one state
key = one group per batch it appears in), NOT by text bytes — so the two
modes land close on throughput and far apart on state bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-streaming-ingest", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _fixture(spark, rows: int, n_batches: int, dup_frac: float, path: str):
    """Deterministic doc stream: `n_batches` parquet files, ~300 B texts,
    `dup_frac` of rows duplicating an earlier doc's text."""
    from pyspark.sql import functions as F

    n_distinct = max(1, int(rows * (1.0 - dup_frac)))
    df = (
        spark.range(rows)
        .withColumn("doc_id", F.col("id"))
        .withColumn("__k", F.col("id") % n_distinct)
        .withColumn(
            "text",
            F.concat(
                F.lit("document body "),
                F.sha2(F.col("__k").cast("string"), 256),
                F.lit(" "),
                F.repeat(F.sha2(F.concat(F.lit("t"), F.col("__k").cast("string")), 256), 4),
            ),
        )
        .select("doc_id", "text")
    )
    shutil.rmtree(path, ignore_errors=True)
    # one file per micro-batch (maxFilesPerTrigger=1)
    df.repartition(n_batches).write.mode("overwrite").parquet(path)


def _run_leg(spark, src_path: str, exact_texts: bool, total_rows: int):
    from pyspark.sql import types as T

    from ddsparkle.spark.streaming import streaming_dedup

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    tag = uuid.uuid4().hex[:8]
    ckpt = f"/tmp/stream_ingest_ckpt_{tag}"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_path)
    out = streaming_dedup(stream, exact_texts=exact_texts)
    q = (
        out.writeStream.format("memory")
        .queryName(f"ingest_{tag}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        t0 = time.monotonic()
        q.processAllAvailable()
        wall = time.monotonic() - t0
        emitted = spark.sql(f"select count(*) c from ingest_{tag}").collect()[0]["c"]
        prog = q.lastProgress or {}
        state = (prog.get("stateOperators") or [{}])[0]
        return {
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(total_rows / wall, 1),
            "emitted": emitted,
            "state_rows": state.get("numRowsTotal"),
            "state_memory_bytes": state.get("memoryUsedBytes"),
        }
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--dup-frac", type=float, default=0.3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "streaming_ingest_r04.json"))
    args = ap.parse_args()

    spark = _spark()
    src = "/tmp/stream_ingest_src"
    _fixture(spark, args.rows, args.batches, args.dup_frac, src)

    legs = {"exact_texts": [], "hash_only": []}
    # interleaved same-epoch legs (bench policy); round 0 doubles as warmup
    for _ in range(args.rounds):
        for label, exact in (("exact_texts", True), ("hash_only", False)):
            legs[label].append(_run_leg(spark, src, exact, args.rows))
    best = {
        label: max(runs, key=lambda r: r["docs_per_sec"]) for label, runs in legs.items()
    }
    out = {
        "rows": args.rows,
        "batches": args.batches,
        "dup_frac": args.dup_frac,
        "per_run": legs,
        "best": best,
        "state_bytes_per_distinct": {
            label: (
                round(b["state_memory_bytes"] / b["state_rows"], 1)
                if b.get("state_rows")
                else None
            )
            for label, b in best.items()
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
