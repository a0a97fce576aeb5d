"""Same-epoch interleaved A/B for the r5-part-5 `merge_consecutive_turns`
fold vectorization.

- **A** (initial implementation, kept local to this bench): pandas
  groupby over the run segmentation with per-run Python lambdas for the
  first-of-run picks plus pandas min/size machinery;
- **B** (shipped): contiguous-run fancy indexing + ``np.minimum.reduceat``
  — the only per-run Python left is the inherent text join.

Output equality is asserted per round with an ORDER-FREE checksum over
every column (count, sum(n_merged), sum(crc32(all fields))) — identical
run sets, not just counts. Fixture: the 200 k-conv / ~2.9 M-turn corpus
(scale_conv_ops_r04b).

    python BENCH/ab_r5p5_merge.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r5p5_merge.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"


def _merge_runs_r5a(df, text_col="text", sep="\n"):
    """The A leg: the initial pandas-groupby fold, verbatim."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.coalesce(F.col(text_col), F.lit("")).cast("string").alias("__text"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__ts_us"),
    )
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "ts_us long, n_merged long"
    )

    def fold(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        brk = (pdf["conv_id"] != pdf["conv_id"].shift()) | (
            pdf["role"] != pdf["role"].shift()
        )
        seg = brk.cumsum()
        g = pdf.groupby(seg, sort=True)
        yield pd.DataFrame(
            {
                "conv_id": g["conv_id"].agg(lambda s: s.iloc[0]),
                "turn_idx": g["turn_idx"].min(),
                "role": g["role"].agg(lambda s: s.iloc[0]),
                "text": g["__text"].agg(sep.join),
                "ts_us": g["__ts_us"].min(),
                "n_merged": g.size(),
            }
        )

    parted = src.repartition("conv_id").sortWithinPartitions("conv_id", "turn_idx")
    return parted.mapInPandas(fold, schema=schema)


def _checksum(out):
    from pyspark.sql import functions as F

    row = out.agg(
        F.count("*").alias("n"),
        F.sum("n_merged").alias("turns"),
        F.sum(
            F.crc32(
                F.concat_ws(
                    "\x1f",
                    "conv_id",
                    F.col("turn_idx").cast("string"),
                    "role",
                    F.md5("text"),
                    F.col("ts_us").cast("string"),
                    F.col("n_merged").cast("string"),
                )
            )
        ).alias("crc"),
    ).collect()[0]
    return (row["n"], row["turns"], row["crc"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r5p5_merge.json")
    args = ap.parse_args()

    from ddsparkle.spark.session import get_spark
    from ddsparkle.spark.transcript_ops import merge_consecutive_turns
    from ddsparkle.transcripts import transcripts_df

    spark = get_spark(
        "ddsparkle-ab-merge",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{FIXTURE}_{args.convs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        (
            transcripts_df(spark, n_convs=args.convs, profile="bench", seed=7)
            .write.mode("overwrite")
            .option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(path)
        )
    df = spark.read.parquet(path)
    df.count()  # warm

    legs = {
        "A_pandas_groupby": lambda: _merge_runs_r5a(df),
        "B_reduceat": lambda: merge_consecutive_turns(df),
    }
    walls = {k: [] for k in legs}
    sums = {}
    equal = True
    for r in range(args.rounds):
        for name, fn in legs.items():
            t0 = time.monotonic()
            cs = _checksum(fn())
            walls[name].append(round(time.monotonic() - t0, 2))
            prev = sums.setdefault(r, {})
            prev[name] = cs
        equal = equal and (sums[r]["A_pandas_groupby"] == sums[r]["B_reduceat"])
    res = {
        "n_convs": args.convs,
        "walls": walls,
        "min_A": min(walls["A_pandas_groupby"]),
        "min_B": min(walls["B_reduceat"]),
        "speedup": round(min(walls["A_pandas_groupby"]) / min(walls["B_reduceat"]), 2),
        "outputs_equal_all_rounds": equal,
        "checksums": {str(k): {n: list(v) for n, v in d.items()} for k, d in sums.items()},
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
