"""Scale-sanity leg for `dataops.kmeans_embeddings`: 1M x 64-dim synthetic
float32 vectors (500x the sf0.1 embeddings table), k=8 x 4 Lloyd
iterations at local[32]. Cost-class evidence (bench policy: no cross-epoch
claims): the per-iteration wall is ONE scan of the persisted quantized
frame + a partitions x k partial collect — the 100 TB shape where the scan
is the job and vectors never shuffle.

    python BENCH/scale_r5p5_kmeans.py [--vecs 1000000]
        [--out BENCH/scale_r5p5_kmeans.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_vecs_r5p5"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="BENCH/scale_r5p5_kmeans.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.spark.dataops import kmeans_embeddings
    from ddsparkle.spark.session import get_spark

    spark = get_spark(
        "ddsparkle-scale-kmeans",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{FIXTURE}_{args.vecs}_{args.dim}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        # deterministic synthetic embeddings: 64 hash-derived uniform
        # components per id (pure Catalyst, no Python in the generator)
        comps = ", ".join(
            f"CAST((xxhash64(id, {d}) % 1000000) / 1000000.0 AS FLOAT)"
            for d in range(args.dim)
        )
        (
            spark.range(args.vecs)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(f"array({comps})").alias("embedding"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(path)
        )
    df = spark.read.parquet(path)
    n = df.count()

    t0 = time.monotonic()
    out = kmeans_embeddings(df, k=args.k, iters=args.iters)
    n_out = out.count()
    wall = time.monotonic() - t0
    sizes = {r["cluster"]: r["n"] for r in out.groupBy("cluster").agg(
        F.count("*").alias("n")).collect()}
    res = {
        "n_vecs": n,
        "dim": args.dim,
        "k": args.k,
        "iters": args.iters,
        "wall_s": round(wall, 2),
        "vecs_per_s_per_iter": round(n * (args.iters + 1) / wall),
        "rows_out": n_out,
        "cluster_sizes": {str(k_): int(v) for k_, v in sorted(sizes.items())},
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
