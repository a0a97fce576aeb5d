"""Same-epoch interleaved A/B: trimmed/winsorized means, kernel vs sql mode.

- **A** (kernel): `agg.trimmed_means(mode='kernel')` — Arrow partial
  sketches per partition, mapInPandas merge, Python bucket-walk finalize.
- **B** (sql): `agg.trimmed_means(mode='sql')` — the pure-Catalyst plan
  (`ddsketch_trimmed_spark_sql`): bucket hash aggregate + window cumsum +
  a deterministic `aggregate()` fold over per-group bucket arrays.

Both legs answer from the SAME sketch model, so agreement is checked at
round-4 on every group (the pinned-fold contract: identical IEEE tree,
leaf representatives differ only by JVM-vs-numpy exp ulps). Two group
shapes: by role (4 groups — the wide-bucket-array regime) and by conv_id
(~200k groups — the py4j/plan-cost regime the sql mode was built for).

    python BENCH/ab_r05_trimmed.py [--convs 200000] [--rounds 3]
        [--out BENCH/ab_r05_trimmed.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/ddsparkle_scale_convs_r04b"  # shared with the other r5 A/Bs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/ab_r05_trimmed.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsparkle.config import SketchConfig
    from ddsparkle.spark.agg import trimmed_means
    from ddsparkle.spark.session import get_spark
    from ddsparkle.transcripts import transcripts_df

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
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
    df = (
        spark.read.parquet(path)
        .select("conv_id", "role", F.length("text").alias("text_len"))
    )
    n_turns = df.count()  # warm the scan once, untimed
    cfg = SketchConfig(
        mapping_kind="log",
        relative_accuracy=0.01,
        store_policy="unbounded",
        max_bins=0,
        track_exact_stats=False,
    )

    def leg(mode: str, by: str):
        out = trimmed_means(df, "text_len", 0.05, 0.05, by=by, config=cfg, mode=mode)
        row = out.agg(
            F.count("count").alias("n"),
            F.sum("count").alias("mass"),
            F.sum(F.round("trimmed_mean", 4)).alias("tm"),
        ).collect()[0]
        return int(row["n"]), float(row["mass"]), float(row["tm"])

    results = {"n_convs": args.convs, "n_turns": n_turns, "shapes": {}}
    for by in ("role", "conv_id"):
        mins = {"kernel": float("inf"), "sql": float("inf")}
        rounds = []
        for _ in range(args.rounds):
            rnd = {}
            for mode in ("kernel", "sql"):
                t0 = time.monotonic()
                n, mass, tm = leg(mode, by)
                dt = time.monotonic() - t0
                rnd[f"{mode}_n"] = n
                rnd[f"{mode}_mass"] = mass
                rnd[f"{mode}_wall"] = round(dt, 3)
                mins[mode] = min(mins[mode], dt)
            rnd["counts_equal"] = (
                rnd["kernel_n"] == rnd["sql_n"]
                and rnd["kernel_mass"] == rnd["sql_mass"]
            )
            rounds.append(rnd)
            print(json.dumps({"by": by, **rnd}))

        # agreement at round-4, once (untimed): full outer join on the key
        k = trimmed_means(df, "text_len", 0.05, 0.05, by=by, config=cfg,
                          mode="kernel").toPandas().set_index(by).sort_index()
        s = trimmed_means(df, "text_len", 0.05, 0.05, by=by, config=cfg,
                          mode="sql").toPandas().set_index(by).sort_index()
        assert list(k.index) == list(s.index)
        max_abs = max(
            float((k[c].astype(float) - s[c].astype(float)).abs().max())
            for c in ("trimmed_mean", "winsorized_mean")
        )
        results["shapes"][by] = {
            "rounds": rounds,
            "n_groups": len(k),
            "max_abs_mean_delta": max_abs,
            "wall_min_kernel": round(mins["kernel"], 3),
            "wall_min_sql": round(mins["sql"], 3),
            "speedup_sql": round(mins["kernel"] / mins["sql"], 2),
        }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        by: {kk: vv for kk, vv in d.items() if kk != "rounds"}
        for by, d in results["shapes"].items()
    }))


if __name__ == "__main__":
    main()