"""Per-query job/stage profiler for the r6 optimization round (guide §1).

Runs named ``__spark_entry__.queries()`` entries with the EXACT bench.py
session settings (local[$SPARK_GRAFT_CPUS], shuffle_partitions=8, AQE off)
plus an event log, using bench.py's warm+timed methodology; then parses the
event log into a per-query breakdown: jobs, stages, wall seconds per stage,
stage names — so optimization targets the measured bottleneck, not a guess.

    python BENCH/profile_r06.py doc_curation_pipeline customer_name_editdist \
        [--sf-dir /root/testdata/sf0.1] [--out /tmp/profile.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ddsparkle.spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/profile_r06.json")
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed repetitions after the warm run (min reported)")
    args = ap.parse_args()

    evdir = f"/tmp/spark-events-prof-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ddsparkle-profile-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    walls: dict[str, float] = {}
    for name in args.names:
        fn = queries[name]
        fn(spark, args.sf_dir).collect()  # warm
        best = None
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"PROF:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        walls[name] = round(best, 4)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    with open(args.out + ".walls", "w") as f:
        json.dump(walls, f)

    # ---- parse the event log -------------------------------------------
    jobs, stages = _parse_eventlog(os.path.join(evdir, app_id))

    out = _summarize(args.names, walls, jobs, stages)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    _print(out)


def _open_eventlog(path: str):
    """Handle both the single-file and the Spark-4 rolling-dir layouts,
    plus zstd compression."""
    import io

    if os.path.isdir(os.path.dirname(path)):
        rolldir = os.path.join(
            os.path.dirname(path), f"eventlog_v2_{os.path.basename(path)}"
        )
        if os.path.isdir(rolldir):
            parts = sorted(
                p for p in os.listdir(rolldir) if p.startswith("events_")
            )
            streams = []
            for p in parts:
                fp = os.path.join(rolldir, p)
                if p.endswith(".zstd"):
                    import subprocess

                    proc = subprocess.Popen(
                        ["zstd", "-dc", fp], stdout=subprocess.PIPE
                    )
                    streams.append(io.TextIOWrapper(proc.stdout))
                else:
                    streams.append(open(fp))
            import itertools

            return itertools.chain.from_iterable(streams)
    return open(path)


def _parse_eventlog(path: str):
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        f = _open_eventlog(path)
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stage_ids": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
    return jobs, stages


def _summarize(names, walls, jobs, stages):
    out: dict[str, dict] = {}
    for name in names:
        tag = f"PROF:{name}"
        qjobs = [j for j in jobs.values() if j["desc"] == tag and "t1" in j]
        detail = []
        for j in sorted(qjobs, key=lambda x: x["t0"]):
            jstages = []
            for sid in j["stage_ids"]:
                s = stages.get(sid)
                if s and s.get("t0") and s.get("t1"):
                    jstages.append(
                        {
                            "stage": sid,
                            "name": s["name"].split("\n")[0][:90],
                            "tasks": s["tasks"],
                            "sec": round((s["t1"] - s["t0"]) / 1000.0, 3),
                        }
                    )
            detail.append(
                {
                    "job_sec": round((j["t1"] - j["t0"]) / 1000.0, 3),
                    "stages": jstages,
                }
            )
        gap = walls.get(name, 0.0) - sum(d["job_sec"] for d in detail)
        out[name] = {
            "wall_sec": walls.get(name),
            "n_jobs": len(detail),
            "driver_gap_sec": round(gap, 3),  # plan/py4j/driver-side time
            "jobs": detail,
        }
    return out


def _print(out):
    for name, d in out.items():
        print(
            f"{name}: wall={d['wall_sec']}s jobs={d['n_jobs']} "
            f"driver_gap={d['driver_gap_sec']}s"
        )
        for j in d["jobs"]:
            tops = sorted(j["stages"], key=lambda s: -s["sec"])[:3]
            tops_s = "; ".join(f"{s['sec']}s[{s['tasks']}t] {s['name']}" for s in tops)
            print(f"   job {j['job_sec']}s :: {tops_s}")


if __name__ == "__main__":
    main()
