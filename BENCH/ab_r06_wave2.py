"""Same-epoch interleaved A/B for the r6 wave-2 optimizations.

A = the wave-1 tree (commit 60eba1d, mounted as a read-only git worktree),
B = the working tree. Each leg is a fresh subprocess running the named
``__spark_entry__.queries()`` entries with bench.py's exact session settings
(warm + timed, per-leg minima over ``--rounds`` alternating A,B,A,B,...).
Every leg also emits a hash of the collected (row-sorted) result, and the
driver asserts A/B hash equality per query — speed receipts only count when
outputs are identical.

    python BENCH/ab_r06_wave2.py --a /tmp/ab_base --rounds 3 \
        rollup_cms_window_freq doc_curation_pipeline ...
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

RUNNER = r'''
import hashlib, json, os, sys, time
repo = sys.argv[1]
names = sys.argv[2].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entry_mod
from ddsparkle.spark.session import get_spark
cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark(app_name="ab-r06-w2", master=f"local[{cpus}]",
                  shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.sql.adaptive.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
queries = entry_mod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}
for name in names:
    fn = queries[name]
    rows = fn(spark, sf_dir).collect()  # warm
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    h = hashlib.md5(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()
    out[name] = {"sec": round(dt, 4), "hash": h, "rows": len(rows)}
spark.stop()
print("ABJSON:" + json.dumps(out))
'''


def run_leg(repo: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, ",".join(names)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"leg failed for {repo}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--a", default="/tmp/ab_base", help="baseline tree (leg A)")
    ap.add_argument("--b", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    legs: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(args.rounds):
        for tag, repo in (("A", args.a), ("B", args.b)):
            res = run_leg(repo, args.names)
            legs[tag].append(res)
            print(f"round {r} leg {tag}: " +
                  " ".join(f"{n}={res[n]['sec']}" for n in args.names), flush=True)

    summary = {}
    for n in args.names:
        a_min = min(leg[n]["sec"] for leg in legs["A"])
        b_min = min(leg[n]["sec"] for leg in legs["B"])
        hashes_a = {leg[n]["hash"] for leg in legs["A"]}
        hashes_b = {leg[n]["hash"] for leg in legs["B"]}
        summary[n] = {
            "A_min": a_min,
            "B_min": b_min,
            "speedup": round(a_min / b_min, 3) if b_min else None,
            "A": [leg[n]["sec"] for leg in legs["A"]],
            "B": [leg[n]["sec"] for leg in legs["B"]],
            "hash_equal": hashes_a == hashes_b and len(hashes_a) == 1,
            "rows": legs["B"][0][n]["rows"],
        }
        print(f"{n}: A_min={a_min} B_min={b_min} "
              f"speedup={summary[n]['speedup']} hash_equal={summary[n]['hash_equal']}")
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "ab_r06_wave2.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
