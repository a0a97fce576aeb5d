"""DGIM state-size receipt (drift-free: byte counts, no wall-clock claims).

What a trailing-window counter must RETAIN per key, measured on the sf0.1
events table (30 days, 5 series):

- exact answer: every event still inside the largest answerable window
  (the raw (ts,id) pairs — 16 B/event lower bound, before store overhead);
- DGIM: the exponential-histogram buckets (two int64 arrays — 16 B/bucket),
  answering EVERY window ending now with the half-oldest-bucket guarantee.

State size is deterministic arithmetic on a deterministic input, so this
receipt is immune to the host's 2x throughput drift (BENCH policy: absolute
timings prove nothing; sizes and counts do).

Usage: python BENCH/dgim_state_r5p11.py  -> writes dgim_state_r5p11.json
"""

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsparkle.sketches.dgim import DgimSketch  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WINDOW_S = 7 * 86_400  # the largest window the exact state must answer
R = 4


def main() -> None:
    rows = duckdb.sql(
        f"SELECT event_type, epoch_us(ts) AS us, event_id "
        f"FROM read_parquet('{SF_DIR}/events.parquet') "
        f"ORDER BY event_type, us, event_id"
    ).fetchall()
    mx = max(r[1] for r in rows)
    cutoff = mx - WINDOW_S * 1_000_000

    per_key: dict = {}
    for key, us, _eid in rows:
        per_key.setdefault(key, []).append(us)

    out = {"sf_dir": SF_DIR, "window_s": WINDOW_S, "r": R, "keys": {}}
    tot_exact = tot_dgim = 0
    for key, ts in per_key.items():
        sk = DgimSketch(r=R)
        sk.update_batch(ts)
        exact_events = sum(1 for t in ts if t > cutoff)
        exact_bytes = exact_events * 16  # (ts,id) int64 pair, pre-overhead
        dgim_bytes = sk.n_buckets * 16  # (size,ts) int64 pair
        est2, oldest = sk.estimate2(cutoff)
        tot_exact += exact_bytes
        tot_dgim += dgim_bytes
        out["keys"][key] = {
            "n_seen": sk.n_seen,
            "exact_window_events": exact_events,
            "exact_state_bytes": exact_bytes,
            "dgim_buckets": sk.n_buckets,
            "dgim_state_bytes": dgim_bytes,
            "state_ratio": round(exact_bytes / dgim_bytes, 1),
            "est": est2 / 2,
            "true": exact_events,
            "rel_err": round(abs(est2 / 2 - exact_events) / exact_events, 4)
            if exact_events
            else 0.0,
            "bound_ok": (2 - oldest) <= (2 * exact_events - est2) <= oldest,
        }
    out["total_exact_state_bytes"] = tot_exact
    out["total_dgim_state_bytes"] = tot_dgim
    out["total_state_ratio"] = round(tot_exact / tot_dgim, 1)
    # the scale story: state is O(r log n) per key — at 10^12 events/key the
    # bucket count grows to ~r*40, not to the window's event count
    sk12 = R * (10**12).bit_length() * 16
    out["projected_dgim_bytes_per_key_at_1e12_events"] = sk12
    path = os.path.join(os.path.dirname(__file__), "dgim_state_r5p11.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "keys"}))


if __name__ == "__main__":
    main()
