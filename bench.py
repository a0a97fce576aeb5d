"""Benchmark: run the headline sketch queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "extra_queries": {...}, "sf": ...}

``value``/``queries`` cover the FIXED headline suite — the same 17 queries
benchmarked since round 1, so round-over-round totals compare the same work.
Queries added in later rounds (approx-family gates, streaming parity, fuzzy
dedup) are timed the same way but reported under ``extra_queries`` /
``extra_total`` so they widen coverage without muddying the trend line.

The per-query timings cover the full pipeline end-to-end: parquet scan ->
Catalyst projection -> sketch aggregation -> collect. Since round 2 the
log-mapping queries aggregate through mode='sql' (pure-Catalyst bucket
hash-agg + window rank walk, zero Python stages); interpolated-mapping and
explicitly-pinned-mode queries still run the Arrow-vectorized kernel path
(mapInPandas build -> sketch-row shuffle -> vectorized finalize).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from ddsparkle.spark.session import get_spark

# the round-1 suite, frozen for comparability (BENCH_r01.json baseline)
HEADLINE = [
    "ddsketch_events_value",
    "ddsketch_events_by_type",
    "ddsketch_events_mixed_sign",
    "ddsketch_events_collapsing_lowest",
    "ddsketch_events_collapsing_highest",
    "ddsketch_lineitem_price_by_flag",
    "ddsketch_events_latency",
    "ddsketch_orders_per_customer",
    "ddsketch_orders_price_by_cust_wide",
    "ddsketch_lineitem_weighted",
    "ddsketch_events_exact_stats",
    "heavy_hitters_event_type",
    "doc_dedup_exact",
    "doc_dedup_representatives",
    "doc_text_quality",
    "doc_token_quantiles",
    "ann_topk_cosine",
]


def _time(fn, spark, sf_dir, errors: dict, name: str) -> float | None:
    """Warm + timed run; a failing query is recorded, not fatal — one broken
    query must not zero out the whole round's benchmark record."""
    try:
        fn(spark, sf_dir).collect()  # warm run: worker pools, footers, JIT
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 4)
    except Exception as exc:  # noqa: BLE001 - record and continue
        errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Partition-count sizing follows data volume, not core count: at sf<=1
    # the shuffles carry KBs of sketch rows, so 8 partitions is right-sized
    # (64 idle reducers cost ~0.2s/query of pure scheduling) and AQE's
    # re-planning overhead exceeds its benefit on sub-second queries. At
    # 100 TB both flip: shuffle partitions scale with input and AQE handles
    # coalescing/skew — which is why get_spark's DEFAULTS keep AQE on and
    # 2x-cores partitions; the bench overrides are the small-data sizing.
    spark = get_spark(
        app_name="ddsparkle-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    errors: dict = {}
    timings = {
        name: t
        for name in HEADLINE
        if (t := _time(queries[name], spark, sf_dir, errors, name)) is not None
    }
    extra = {
        name: t
        for name, fn in queries.items()
        if name not in HEADLINE
        and (t := _time(fn, spark, sf_dir, errors, name)) is not None
    }

    # field ORDER is load-bearing: the driver records only the LAST ~2 KB
    # of stdout, so the headline block (queries/metric/value) must sit at
    # the END of the single JSON line — the extras, which have outgrown
    # 2 KB, come first and truncate harmlessly (r3's headline was lost to
    # exactly this)
    report = {
        "extra_queries": extra,
        "extra_total": round(sum(extra.values()), 4),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries": timings,
        "metric": "ddsketch_query_suite_total_runtime",
        "unit": "sec",
        "value": round(sum(timings.values()), 4),
    }
    if errors:
        report["errors"] = errors
        if any(name in HEADLINE for name in errors):
            # a partial headline total must never read as a speedup
            report["value_incomplete"] = True
        # re-append the WHOLE headline block (queries/metric/unit/value, in
        # that order) so it stays at the line's end even when errors are
        # present — a many-query error dict (~300 chars each) can exceed
        # the driver's ~2 KB stdout tail and must truncate extras/errors,
        # never the headline
        for key in ("queries", "metric", "unit", "value"):
            report[key] = report.pop(key)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
