"""Checkpoint/resume job tests: kill-and-resume equivalence, idempotence,
lineage metrics, and parity with the direct (uncheckpointed) pipeline.
"""

import glob
import shutil

import pytest

from ddsparkle.config import SketchConfig
from ddsparkle.spark.agg import quantiles
from ddsparkle.spark.jobs import (
    build_with_checkpoint,
    finalize_from_checkpoint,
)

pytestmark = pytest.mark.spark


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


@pytest.fixture(scope="module")
def split_source(spark, tmp_path_factory):
    """events sf0.001 rewritten as multiple parquet files (resume units)."""
    path = str(tmp_path_factory.mktemp("src") / "events")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.repartition(6).write.mode("overwrite").parquet(path)
    return path


CFG = SketchConfig(mapping_kind="log", store_policy="unbounded", max_bins=0)


def test_checkpointed_equals_direct(spark, split_source, workdir):
    ck = f"{workdir}/ck1"
    m = build_with_checkpoint(spark, split_source, "value", ck, config=CFG)
    assert m["files_processed"] == 6 and m["files_already_done"] == 0
    res = finalize_from_checkpoint(spark, ck).collect()[0]
    direct = quantiles(
        spark.read.parquet(split_source), "value", qs=(0.5, 0.95, 0.99), config=CFG
    ).collect()[0]
    for c in ("q50", "q95", "q99", "count", "min", "max"):
        assert res[c] == pytest.approx(direct[c], rel=1e-12)


def test_resume_after_partial_build(spark, split_source, workdir):
    """Simulate a kill: checkpoint only a subset of files, then resume — the
    final sketch must equal the full build."""
    ck = f"{workdir}/ck2"
    files = sorted(glob.glob(f"{split_source}/part-*.parquet"))
    assert len(files) == 6
    # first run sees only half the files (as if the job died midway)
    partial_src = files[:3]
    for f in partial_src:
        build_with_checkpoint(spark, f, "value", ck, config=CFG)
    m1 = build_with_checkpoint(spark, split_source, "value", ck, config=CFG)
    assert m1["files_already_done"] == 3
    assert m1["files_processed"] == 3
    res = finalize_from_checkpoint(spark, ck).collect()[0]
    full_ck = f"{workdir}/ck3"
    build_with_checkpoint(spark, split_source, "value", full_ck, config=CFG)
    ref = finalize_from_checkpoint(spark, full_ck).collect()[0]
    for c in ("q50", "q95", "q99", "count", "min", "max"):
        assert res[c] == pytest.approx(ref[c], rel=1e-12)


def test_rerun_is_noop(spark, split_source, workdir):
    ck = f"{workdir}/ck4"
    build_with_checkpoint(spark, split_source, "value", ck, config=CFG)
    m2 = build_with_checkpoint(spark, split_source, "value", ck, config=CFG)
    assert m2["files_processed"] == 0
    assert m2["files_already_done"] == 6
    res = finalize_from_checkpoint(spark, ck).collect()[0]
    assert res["count"] == 1000.0


def test_lineage_metrics(spark, split_source, workdir):
    ck = f"{workdir}/ck5"
    m = build_with_checkpoint(spark, split_source, "value", ck, config=CFG)
    assert m["rows_ingested"] == 1000.0
    assert m["checkpoint_rows"] == 6  # one sketch row per file (global agg)
    lineage = spark.read.parquet(ck)
    cols = set(lineage.columns)
    assert {"__source_file", "lineage_rows", "lineage_bins", "lineage_bytes"} <= cols
    rows = lineage.collect()
    assert all(r["lineage_bins"] > 0 and r["lineage_bytes"] > 0 for r in rows)
    assert sum(r["lineage_rows"] for r in rows) == 1000.0


def test_grouped_checkpoint(spark, split_source, workdir):
    ck = f"{workdir}/ck6"
    build_with_checkpoint(spark, split_source, "value", ck, by="event_type", config=CFG)
    res = {r["event_type"]: r for r in finalize_from_checkpoint(spark, ck, by="event_type").collect()}
    direct = {
        r["event_type"]: r
        for r in quantiles(
            spark.read.parquet(split_source), "value", by="event_type", qs=(0.5, 0.95, 0.99), config=CFG
        ).collect()
    }
    assert set(res) == set(direct)
    for k in res:
        for c in ("q50", "q95", "q99", "count"):
            assert res[k][c] == pytest.approx(direct[k][c], rel=1e-12)


def test_source_fingerprint_parquet(spark, split_source):
    from ddsparkle.spark.io import iceberg_available, read_table, source_fingerprint

    fp1 = source_fingerprint(spark, split_source)
    fp2 = source_fingerprint(spark, split_source)
    assert fp1 == fp2 and fp1.startswith("files:")
    df = read_table(spark, split_source)
    assert df.count() == 1000
    assert isinstance(iceberg_available(spark), bool)
    with pytest.raises(ValueError):
        read_table(spark, split_source, snapshot_id=123)


def test_jobs_cli_end_to_end(spark, split_source, workdir):
    """The spark-submit entry point end-to-end via its argument surface."""
    import json
    from ddsparkle.spark.jobs import _parser, run_job

    args = _parser().parse_args(
        [
            "--source", split_source,
            "--value-expr", "value",
            "--by", "event_type",
            "--alpha", "0.01",
            "--mapping", "log",
            "--store", "collapsing_lowest",
            "--max-bins", "1024",
            "--quantiles", "0.5,0.99",
            "--checkpoint", f"{workdir}/cli_ck",
            "--output", f"{workdir}/cli_out",
            "--metrics", f"{workdir}/metrics.json",
        ]
    )
    metrics = run_job(args)
    assert metrics["result_rows"] == 5  # five event types
    saved = json.load(open(f"{workdir}/metrics.json"))
    assert saved["rows_ingested"] == 1000.0
    out = spark.read.parquet(f"{workdir}/cli_out")
    assert {"event_type", "q50", "q99", "count"} <= set(out.columns)
