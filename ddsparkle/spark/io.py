"""Source adapter: Iceberg when the runtime is available, parquet fallback.

The production design (SURVEY.md sections 1.4, 4.2) reads Iceberg tables —
partition pruning, min/max file skipping, and snapshot ids for the
checkpoint/resume key all come from the table format. This sandbox has no
Iceberg runtime jar, so the adapter code-paths are selected at call time and
the parquet fallback carries the same API surface (``snapshot_id`` maps to
Iceberg time travel; it is rejected on plain parquet).
"""

from __future__ import annotations

from typing import Optional

__all__ = ["read_table", "iceberg_available", "source_fingerprint"]


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark, source: str, snapshot_id: Optional[int] = None, fmt: Optional[str] = None):
    """Load ``source`` as a DataFrame.

    fmt: 'iceberg' | 'parquet' | None (auto: iceberg for catalog table names
    when the runtime is present, else parquet paths).
    """
    if fmt is None:
        is_path = source.startswith("/") or source.startswith("file:") or "*" in source
        fmt = "parquet" if is_path or not iceberg_available(spark) else "iceberg"
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source)
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires an Iceberg source")
    return spark.read.parquet(source)


def source_fingerprint(spark, source: str, fmt: Optional[str] = None) -> str:
    """Stable identity of the data read — Iceberg snapshot id when available,
    else the sorted file list hash. Mixed into checkpoint lineage so resume
    detects source changes."""
    import hashlib

    if fmt == "iceberg" or (fmt is None and not source.startswith("/") and iceberg_available(spark)):
        row = spark.sql(f"SELECT snapshot_id FROM {source}.snapshots ORDER BY committed_at DESC LIMIT 1").collect()
        return f"iceberg:{row[0][0]}" if row else "iceberg:empty"
    from pyspark.sql import functions as F

    files = sorted(
        r[0]
        for r in spark.read.parquet(source).select(F.input_file_name()).distinct().collect()
    )
    return "files:" + hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
