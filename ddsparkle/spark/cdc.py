"""Change-data-capture operators: snapshot diffing, change-log merge, and
slowly-changing-dimension (type 2) history construction.

Brief-driven 100-TB pipeline tooling (the reference repo,
DataDog/sketches-java, is a sketch library with no table-maintenance
surface): a training-data pipeline re-ingests crawl/transcript snapshots
continuously, and the standard maintenance verbs are "what changed between
snapshot A and B" (:func:`snapshot_diff`), "fold this change log into the
base table" (:func:`apply_changes` — the MERGE INTO core), and "turn a
change log into validity intervals" (:func:`scd2_history`).

All three are pure relational compositions — joins, windows, null-safe
comparisons — so Catalyst keeps them whole-stage-codegen'd and every output
column is deterministic (no floats are created, only carried), which is why
each has a hash-exact DuckDB twin (``oracle.snapshot_diff_sql`` /
``apply_changes_sql`` / ``scd2_history_sql``).

Scale notes: :func:`snapshot_diff` is ONE full-outer shuffle join on the
key — both sides hash-partition once and nothing else moves; with
``hash_compare=True`` wide rows compare via a single 16-byte md5 so the
change columns themselves never inflate the exchange (changed rows are
re-read by the caller if payloads are needed). :func:`apply_changes` is one
key-window over the (small) change log plus one key join against the base —
the base is never windowed or re-sorted. :func:`scd2_history` is one
exchange+sort per key; state per key is O(1) (lag/lead only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["snapshot_diff", "apply_changes", "scd2_history"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    hash_compare: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table.

    Emits one row per key whose presence or compared values changed:
    ``op`` is ``'I'`` (key only in ``new``), ``'D'`` (key only in ``old``)
    or ``'U'`` (present in both, at least one compare column differs,
    NULL-safe); unchanged keys produce no row. ``changed_cols`` is the
    comma-joined (schema-order) list of differing compare columns for
    ``'U'`` rows and ``''`` otherwise, and each compare column ``c`` is
    carried as ``old_c`` / ``new_c``.

    Keys must be unique and non-NULL per side (a snapshot's primary key).
    NULL-vs-value and NULL-vs-NULL compare NULL-safely (``eqNullSafe`` /
    ``IS DISTINCT FROM``), so a column going NULL IS an update.

    With ``hash_compare=True`` the update test is one md5 over all compare
    columns (NULL encoded distinctly from empty), ``changed_cols`` is
    ``'*'`` for updates, and the per-column old/new payloads are omitted —
    the 100-TB shape for wide rows: only keys + 16-byte digests shuffle.

    One full-outer shuffle join on ``keys``; both scans project only
    ``keys + compare_cols`` (or keys + digest), so Catalyst prunes
    everything else at the source.
    """
    if hash_compare:
        digest = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        o = old.select(*keys, digest.alias("__od"), F.lit(1).alias("__o"))
        n = new.select(*keys, digest.alias("__nd"), F.lit(1).alias("__n"))
        j = o.join(n, on=keys, how="full_outer")
        return (
            j.withColumn(
                "op",
                F.when(F.col("__o").isNull(), F.lit("I"))
                .when(F.col("__n").isNull(), F.lit("D"))
                .when(F.col("__od") != F.col("__nd"), F.lit("U")),
            )
            .filter(F.col("op").isNotNull())
            .select(
                *keys,
                "op",
                F.when(F.col("op") == "U", F.lit("*"))
                .otherwise(F.lit(""))
                .alias("changed_cols"),
            )
        )

    o = old.select(
        *keys,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__o"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__n"),
    )
    j = o.join(n, on=keys, how="full_outer")
    differs = [
        ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols
    ]
    any_diff = differs[0]
    for d in differs[1:]:
        any_diff = any_diff | d
    op = (
        F.when(F.col("__o").isNull(), F.lit("I"))
        .when(F.col("__n").isNull(), F.lit("D"))
        .when(any_diff, F.lit("U"))
    )
    # concat_ws skips NULLs (Spark semantics; the DuckDB twin filters
    # explicitly) — each CASE yields the column name or NULL
    changed = F.when(
        op == "U",
        F.concat_ws(
            ",",
            *[
                F.when(
                    ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
                )
                for c in compare_cols
            ],
        ),
    ).otherwise(F.lit(""))
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *keys,
            "op",
            changed.alias("changed_cols"),
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_cols: list[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a change log into a base snapshot (the MERGE INTO core).

    For each key the LATEST change by ``(ts_col, seq_col)`` wins: a delete
    (``op_col == delete_op``) removes the key, anything else upserts
    ``value_cols``. Keys untouched by the log pass through. ``seq_col``
    breaks same-timestamp ties and is required to make the fold
    deterministic whenever timestamps can collide (pass a log offset /
    event id); with ``seq_col=None`` ties must not exist.

    Shuffle shape: ONE window over the change log keyed by ``keys`` (the
    log is the small side — the base is never sorted or windowed), one
    left-anti join base-vs-changed-keys, one union. Both joins hash on the
    same keys, so AQE coalesces them into one exchange per side.

    Returns ``keys + value_cols`` with base column types.
    """
    order = [F.col(ts_col).desc()]
    if seq_col is not None:
        order.append(F.col(seq_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.select(*keys, ts_col, op_col, *([seq_col] if seq_col else []), *value_cols)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    upserts = latest.filter(F.col(op_col) != F.lit(delete_op)).select(
        *keys, *value_cols
    )
    untouched = base.select(*keys, *value_cols).join(
        latest.select(*keys), on=keys, how="left_anti"
    )
    return untouched.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change log.

    Orders each key's changes by ``(ts_col, seq_col)``; with
    ``collapse=True`` (the SCD2 contract) a change is kept only when at
    least one ``attr_cols`` value differs (NULL-safely) from the previous
    kept row — i.e. from the immediately preceding change, which under
    collapse induction equals the last kept row. Each kept row becomes a
    validity interval: ``valid_from_us`` = its timestamp in epoch
    microseconds, ``valid_to_us`` = the next kept row's timestamp (NULL =
    open), ``is_current`` = the interval is open. Epoch-microsecond
    integers, never rendered timestamps, so the DuckDB twin
    (``oracle.scd2_history_sql``) hashes exactly.

    One exchange+sort per key (two window passes over the same
    partitioning — Catalyst reuses the exchange); per-key state is O(1).
    """
    order = [F.col(ts_col).asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    df = changes.select(*keys, ts_col, *([seq_col] if seq_col else []), *attr_cols)
    if collapse:
        keep = F.lit(False)
        for c in attr_cols:
            keep = keep | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        # first row per key: every lag is NULL, eqNullSafe(NULL,x) is
        # false for non-NULL x but TRUE for NULL attrs — force-keep it
        df = (
            df.withColumn(
                "__keep", keep | F.lag(ts_col).over(w).isNull()
            )
            .filter(F.col("__keep"))
            .drop("__keep")
        )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    out = df.select(
        *keys,
        *attr_cols,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w2).cast("timestamp")).alias(
            "valid_to_us"
        ),
    ).withColumn("is_current", F.col("valid_to_us").isNull())
    return out
