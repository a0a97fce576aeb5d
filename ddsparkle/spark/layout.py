"""Multi-column data-layout optimization: z-order (Morton) clustering keys
and a z-ordered parquet writer.

Brief-driven 100-TB pipeline tooling (the reference repo,
DataDog/sketches-java, is a sketch library with no storage layer): a table
queried by box predicates on two or three columns — (user_id, day),
(conv_id bucket, ts) — prunes poorly when written in arrival or single-key
order, because every parquet row group then spans the full range of the
second column. Writing in z-order interleaves the key bits so each row
group covers a small RECTANGLE of the key space and min/max row-group
statistics prune on every queried dimension at once. This is the standard
lakehouse `OPTIMIZE ... ZORDER BY` verb re-expressed as plain DataFrame
ops: a pure-Catalyst integer key (:func:`zorder_key`) + one range
repartition + a partition-local sort (:func:`zorder_write`).

Everything is exact integer arithmetic — min/max normalization by integer
step division, bit spreading by shift/mask — so the key is engine-portable
bit-for-bit (DuckDB twin: ``oracle.zorder_key_sql`` replays the same
shifts and masks on BIGINT) and deterministic under any partitioning.

Scale notes: key computation is row-local (zero shuffle) after one cheap
global min/max agg per column (a single scan-reduce; pass explicit
``ranges`` to skip it, e.g. from table metadata). The write is ONE range
exchange on the key — the same shuffle any global sort pays — and range
partitioning keeps output files balanced even when the key space is
skewed, because boundaries come from sampled quantiles, not fixed bit
prefixes. Readers need nothing special: engines prune on parquet row-group
stats automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["zorder_key", "zorder_write", "rowgroup_stats"]

# part1by1: spread the low 32 bits of x to the even bit positions of a
# 64-bit word (classic Morton magic numbers). Signed-long safe: inputs are
# < 2^32, every mask < 2^63, and the final key of k interleaved b-bit
# values occupies k*b < 63 bits.
_SPREAD1 = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
# part1by2: spread the low 21 bits of x to every third bit position.
_SPREAD2 = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def _spread(col, table):
    for shift, mask in table:
        col = (col.bitwiseOR(F.shiftleft(col, shift))).bitwiseAND(F.lit(mask))
    return col


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[int, int]] | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a z-order (Morton) key column interleaving 2 or 3 integer
    columns, each normalized to ``bits`` bits.

    Normalization is exact integer arithmetic: per column,
    ``step = ((max - min) DIV 2^bits) + 1``, ``mult = 1`` when the range
    exceeds ``2^bits`` else ``2^bits DIV (range + 1)``, and
    ``scaled = ((v - min) DIV step) * mult`` — ``scaled`` always fits in
    ``bits`` bits, nothing overflows int64 (the multiply only fires when
    the range is narrower than ``2^bits``), and the identical expression
    exists in DuckDB (``//``). The ``mult`` branch matters: a narrow
    column (15 distinct users against a 10^6-second time range) must be
    STRETCHED to fill its bit width, or its interleaved bits are all zero
    high bits and the "z-order" silently degenerates to a sort on the wide
    column alone. NULLs scale to slot 0 (they sort first, like a NULLS
    FIRST layout sort).

    ``ranges`` maps column -> (min, max); omitted columns trigger ONE
    global agg over the frame (a single scan-reduce collected to the
    driver — at scale pass the known ranges instead). The two-column key
    uses part1by1 spreading (2*bits <= 62), three columns part1by2
    (3*bits <= 62, bits <= 20).

    Bit interleaving: column i's scaled value occupies bit positions
    ``{i + k*len(cols)}`` — column 0 in the LOW bit, so equal-prefix runs
    of the key are axis-aligned rectangles of the (scaled) key space.
    """
    if len(cols) == 2:
        table, stride = _SPREAD1, 2
        if bits < 1 or bits > 31:
            raise ValueError("2-column z-order needs 1 <= bits <= 31")
    elif len(cols) == 3:
        table, stride = _SPREAD2, 3
        if bits < 1 or bits > 20:
            raise ValueError("3-column z-order needs 1 <= bits <= 20")
    else:
        raise ValueError("z-order interleaves exactly 2 or 3 columns")
    ranges = dict(ranges or {})
    missing = [c for c in cols if c not in ranges]
    if missing:
        row = df.select(
            *[F.min(F.col(c).cast("long")).alias(f"mn_{c}") for c in missing],
            *[F.max(F.col(c).cast("long")).alias(f"mx_{c}") for c in missing],
        ).collect()[0]
        for c in missing:
            ranges[c] = (row[f"mn_{c}"], row[f"mx_{c}"])
    key = None
    for i, c in enumerate(cols):
        mn, mx = ranges[c]
        if mn is None or mx is None:
            raise ValueError(f"column {c} has no non-NULL values")
        rng = int(mx) - int(mn)
        step = (rng >> bits) + 1
        mult = 1 if rng >= (1 << bits) else (1 << bits) // (rng + 1)
        scaled = F.expr(
            f"((coalesce(cast({c} as bigint), {int(mn)}) - {int(mn)}) "
            f"div {step}) * {mult}"
        )
        part = F.shiftleft(_spread(scaled, table), i)
        key = part if key is None else key.bitwiseOR(part)
    return df.withColumn(key_col, key)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[int, int]] | None = None,
    num_files: int | None = None,
    block_size: int = 8 * 1024 * 1024,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered in z-order on ``cols``.

    One range exchange on the Morton key (sampled-quantile boundaries, so
    skewed key populations still yield balanced files) + a partition-local
    sort, then the key column is dropped — layout is a storage property,
    not a schema change. ``block_size`` bounds parquet row groups so a hot
    key range stays splittable (CLAUDE.md scan-skew note; the default 8 MB
    matches the bench writers)."""
    keyed = zorder_key(df, cols, bits=bits, ranges=ranges, key_col="__zkey")
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "__zkey")
    else:
        keyed = keyed.repartitionByRange("__zkey")
    (
        keyed.sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .option("parquet.block.size", block_size)
        .parquet(path)
    )


def rowgroup_stats(path: str, cols: list[str]):
    """Per-row-group (min, max) statistics for ``cols`` across every
    parquet file under ``path`` — the pruning surface a reader's box
    predicate sees. Driver-local metadata read (footer only, no data
    pages); returns a list of dicts with ``file``, ``n_rows`` and
    ``{col}_min`` / ``{col}_max``."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            row = {"file": os.path.basename(f), "n_rows": rg.num_rows}
            for c in cols:
                st = rg.column(idx[c]).statistics
                row[f"{c}_min"] = None if st is None else st.min
                row[f"{c}_max"] = None if st is None else st.max
            out.append(row)
    return out
