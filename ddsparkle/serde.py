"""Sketch serialization: Spark struct rows (the shuffle format) and the
reference's flag/varint binary stream (the cross-process interop + checkpoint
format).

Struct rows lift the sketch state into native Spark types so Arrow ships it
between JVM and Python with no custom code: mapping identity scalars + two
(index[], count[]) array pairs + zero count + exact summary stats. This is the
protobuf sparse layout (``DDSketch.proto:58-60``) in columnar form.

The binary codec replicates the reference's flag/varint streaming format
(``DDSketch.java:418-496``, ``Flag.java:40-153``, ``BinEncodingHelper``):

- flag byte = 2-bit type (SKETCH_FEATURES=0, POSITIVE_STORE=1,
  INDEX_MAPPING=2, NEGATIVE_STORE=3) | (subflag << 2);
- index mapping block: layout flag (LOG=0, LOG_LINEAR=1, LOG_QUADRATIC=2,
  LOG_CUBIC=3, LOG_QUARTIC=4 as subflag) + gamma + indexOffset as float64 LE
  (``LogLikeIndexMapping.java:179-183``);
- zero count: SKETCH_FEATURES subflag 1 + varDouble;
- exact stats: COUNT(0x28 marker)+varDouble, SUM(0x21)/MIN(0x22)/MAX(0x23)
  + fixed float64 LE (``DDSketchWithExactSummaryStatistics.java:89-105``);
- store blocks per BinEncodingMode: INDEX_DELTAS_AND_COUNTS(1) = varint
  numBins + per-bin zig-zag index delta + varDouble count;
  CONTIGUOUS_COUNTS(3) = varint numBins + zig-zag start + zig-zag delta(=1) +
  varDouble counts (``Store.java:168-207``, ``DenseStore.java:332-392``);
  the smaller of the two encodings is picked by exact size precomputation,
  like ``DenseStore.encode``.

Decoding *merges into* the target state, so the concatenation of two encoded
sketches decodes to their merge (``DDSketchTest.java:291-315``) — the property
our tree-reduce relies on.
"""

from __future__ import annotations

import math
import struct
from typing import Iterable, Optional

import numpy as np

from .mapping import IndexMapping, mapping_from_kind
from .sketch import DDSketch, ExactSummaryStatistics
from .store import BucketStore

__all__ = [
    "sketch_to_row",
    "row_to_sketch",
    "merge_rows",
    "encode_sketch",
    "decode_sketch",
    "spark_sketch_schema",
    "SKETCH_ROW_FIELDS",
]

# ---------------------------------------------------------------------------
# Struct-row format (Spark/Arrow shuffle + at-rest)
# ---------------------------------------------------------------------------

SKETCH_ROW_FIELDS = [
    "mapping_kind",
    "gamma",
    "index_offset",
    "store_policy",
    "max_bins",
    "zero_count",
    "neg_idx",
    "neg_cnt",
    "pos_idx",
    "pos_cnt",
    "stat_count",
    "stat_sum",
    "stat_sum_comp",
    "stat_simple_sum",
    "stat_min",
    "stat_max",
    "has_exact",
]


def spark_sketch_schema():
    """StructType for sketch rows (pyspark imported lazily)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("mapping_kind", T.StringType()),
            T.StructField("gamma", T.DoubleType()),
            T.StructField("index_offset", T.DoubleType()),
            T.StructField("store_policy", T.StringType()),
            T.StructField("max_bins", T.IntegerType()),
            T.StructField("zero_count", T.DoubleType()),
            T.StructField("neg_idx", T.ArrayType(T.LongType())),
            T.StructField("neg_cnt", T.ArrayType(T.DoubleType())),
            T.StructField("pos_idx", T.ArrayType(T.LongType())),
            T.StructField("pos_cnt", T.ArrayType(T.DoubleType())),
            T.StructField("stat_count", T.DoubleType()),
            T.StructField("stat_sum", T.DoubleType()),
            T.StructField("stat_sum_comp", T.DoubleType()),
            T.StructField("stat_simple_sum", T.DoubleType()),
            T.StructField("stat_min", T.DoubleType()),
            T.StructField("stat_max", T.DoubleType()),
            T.StructField("has_exact", T.BooleanType()),
        ]
    )


def sketch_to_row(sk: DDSketch) -> dict:
    st = sk.exact_stats
    return {
        "mapping_kind": sk.mapping.kind,
        "gamma": sk.mapping.gamma,
        "index_offset": sk.mapping.index_offset,
        "store_policy": sk.store_policy,
        "max_bins": int(sk.max_bins),
        "zero_count": float(sk.zero_count),
        "neg_idx": sk.negative_store.indexes,
        "neg_cnt": sk.negative_store.counts,
        "pos_idx": sk.positive_store.indexes,
        "pos_cnt": sk.positive_store.counts,
        "stat_count": 0.0 if st is None else st.count,
        "stat_sum": 0.0 if st is None else st.sum,
        "stat_sum_comp": 0.0 if st is None else st.sum_compensation,
        "stat_simple_sum": 0.0 if st is None else st.simple_sum,
        "stat_min": math.inf if st is None else st.min,
        "stat_max": -math.inf if st is None else st.max,
        "has_exact": st is not None,
    }


def row_to_sketch(row) -> DDSketch:
    """Rebuild a sketch from a struct row (dict / pandas row / Spark Row)."""
    get = row.__getitem__
    mapping = mapping_from_kind(get("mapping_kind"), get("gamma"), get("index_offset"))
    sk = DDSketch(
        mapping=mapping,
        store_policy=get("store_policy"),
        max_bins=int(get("max_bins")),
        track_exact_stats=bool(get("has_exact")),
    )
    sk.zero_count = float(get("zero_count"))
    sk.negative_store = BucketStore(
        sk.store_policy,
        sk.max_bins,
        np.asarray(get("neg_idx"), np.int64),
        np.asarray(get("neg_cnt"), np.float64),
    )
    sk.positive_store = BucketStore(
        sk.store_policy,
        sk.max_bins,
        np.asarray(get("pos_idx"), np.int64),
        np.asarray(get("pos_cnt"), np.float64),
    )
    if get("has_exact"):
        sk.exact_stats = ExactSummaryStatistics(
            count=float(get("stat_count")),
            sum=float(get("stat_sum")),
            sum_compensation=float(get("stat_sum_comp")),
            simple_sum=float(get("stat_simple_sum")),
            min=float(get("stat_min")),
            max=float(get("stat_max")),
        )
    return sk


def merge_rows(rows: Iterable) -> Optional[DDSketch]:
    """Fold struct rows into one sketch (order-insensitive); None if empty."""
    acc: Optional[DDSketch] = None
    for row in rows:
        sk = row_to_sketch(row)
        if acc is None:
            acc = sk
        else:
            acc.merge(sk)
    return acc


# ---------------------------------------------------------------------------
# Binary flag/varint codec
# ---------------------------------------------------------------------------

_TYPE_SKETCH_FEATURES = 0
_TYPE_POSITIVE_STORE = 1
_TYPE_INDEX_MAPPING = 2
_TYPE_NEGATIVE_STORE = 3

_FLAG_ZERO_COUNT = _TYPE_SKETCH_FEATURES | (1 << 2)
_FLAG_COUNT = _TYPE_SKETCH_FEATURES | (0x28 << 2) & 0xFF
_FLAG_SUM = _TYPE_SKETCH_FEATURES | (0x21 << 2) & 0xFF
_FLAG_MIN = _TYPE_SKETCH_FEATURES | (0x22 << 2) & 0xFF
_FLAG_MAX = _TYPE_SKETCH_FEATURES | (0x23 << 2) & 0xFF

_MODE_INDEX_DELTAS_AND_COUNTS = 1
_MODE_INDEX_DELTAS = 2
_MODE_CONTIGUOUS_COUNTS = 3

_LAYOUT_BY_KIND = {"log": 0, "lin": 1, "quad": 2, "cubic": 3, "quartic": 4, "bitwise": 1}
_KIND_BY_LAYOUT = {v: k for k, v in _LAYOUT_BY_KIND.items() if k != "bitwise"}

_ONE_BITS = struct.unpack("<q", struct.pack("<d", 1.0))[0]
_U64 = (1 << 64) - 1


def _encode_uvarint(out: bytearray, value: int) -> None:
    value &= _U64
    length = (63 - _n_leading_zeros(value)) // 7
    for i in range(min(length, 8)):
        out.append((value | 0x80) & 0xFF)
        value >>= 7
    out.append(value & 0xFF)


def _n_leading_zeros(v: int) -> int:
    return 64 - v.bit_length() if v else 64


def _decode_uvarint(buf: memoryview, pos: int) -> tuple[int, int]:
    value = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        if b < 0x80 or shift == 56:
            return (value | (b << shift)) & _U64, pos
        value |= (b & 0x7F) << shift
        shift += 7


def _zigzag(value: int) -> int:
    return ((value >> 63) ^ (value << 1)) & _U64 if value < 0 else (value << 1) & _U64


def _unzigzag(value: int) -> int:
    res = (value >> 1) ^ -(value & 1)
    if res >= 1 << 63:
        res -= 1 << 64
    return res


def _encode_svarint(out: bytearray, value: int) -> None:
    _encode_uvarint(out, _zigzag(value))


def _decode_svarint(buf: memoryview, pos: int) -> tuple[int, int]:
    v, pos = _decode_uvarint(buf, pos)
    return _unzigzag(v), pos


def _double_to_var_bits(value: float) -> int:
    bits = (struct.unpack("<q", struct.pack("<d", value + 1.0))[0] - _ONE_BITS) & _U64
    return ((bits << 6) | (bits >> 58)) & _U64  # rotl 6


def _var_bits_to_double(bits: int) -> float:
    bits = ((bits >> 6) | (bits << 58)) & _U64  # rotr 6
    raw = (bits + _ONE_BITS) & _U64
    if raw >= 1 << 63:
        raw -= 1 << 64
    return struct.unpack("<d", struct.pack("<q", raw))[0] - 1.0


def _encode_var_double(out: bytearray, value: float) -> None:
    bits = _double_to_var_bits(value)
    for _ in range(8):
        nxt = (bits >> 57) & 0x7F
        bits = (bits << 7) & _U64
        if bits == 0:
            out.append(nxt)
            return
        out.append(nxt | 0x80)
    out.append((bits >> 56) & 0xFF)


def _decode_var_double(buf: memoryview, pos: int) -> tuple[float, int]:
    bits = 0
    shift = 57
    while True:
        b = buf[pos]
        pos += 1
        if shift == 1:
            bits |= b
            break
        if b < 0x80:
            bits |= b << shift
            break
        bits |= (b & 0x7F) << shift
        shift -= 7
    return _var_bits_to_double(bits & _U64), pos


def _uvarint_len(value: int) -> int:
    value &= _U64
    if value == 0:
        return 1
    return min((value.bit_length() + 6) // 7, 9)


def _var_double_len(value: float) -> int:
    bits = _double_to_var_bits(value)
    if bits == 0:
        return 1
    # trailing-zero driven length, as VarEncodingHelper.VAR_DOUBLE_LENGTHS
    tz = (bits & -bits).bit_length() - 1
    return max(1, min(9, (64 - tz + 6) // 7))


def _encode_store(out: bytearray, store: BucketStore, flag_type: int) -> None:
    if store.is_empty():
        return
    idx = store.indexes
    cnt = store.counts
    lo, hi = int(idx[0]), int(idx[-1])
    num_dense = hi - lo + 1
    dense_size = _uvarint_len(num_dense) + _uvarint_len(_zigzag(lo)) + _uvarint_len(_zigzag(1))
    offset_, dense = store.to_dense()
    dense_size += sum(_var_double_len(c) for c in dense)
    sparse_size = 0
    prev = 0
    for i, c in zip(idx.tolist(), cnt.tolist()):
        sparse_size += _uvarint_len(_zigzag(i - prev)) + _var_double_len(c)
        prev = i
    if dense_size <= sparse_size:
        out.append(flag_type | (_MODE_CONTIGUOUS_COUNTS << 2))
        _encode_uvarint(out, num_dense)
        _encode_svarint(out, lo)
        _encode_svarint(out, 1)
        for c in dense.tolist():
            _encode_var_double(out, c)
    else:
        out.append(flag_type | (_MODE_INDEX_DELTAS_AND_COUNTS << 2))
        _encode_uvarint(out, len(idx))
        prev = 0
        for i, c in zip(idx.tolist(), cnt.tolist()):
            _encode_svarint(out, i - prev)
            _encode_var_double(out, c)
            prev = i


def _decode_store_into(store: BucketStore, buf: memoryview, pos: int, mode: int) -> int:
    if mode == _MODE_INDEX_DELTAS_AND_COUNTS:
        num, pos = _decode_uvarint(buf, pos)
        idxs = np.empty(num, np.int64)
        cnts = np.empty(num, np.float64)
        index = 0
        for i in range(num):
            delta, pos = _decode_svarint(buf, pos)
            c, pos = _decode_var_double(buf, pos)
            index += delta
            idxs[i] = index
            cnts[i] = c
        store.add(idxs, cnts)
    elif mode == _MODE_INDEX_DELTAS:
        num, pos = _decode_uvarint(buf, pos)
        idxs = np.empty(num, np.int64)
        index = 0
        for i in range(num):
            delta, pos = _decode_svarint(buf, pos)
            index += delta
            idxs[i] = index
        store.add(idxs)
    elif mode == _MODE_CONTIGUOUS_COUNTS:
        num, pos = _decode_uvarint(buf, pos)
        start, pos = _decode_svarint(buf, pos)
        delta, pos = _decode_svarint(buf, pos)
        cnts = np.empty(num, np.float64)
        for i in range(num):
            c, pos = _decode_var_double(buf, pos)
            cnts[i] = c
        idxs = start + delta * np.arange(num, dtype=np.int64)
        store.add(idxs, cnts)
    else:
        raise ValueError(f"invalid bin encoding mode {mode}")
    return pos


def encode_sketch(sk: DDSketch, omit_index_mapping: bool = False) -> bytes:
    out = bytearray()
    if sk.exact_stats is not None:
        st = sk.exact_stats
        if st.count != 0:
            out.append(_FLAG_COUNT)
            _encode_var_double(out, st.count)
            out.append(_FLAG_MIN)
            out += struct.pack("<d", st.min)
            out.append(_FLAG_MAX)
            out += struct.pack("<d", st.max)
        if st.repaired_sum != 0:
            out.append(_FLAG_SUM)
            out += struct.pack("<d", st.repaired_sum)
    if not omit_index_mapping:
        out.append(_TYPE_INDEX_MAPPING | (_LAYOUT_BY_KIND[sk.mapping.kind] << 2))
        out += struct.pack("<d", sk.mapping.gamma)
        out += struct.pack("<d", sk.mapping.index_offset)
    if sk.zero_count != 0:
        out.append(_FLAG_ZERO_COUNT)
        _encode_var_double(out, sk.zero_count)
    _encode_store(out, sk.positive_store, _TYPE_POSITIVE_STORE)
    _encode_store(out, sk.negative_store, _TYPE_NEGATIVE_STORE)
    return bytes(out)


def decode_sketch(
    data: bytes,
    store_policy: str = "unbounded",
    max_bins: int = 0,
    mapping: Optional[IndexMapping] = None,
    into: Optional[DDSketch] = None,
    track_exact_stats: bool = False,
) -> DDSketch:
    """Decode, merging into ``into`` if given (decode-merges, so decoding the
    concatenation of encodings yields the merge; DDSketch.java:432-496)."""
    buf = memoryview(data)
    pos = 0
    sk = into
    stats = ExactSummaryStatistics() if track_exact_stats or (sk and sk.exact_stats) else None
    saw_stats = False
    # Structural exactness audit state, order-independent: a conformant
    # encode contains exactly one INDEX_MAPPING flag (so mapping flags
    # delimit segments), at most one COUNT flag (emitted iff the segment
    # tracked stats over a nonzero count), and its mass flags (zero/store —
    # omitted when empty, so they always carry mass) after its mapping.
    # Stats flags may sit anywhere (the reference decoder is flag-order
    # independent, DDSketch.java:465-496), so instead of attributing stats
    # to segments positionally we COUNT: if fewer COUNT flags arrived than
    # segments that carried mass, some mass is not described by the stats.
    # omit_index_mapping concatenations collapse into one segment and are
    # undetectable (documented; our own reduce paths use full encodes).
    n_count_flags = 0
    n_mappings = 0
    massy_regions: set[int] = set()
    into_mass_without_stats = (
        into is not None and into.exact_stats is None and not into.is_empty()
    )

    decoded_mapping = into.mapping if into is not None else mapping
    zero_count = 0.0

    # Walk the flag stream; store blocks are decoded into temporary stores and
    # merged at the end, which makes the walk independent of flag order (the
    # reference's state machine allows any order, DDSketch.java:465-496).
    tmp_pos_store = BucketStore(store_policy, max_bins)
    tmp_neg_store = BucketStore(store_policy, max_bins)
    while pos < len(buf):
        marker = buf[pos]
        pos += 1
        ftype = marker & 3
        sub = (marker >> 2) & 0x3F
        if ftype == _TYPE_INDEX_MAPPING:
            gamma = struct.unpack_from("<d", buf, pos)[0]
            index_offset = struct.unpack_from("<d", buf, pos + 8)[0]
            pos += 16
            m = mapping_from_kind(_KIND_BY_LAYOUT[sub], gamma, index_offset)
            if decoded_mapping is not None and m != decoded_mapping:
                raise ValueError("mapping mismatch in encoded stream")
            decoded_mapping = m
            n_mappings += 1
        elif ftype in (_TYPE_POSITIVE_STORE, _TYPE_NEGATIVE_STORE):
            target = tmp_pos_store if ftype == _TYPE_POSITIVE_STORE else tmp_neg_store
            pos = _decode_store_into(target, buf, pos, sub)
            massy_regions.add(max(n_mappings, 1))
        elif marker == _FLAG_ZERO_COUNT:
            zc, pos = _decode_var_double(buf, pos)
            zero_count += zc
            if zc != 0:
                massy_regions.add(max(n_mappings, 1))
        elif marker == _FLAG_COUNT:
            v, pos = _decode_var_double(buf, pos)
            n_count_flags += 1
            if stats is not None:
                stats.count += v
                saw_stats = True
        elif marker == _FLAG_SUM:
            v = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
            if stats is not None:
                stats._add_sum(v)
                saw_stats = True
        elif marker == _FLAG_MIN:
            v = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
            if stats is not None:
                stats.min = min(stats.min, v)
                saw_stats = True
        elif marker == _FLAG_MAX:
            v = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
            if stats is not None:
                stats.max = max(stats.max, v)
                saw_stats = True
        else:
            raise ValueError(f"invalid flag marker 0x{marker:02x}")

    if sk is None:
        if decoded_mapping is None:
            raise ValueError("The index mapping is missing from the encoded stream.")
        sk = DDSketch(
            mapping=decoded_mapping,
            store_policy=store_policy,
            max_bins=max_bins,
            track_exact_stats=False,
        )
    result = sk
    result.positive_store.merge(tmp_pos_store)
    result.negative_store.merge(tmp_neg_store)
    result.zero_count += zero_count
    if saw_stats and stats is not None:
        if result.exact_stats is not None:
            result.exact_stats.merge(stats)
        else:
            result.exact_stats = stats
            result.track_exact_stats = True
    # Exactness audit (structural, not numeric): if any ingested segment (a
    # concatenated part of the stream, or `into` itself) carried bucket mass
    # without exact-stats flags, the stats no longer describe the whole
    # sketch. A numeric count-vs-bucket-total tolerance would let a small
    # stats-less segment hide inside a huge sketch (e.g. 100 rows appended
    # to a 1e9-count sketch) and leave quantiles clamped to a stale
    # [min, max]; the COUNT-flags-vs-massy-segments counting above catches
    # any such segment exactly, regardless of flag order within a segment.
    # Mirrors DDSketch.merge dropping exactness when one side lacks stats —
    # the reference *raises* in this situation
    # (DDSketchWithExactSummaryStatistics.java:121-125); we degrade
    # gracefully to a stats-less sketch.
    if result.exact_stats is not None and (
        into_mass_without_stats or n_count_flags < len(massy_regions)
    ):
        result.exact_stats = None
        result.track_exact_stats = False
    # Complementary numeric audit: omit_index_mapping concatenations add no
    # mapping flag, so a stats-less appended segment is structurally
    # invisible (one region, one COUNT flag) — but its mass shows up as a
    # count/bucket-total divergence. The two checks together cover both the
    # hidden-small-segment case (structural) and the hidden-omit-mapping
    # case (numeric, above its tolerance).
    if result.exact_stats is not None:
        bucket_total = (
            result.zero_count
            + result.negative_store.total_count
            + result.positive_store.total_count
        )
        if abs(result.exact_stats.count - bucket_total) > 1e-6 * max(bucket_total, 1.0):
            result.exact_stats = None
            result.track_exact_stats = False
    return result
