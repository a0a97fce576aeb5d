"""Hand-rolled protobuf wire-format serializer for sketches, mirroring the
reference's dependency-free ``Serializer.java:17-140`` /
``DDSketch.serialize()`` against the public schema ``DDSketch.proto:17-69``:

    DDSketch      { IndexMapping mapping = 1; Store positiveValues = 2;
                    Store negativeValues = 3; double zeroCount = 4; }
    IndexMapping  { double gamma = 1; double indexOffset = 2;
                    Interpolation interpolation = 3; }   // NONE..QUARTIC
    Store         { map<sint32, double> binCounts = 1;
                    repeated double contiguousBinCounts = 2 [packed = true];
                    sint32 contiguousBinIndexOffset = 3; }

Like ``StoreProtoBinding`` (dense path ``:32-43``, fromProto ``:53-62``),
dense-ish stores emit the contiguous encoding, sparse ones the map encoding,
and a decoder must SUM both if present. Fields are emitted in ascending field
order; any conforming protobuf parser accepts the output.
"""

from __future__ import annotations

import struct

import numpy as np

from .mapping import mapping_from_kind
from .sketch import DDSketch
from .store import BucketStore

__all__ = ["to_proto_bytes", "from_proto_bytes"]

_INTERP_BY_KIND = {"log": 0, "lin": 1, "quad": 2, "cubic": 3, "quartic": 4, "bitwise": 1}
_KIND_BY_INTERP = {v: k for k, v in _INTERP_BY_KIND.items() if k != "bitwise"}


def _varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _zigzag32(v: int) -> int:
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _key(out: bytearray, field: int, wire: int) -> None:
    _varint(out, (field << 3) | wire)


def _double_field(out: bytearray, field: int, value: float) -> None:
    if value != 0.0:
        _key(out, field, 1)
        out += struct.pack("<d", value)


def _len_field(out: bytearray, field: int, payload: bytes) -> None:
    _key(out, field, 2)
    _varint(out, len(payload))
    out += payload


def _store_bytes(store: BucketStore) -> bytes:
    out = bytearray()
    if store.is_empty():
        return bytes(out)
    span = store.max_index - store.min_index + 1
    if span <= 2 * store.indexes.size:  # dense-ish -> contiguous encoding
        offset, dense = store.to_dense()
        payload = dense.astype("<f8").tobytes()
        _len_field(out, 2, payload)  # contiguousBinCounts, packed
        if offset != 0:
            _key(out, 3, 0)
            _varint(out, _zigzag32(offset))  # contiguousBinIndexOffset sint32
    else:  # sparse -> binCounts map entries
        for i, c in zip(store.indexes.tolist(), store.counts.tolist()):
            entry = bytearray()
            _key(entry, 1, 0)
            _varint(entry, _zigzag32(int(i)))
            _key(entry, 2, 1)
            entry += struct.pack("<d", c)
            _len_field(out, 1, bytes(entry))
    return bytes(out)


def to_proto_bytes(sk: DDSketch) -> bytes:
    out = bytearray()
    mapping = bytearray()
    _double_field(mapping, 1, sk.mapping.gamma)
    _double_field(mapping, 2, sk.mapping.index_offset)
    interp = _INTERP_BY_KIND[sk.mapping.kind]
    if interp:
        _key(mapping, 3, 0)
        _varint(mapping, interp)
    _len_field(out, 1, bytes(mapping))
    _len_field(out, 2, _store_bytes(sk.positive_store))
    _len_field(out, 3, _store_bytes(sk.negative_store))
    _double_field(out, 4, sk.zero_count)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def _walk(buf: memoryview):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, bytes(buf[pos : pos + ln])
            pos += ln
        elif wire == 5:
            yield field, wire, struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_store(payload: bytes, policy: str, max_bins: int) -> BucketStore:
    store = BucketStore(policy, max_bins)
    contiguous: list[float] = []
    offset = 0
    sparse_idx: list[int] = []
    sparse_cnt: list[float] = []
    for field, wire, value in _walk(memoryview(payload)):
        if field == 1 and wire == 2:  # map entry
            # proto3 map entries may omit default-valued fields: a missing
            # key means index 0, a missing value means count 0
            k, c = 0, 0.0
            for f2, w2, v2 in _walk(memoryview(value)):
                if f2 == 1:
                    k = _unzigzag(v2)
                elif f2 == 2:
                    c = v2
            if c:
                sparse_idx.append(k)
                sparse_cnt.append(c)
        elif field == 2 and wire == 2:  # packed doubles
            contiguous.extend(np.frombuffer(value, "<f8").tolist())
        elif field == 2 and wire == 1:  # unpacked double (legal encoding)
            contiguous.append(value)
        elif field == 3 and wire == 0:
            offset = _unzigzag(value)
    # sum sparse + contiguous like StoreProtoBinding.fromProto:53-62
    if contiguous:
        arr = np.asarray(contiguous)
        nz = np.nonzero(arr)[0]
        store.add((nz + offset).astype(np.int64), arr[nz])
    if sparse_idx:
        store.add(np.asarray(sparse_idx, np.int64), np.asarray(sparse_cnt))
    return store


def from_proto_bytes(
    data: bytes, store_policy: str = "unbounded", max_bins: int = 0
) -> DDSketch:
    gamma = index_offset = 0.0
    interp = 0
    pos_payload = neg_payload = b""
    zero_count = 0.0
    for field, wire, value in _walk(memoryview(data)):
        if field == 1 and wire == 2:
            for f2, w2, v2 in _walk(memoryview(value)):
                if f2 == 1:
                    gamma = v2
                elif f2 == 2:
                    index_offset = v2
                elif f2 == 3:
                    interp = v2
        elif field == 2 and wire == 2:
            pos_payload = value
        elif field == 3 and wire == 2:
            neg_payload = value
        elif field == 4 and wire == 1:
            zero_count = value
    mapping = mapping_from_kind(_KIND_BY_INTERP[interp], gamma, index_offset)
    sk = DDSketch(
        mapping=mapping, store_policy=store_policy, max_bins=max_bins, track_exact_stats=False
    )
    sk.positive_store = _decode_store(pos_payload, store_policy, max_bins)
    sk.negative_store = _decode_store(neg_payload, store_policy, max_bins)
    sk.zero_count = zero_count
    return sk
