"""Protobuf wire-format tests: round-trips across mappings/stores/
distributions (SerializerTest.java coverage shape), wire-level checks on a
hand-computable sketch, and summing of mixed sparse+contiguous stores."""

import struct

import numpy as np
import pytest

from ddsparkle import CubicallyInterpolatedMapping, DDSketch, LogarithmicMapping
from ddsparkle.proto import from_proto_bytes, to_proto_bytes

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def dists():
    rng = np.random.default_rng(13)
    yield "point", np.full(1000, 42.0)
    yield "uniform", rng.uniform(1, 100, 5000)
    yield "lognormal", rng.lognormal(5, 1.5, 5000)
    yield "sparse_extreme", np.concatenate([rng.uniform(1e-6, 1e-5, 100), rng.uniform(1e6, 1e7, 100)])
    yield "mixed_sign", np.concatenate([rng.normal(0, 100, 3000), np.zeros(10)])


@pytest.mark.parametrize("name,values", list(dists()), ids=[n for n, _ in dists()])
@pytest.mark.parametrize("mapping_cls", [LogarithmicMapping, CubicallyInterpolatedMapping])
def test_proto_roundtrip(name, values, mapping_cls):
    sk = DDSketch(mapping=mapping_cls.from_relative_accuracy(0.01), track_exact_stats=False)
    sk.accept(values)
    back = from_proto_bytes(to_proto_bytes(sk))
    assert back.mapping == sk.mapping
    assert np.allclose(back.values_at_quantiles(QS), sk.values_at_quantiles(QS), rtol=1e-12)
    assert back.count == pytest.approx(sk.count, rel=1e-12)
    assert np.array_equal(back.positive_store.indexes, sk.positive_store.indexes)
    assert np.allclose(back.positive_store.counts, sk.positive_store.counts, rtol=1e-15)


def test_wire_level_minimal_sketch():
    """Hand-verify the wire bytes of a one-value sketch: field 1 = mapping
    message (gamma, indexOffset, interpolation), field 4 = zeroCount."""
    m = LogarithmicMapping.from_relative_accuracy(0.01)
    sk = DDSketch(mapping=m, track_exact_stats=False)
    sk.accept([0.0])  # only a zero count
    data = to_proto_bytes(sk)
    # field 1, wire 2 (mapping message)
    assert data[0] == (1 << 3) | 2
    mlen = data[1]
    mapping_msg = data[2 : 2 + mlen]
    # inside: field 1 wire 1 (gamma double)
    assert mapping_msg[0] == (1 << 3) | 1
    assert struct.unpack_from("<d", mapping_msg, 1)[0] == m.gamma
    # zeroCount: field 4 wire 1 at the tail
    assert data[-9] == (4 << 3) | 1
    assert struct.unpack("<d", data[-8:])[0] == 1.0


def test_mixed_sparse_and_contiguous_summed():
    """A Store carrying both binCounts and contiguousBinCounts decodes to
    their sum (DDSketch.proto:58-60 semantics)."""
    out = bytearray()
    # store message: contiguous [1.0, 2.0] at offset 10 + map entry {10: 3.0}
    store = bytearray()
    store += bytes([(2 << 3) | 2, 16]) + struct.pack("<dd", 1.0, 2.0)
    store += bytes([(3 << 3) | 0, 20])  # zigzag(10) = 20
    entry = bytes([(1 << 3) | 0, 20, (2 << 3) | 1]) + struct.pack("<d", 3.0)
    store += bytes([(1 << 3) | 2, len(entry)]) + entry
    m = LogarithmicMapping.from_relative_accuracy(0.01)
    mapping_msg = bytearray()
    mapping_msg += bytes([(1 << 3) | 1]) + struct.pack("<d", m.gamma)
    out += bytes([(1 << 3) | 2, len(mapping_msg)]) + mapping_msg
    out += bytes([(2 << 3) | 2, len(store)]) + store
    sk = from_proto_bytes(bytes(out))
    assert sk.positive_store.as_dict() == {10: 4.0, 11: 2.0}


def test_sparse_store_encoding_used_for_wide_ranges():
    sk = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01), track_exact_stats=False)
    sk.accept([1e-6, 1e6])  # two far-apart bins -> sparse map encoding
    data = to_proto_bytes(sk)
    back = from_proto_bytes(data)
    assert np.array_equal(back.positive_store.indexes, sk.positive_store.indexes)
    # wire must be compact: no million-entry contiguous array
    assert len(data) < 200
