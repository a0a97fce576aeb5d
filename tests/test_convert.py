"""Conversion tests: count conservation, degraded-accuracy bound
((1+ai)(1+ao)/(1-ai) - 1), cross-mapping matrix, sign handling."""

import math

import numpy as np
import pytest

from ddsparkle import (
    CubicallyInterpolatedMapping,
    LogarithmicMapping,
    QuadraticallyInterpolatedMapping,
)
from ddsparkle.convert import convert_sketch, converted_relative_accuracy
from ddsparkle.sketch import DDSketch


def rank_err(sorted_vals, q, actual):
    n = len(sorted_vals)
    lo = sorted_vals[int(math.floor(q * (n - 1)))]
    hi = sorted_vals[int(math.ceil(q * (n - 1)))]
    if lo <= actual <= hi:
        return 0.0
    if actual < lo:
        return (lo - actual) / abs(lo) if lo else math.inf
    return (actual - hi) / abs(hi) if hi else math.inf


MAPPINGS = [LogarithmicMapping, CubicallyInterpolatedMapping, QuadraticallyInterpolatedMapping]


@pytest.mark.parametrize("in_cls", MAPPINGS)
@pytest.mark.parametrize("out_cls", MAPPINGS)
def test_convert_matrix(in_cls, out_cls):
    rng = np.random.default_rng(5)
    values = rng.lognormal(4.0, 1.5, 30000)
    src = DDSketch(mapping=in_cls.from_relative_accuracy(0.02), track_exact_stats=False)
    src.accept(values)
    dst = convert_sketch(src, out_cls.from_relative_accuracy(0.01))
    # count conserved exactly (up to float sum tolerance)
    assert dst.count == pytest.approx(src.count, rel=1e-9)
    bound = converted_relative_accuracy(0.02, 0.01) + 1e-10
    srt = np.sort(values)
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        assert rank_err(srt, q, dst.value_at_quantile(q)) <= bound


def test_convert_preserves_signs_and_zero():
    rng = np.random.default_rng(6)
    values = np.concatenate([rng.lognormal(2, 1, 5000), -rng.lognormal(2, 1, 5000), np.zeros(100)])
    src = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01))
    src.accept(values)
    dst = convert_sketch(src, CubicallyInterpolatedMapping.from_relative_accuracy(0.02))
    assert dst.zero_count == 100
    assert dst.count == pytest.approx(src.count, rel=1e-9)
    # exact stats carried over
    assert dst.min == src.min and dst.max == src.max
    srt = np.sort(values)
    bound = converted_relative_accuracy(0.01, 0.02) + 1e-10
    med = dst.value_at_quantile(0.5)
    assert abs(med) <= max(abs(srt[len(srt) // 2 - 1]), 1) * (1 + bound) + 1e-9


def test_convert_empty():
    src = DDSketch(mapping=LogarithmicMapping.from_relative_accuracy(0.01))
    dst = convert_sketch(src, LogarithmicMapping.from_relative_accuracy(0.05))
    assert dst.is_empty()


def test_same_mapping_roundtrip_near_identity():
    """Converting onto the same mapping must keep every count in place (each
    in-bin is exactly one out-bin)."""
    rng = np.random.default_rng(7)
    values = rng.lognormal(3, 1, 10000)
    m = LogarithmicMapping.from_relative_accuracy(0.01)
    src = DDSketch(mapping=m, track_exact_stats=False)
    src.accept(values)
    dst = convert_sketch(src, m)
    assert np.array_equal(dst.positive_store.indexes, src.positive_store.indexes)
    assert np.allclose(dst.positive_store.counts, src.positive_store.counts, rtol=1e-12)


# the Spark-level convert_sketch_rows test lives in test_spark_agg.py
# (needs the session fixture)
