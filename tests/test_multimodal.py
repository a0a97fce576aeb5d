"""Multimodal plumbing tests: schema, Arrow batch shapes, deterministic fake
decode path, stub behavior without fake."""

import numpy as np
import pytest

from ddsparkle.spark.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    image_features,
    media_schema,
)

pytestmark = pytest.mark.spark


def test_decoders_stubbed_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 10, 2, 2)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 10)


def test_fake_decode_deterministic():
    a = decode_image(b"hello world", 4, 3, fake=True)
    b = decode_image(b"hello world", 4, 3, fake=True)
    assert a.shape == (3, 4, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    w = decode_audio(bytes(range(256)), fake=True)
    assert w.min() >= -1.0 and w.max() <= 1.0


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(20):
        payload = bytes(rng.integers(0, 256, 200, dtype=np.uint8).tolist())
        rows.append((i, "image", bytearray(payload), "image/fake", 16, 12, None))
    for i in range(20, 30):
        payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8).tolist())
        rows.append((i, "audio", bytearray(payload), "audio/fake", None, None, 1000))
    return spark.createDataFrame(rows, schema=media_schema())


def test_image_feature_pipeline(spark, media_df):
    out = image_features(media_df, fake=True, resize_to=4).toPandas()
    assert len(out) == 20
    assert set(out.columns) == {"media_id", "mean_r", "mean_g", "mean_b", "std_lum", "thumb"}
    assert all(len(t) == 16 for t in out["thumb"])  # 4x4 raster
    assert ((out[["mean_r", "mean_g", "mean_b"]] >= 0) & (out[["mean_r", "mean_g", "mean_b"]] <= 255)).all().all()
    # deterministic across partitionings
    again = image_features(media_df.repartition(5), fake=True, resize_to=4).toPandas()
    merged = out.sort_values("media_id").reset_index(drop=True)
    again = again.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(merged["std_lum"], again["std_lum"])


def test_audio_feature_pipeline(spark, media_df):
    out = audio_features(media_df, fake=True, n_frames=8).toPandas()
    assert len(out) == 10
    assert all(len(r) == 8 for r in out["rms"])
    assert (out["peak"] <= 1.0).all()
