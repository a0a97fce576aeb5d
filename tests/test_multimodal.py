"""Multimodal plumbing tests: schema, Arrow batch shapes, deterministic fake
decode path, stub behavior without fake."""

import numpy as np
import pytest

from ddsparkle.spark.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    decode_video_frames,
    image_features,
    media_schema,
    video_features,
)

pytestmark = pytest.mark.spark


def test_decoders_stubbed_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 10, 2, 2)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 10)
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00" * 10, 2, 2, 1000)


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
    for i in range(30, 38):
        payload = bytes(rng.integers(0, 256, 800, dtype=np.uint8).tolist())
        rows.append((i, "video", bytearray(payload), "video/fake", 16, 12, 4000))
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


def test_video_feature_pipeline(spark, media_df):
    out = video_features(media_df, fake=True, n_frames=6, resize_to=4).toPandas()
    assert len(out) == 8
    assert set(out.columns) == {"media_id", "frame_lum", "motion", "thumb"}
    assert all(len(fl) == 6 for fl in out["frame_lum"])
    assert all(len(t) == 16 for t in out["thumb"])  # 4x4 middle-frame raster
    # fake frames rotate with timestamp, so motion is non-degenerate
    assert (out["motion"] > 0).all()
    # deterministic across partitionings
    again = video_features(media_df.repartition(3), fake=True, n_frames=6, resize_to=4).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(a["motion"], b["motion"])
    assert all(np.allclose(x, y) for x, y in zip(a["frame_lum"], b["frame_lum"]))


def test_fake_video_decode_shape_and_determinism():
    f1 = decode_video_frames(b"payload-bytes", 4, 3, 2000, n_frames=5, fake=True)
    f2 = decode_video_frames(b"payload-bytes", 4, 3, 2000, n_frames=5, fake=True)
    assert f1.shape == (5, 3, 4, 3) and f1.dtype == np.uint8
    assert np.array_equal(f1, f2)
    # consecutive fake frames differ (motion gradient for downstream tests)
    assert not np.array_equal(f1[0], f1[1])


def _ref_dhash(payload, width, height, n=8):
    """Independent dHash recomputation: fake-decode, grayscale, box-resize
    to (n, n+1), row-major bit packing."""
    from ddsparkle.spark.multimodal import decode_image

    lum = decode_image(payload, width, height, fake=True).astype(np.float64).mean(
        axis=2
    )
    h, w = lum.shape
    ys = (np.arange(n) * h // n).clip(0, h - 1)
    xs = (np.arange(n + 1) * w // (n + 1)).clip(0, w - 1)
    g = lum[np.ix_(ys, xs)]
    val = 0
    for r in range(n):
        for c in range(n):
            if g[r, c] > g[r, c + 1]:
                val |= 1 << (r * n + c)
    return int(np.uint64(val).view(np.int64))


def test_image_dhash_matches_reference(spark, media_df):
    from ddsparkle.spark.multimodal import image_dhash

    got = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media_df, fake=True).collect()
    }
    rows = media_df.filter("modality = 'image'").collect()
    assert len(got) == 20
    for r in rows:
        assert got[r["media_id"]] == _ref_dhash(
            bytes(r["payload"]), r["width"], r["height"]
        )
    # partitioning-independent
    again = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media_df.repartition(5), fake=True).collect()
    }
    assert again == got


def test_image_near_dup_pairs_planted_and_guarded(spark):
    """A planted near-identical image (one payload byte changed) pairs with
    its original at small nonzero Hamming distance; an exact copy pairs at
    0; unrelated random images don't pair; the bucket skew guard drops
    degenerate buckets (constant images) instead of going quadratic."""
    from ddsparkle.spark.multimodal import image_near_dup_pairs

    rng = np.random.default_rng(7)
    # deterministic construction: a flat-gray image has all dHash bits 0
    # (strict >); brightening exactly pixel 0's three bytes flips the grid
    # comparisons that sample byte offsets 0-2 — a small, known perturbation
    base = bytes([128] * 300)
    near = bytes([255, 255, 255]) + base[3:]
    rows = [
        (0, "image", bytearray(base), "image/fake", 16, 16, None),
        (1, "image", bytearray(near), "image/fake", 16, 16, None),
        (2, "image", bytearray(base), "image/fake", 16, 16, None),  # exact copy
    ]
    for i in range(3, 23):
        p = bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist())
        rows.append((i, "image", bytearray(p), "image/fake", 16, 16, None))
    df = spark.createDataFrame(rows, schema=media_schema())
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=6, bands=8).collect()
    }
    assert got.get((0, 2)) == 0.0
    assert (0, 1) in got and 0.0 < got[(0, 1)] <= 6.0
    assert got.get((1, 2)) == got[(0, 1)]
    assert all({a, b} <= {0, 1, 2} for a, b in got)

    # skew guard: 40 identical (degenerate) images share every band bucket;
    # a small cap drops the whole bucket from candidate generation
    const_rows = [
        (100 + i, "image", bytearray(base), "image/fake", 16, 16, None)
        for i in range(40)
    ]
    cdf = spark.createDataFrame(const_rows, schema=media_schema())
    assert (
        image_near_dup_pairs(cdf, max_hamming=6, bands=8, max_bucket_size=10).count()
        == 0
    )
    assert (
        image_near_dup_pairs(cdf, max_hamming=6, bands=8, max_bucket_size=None).count()
        == 40 * 39 // 2
    )
