"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partition behavior, feature
row contracts — is real and tested. The media *codecs* are stubbed: this
container has no image/audio libraries, so ``decode_image``/``decode_audio``
raise ``NotImplementedError`` unless ``fake=True`` selects a deterministic
fake decoder (payload bytes -> pseudo-pixels) that exercises the identical
data path. Swapping in PIL/soundfile is a one-function change per modality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "media_schema",
    "decode_image",
    "decode_audio",
    "decode_video_frames",
    "image_features",
    "audio_features",
    "video_features",
    "image_dhash",
    "image_near_dup_pairs",
]


def media_schema():
    """Canonical multimodal table schema: id + opaque payload + typed
    metadata (the shape a 100 TB media lake table should have — metadata
    columns enable pruning without touching payloads)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),  # image|audio|video
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]
    )


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """payload -> (height, width, 3) uint8 array.

    STUB: real decoding needs an image library not present in this container.
    ``fake=True`` derives deterministic pseudo-pixels from the payload bytes
    so the downstream plumbing (batching, feature extraction, resize) is
    fully exercisable in tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 (not available in this container); "
            "pass fake=True for the deterministic test decoder"
        )
    raw = np.frombuffer(payload, np.uint8)
    if raw.size == 0:  # zero-byte payloads decode to black, not a crash
        raw = np.zeros(1, np.uint8)
    need = width * height * 3
    reps = int(np.ceil(need / raw.size))
    return np.tile(raw, reps)[:need].reshape(height, width, 3)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """payload -> float32 waveform in [-1, 1]. STUB (see decode_image)."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa (not available); "
            "pass fake=True for the deterministic test decoder"
        )
    raw = np.frombuffer(payload, np.uint8).astype(np.float32)
    return (raw - 127.5) / 127.5


def decode_video_frames(
    payload: bytes,
    width: int,
    height: int,
    duration_ms: int,
    n_frames: int = 8,
    fake: bool = False,
) -> np.ndarray:
    """payload -> (n_frames, height, width, 3) uint8 frame sample, evenly
    spaced over the clip (the standard frame-sampling contract: decoders
    seek to n evenly spaced PTS rather than decoding every frame).

    STUB: real decoding needs pyav/ffmpeg (not available in this container).
    ``fake=True`` derives deterministic pseudo-frames: frame f reads the
    payload at a rotation proportional to its timestamp, so consecutive fake
    frames differ smoothly — downstream motion features see a real gradient.
    """
    if not fake:
        raise NotImplementedError(
            "video decoding requires pyav/ffmpeg (not available in this "
            "container); pass fake=True for the deterministic test decoder"
        )
    raw = np.frombuffer(payload, np.uint8)
    if raw.size == 0:  # zero-byte payloads decode to black frames, not a crash
        raw = np.zeros(1, np.uint8)
    need = width * height * 3
    reps = int(np.ceil(need / raw.size))
    tiled = np.tile(raw, reps)[:need]
    frames = np.empty((n_frames, height, width, 3), np.uint8)
    # per-frame rotation step in [1, size-1] so consecutive frames always
    # differ (a duration divisible by the payload size must not collapse
    # every frame onto the same rotation)
    step = (max(duration_ms or 0, 0) % max(raw.size - 1, 1)) + 1
    for f in range(n_frames):
        frames[f] = np.roll(tiled, -(f * step) % raw.size).reshape(
            height, width, 3
        )
    return frames


def image_features(df, fake: bool = True, resize_to: int = 8):
    """Decode -> resize -> per-channel mean/std features, one Arrow batch at
    a time. Returns [media_id, mean_r, mean_g, mean_b, std_lum, thumb
    array<float>] — the thumb column is the resized grayscale raster
    (the embedding-ready output shape)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("std_lum", T.DoubleType()),
            T.StructField("thumb", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "mean_r", "mean_g", "mean_b", "std_lum", "thumb")}
            for _, r in pdf.iterrows():
                if r["payload"] is None:
                    continue
                img = decode_image(bytes(r["payload"]), int(r["width"]), int(r["height"]), fake=fake)
                lum = img.astype(np.float64).mean(axis=2)
                # box-resize to resize_to x resize_to (pure numpy)
                h, w = lum.shape
                ys = (np.arange(resize_to) * h // resize_to).clip(0, h - 1)
                xs = (np.arange(resize_to) * w // resize_to).clip(0, w - 1)
                thumb = lum[np.ix_(ys, xs)].astype(np.float32).ravel()
                rows["media_id"].append(r["media_id"])
                rows["mean_r"].append(float(img[..., 0].mean()))
                rows["mean_g"].append(float(img[..., 1].mean()))
                rows["mean_b"].append(float(img[..., 2].mean()))
                rows["std_lum"].append(float(lum.std()))
                rows["thumb"].append(thumb.tolist())
            yield pd.DataFrame(rows)

    return df.filter("modality = 'image'").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(extract, schema=schema)


def audio_features(df, fake: bool = True, n_frames: int = 16):
    """Decode -> frame-sample -> per-frame RMS energy. Returns
    [media_id, rms array<double>, peak double]. The waveform contract is
    float32; the feature math runs in float64 over those float32 samples so
    results are summation-order stable (and exactly replayable by a SQL
    oracle that casts each sample to FLOAT before squaring in DOUBLE)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("rms", T.ArrayType(T.DoubleType())),
            T.StructField("peak", T.DoubleType()),
        ]
    )

    def extract(batches):
        for pdf in batches:
            rows = {"media_id": [], "rms": [], "peak": []}
            for _, r in pdf.iterrows():
                if r["payload"] is None:
                    continue
                wave = decode_audio(bytes(r["payload"]), fake=fake).astype(np.float64)
                frames = np.array_split(wave, n_frames)
                rows["media_id"].append(r["media_id"])
                rows["rms"].append([float(np.sqrt((f**2).mean())) if f.size else 0.0 for f in frames])
                rows["peak"].append(float(np.abs(wave).max()) if wave.size else 0.0)
            yield pd.DataFrame(rows)

    return df.filter("modality = 'audio'").select("media_id", "payload").mapInPandas(
        extract, schema=schema
    )


def image_dhash(df, fake: bool = True, hash_size: int = 8):
    """64-bit difference hash (dHash) per image — the standard perceptual
    near-dup fingerprint: decode -> grayscale -> box-resize to
    (hash_size, hash_size + 1) -> bit (r, c) = lum[r, c] > lum[r, c + 1],
    packed row-major into bit r*hash_size + c. Visually similar images land
    within small Hamming distance; pair them at scale with
    ``image_near_dup_pairs`` (banded bucket join, never all-pairs).

    Returns [media_id, dhash long] (int64 view of the uint64 bit pattern —
    bit 63 set reads negative, like ``dataops.simhash64``). Uses the same
    stubbed/fake decode contract as ``image_features``: with the real codec
    swapped in, nothing downstream changes.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )
    n = int(hash_size)
    if not 1 <= n * n <= 64:
        raise ValueError("hash_size^2 must fit 64 bits")
    bit_vals = (np.uint64(1) << np.arange(n * n, dtype=np.uint64)).reshape(n, n)

    def extract(batches):
        for pdf in batches:
            ids, hashes = [], []
            for _, r in pdf.iterrows():
                if r["payload"] is None:
                    continue
                img = decode_image(
                    bytes(r["payload"]), int(r["width"]), int(r["height"]), fake=fake
                )
                lum = img.astype(np.float64).mean(axis=2)
                h, w = lum.shape
                ys = (np.arange(n) * h // n).clip(0, h - 1)
                xs = (np.arange(n + 1) * w // (n + 1)).clip(0, w - 1)
                grid = lum[np.ix_(ys, xs)]  # (n, n+1)
                bits = grid[:, :-1] > grid[:, 1:]  # (n, n)
                val = (bits * bit_vals).sum(dtype=np.uint64)
                ids.append(r["media_id"])
                # view, not cast: int64(uint64 with bit 63) raises on numpy>=2
                hashes.append(int(np.uint64(val).view(np.int64)))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return df.filter("modality = 'image'").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(extract, schema=schema)


def image_near_dup_pairs(
    df,
    max_hamming: int = 6,
    bands: int = 8,
    fake: bool = True,
    hash_size: int = 8,
    max_bucket_size=1000,
):
    """Near-duplicate image pairs: dHash fingerprints paired by the banded
    Hamming join (``dataops.hamming_near_dup_pairs`` — candidates from
    bit-band equality buckets, pigeonhole-lossless for
    ``max_hamming < bands``, exact ``bit_count(xor)`` verify). Returns
    [id_a, id_b, hamming double] with id_a < id_b.

    Scale shape: one fingerprint pass over payloads — each image decoded
    ONCE: the hash frame feeds three join sides, so
    ``hamming_near_dup_pairs`` persists it for the call (eager result,
    see its materialization contract) — then only 8-byte hashes move; the
    image-side twin of the text SimHash pipeline, sharing its skew guard
    (``max_bucket_size``: a degenerate band bucket — e.g. monochrome
    thumbnails — cannot go quadratic)."""
    from .dataops import hamming_near_dup_pairs

    dh = image_dhash(df, fake=fake, hash_size=hash_size)
    return hamming_near_dup_pairs(
        dh,
        hash_col="dhash",
        id_col="media_id",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )


def video_features(df, fake: bool = True, n_frames: int = 8, resize_to: int = 8):
    """Decode -> evenly-spaced frame sample -> per-frame luminance means,
    inter-frame motion score (mean |frame diff|), and a middle-frame
    grayscale thumb. Returns [media_id, frame_lum array<float>, motion
    double, thumb array<float>] — the video analogue of image_features,
    matching media_schema's declared video modality (width/height/
    duration_ms metadata drive the decode without touching other columns)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_lum", T.ArrayType(T.DoubleType())),
            T.StructField("motion", T.DoubleType()),
            T.StructField("thumb", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_lum": [], "motion": [], "thumb": []}
            for _, r in pdf.iterrows():
                if r["payload"] is None:
                    continue
                frames = decode_video_frames(
                    bytes(r["payload"]),
                    int(r["width"]),
                    int(r["height"]),
                    int(r["duration_ms"] or 0),
                    n_frames=n_frames,
                    fake=fake,
                )
                lum = frames.astype(np.float64).mean(axis=3)  # (n, h, w)
                rows["media_id"].append(r["media_id"])
                # frame_lum stays float64 so a double-arithmetic SQL oracle
                # can reproduce it bit-stably (thumb remains float32)
                rows["frame_lum"].append(lum.mean(axis=(1, 2)).tolist())
                rows["motion"].append(
                    float(np.abs(np.diff(lum, axis=0)).mean()) if n_frames > 1 else 0.0
                )
                mid = lum[n_frames // 2]
                h, w = mid.shape
                ys = (np.arange(resize_to) * h // resize_to).clip(0, h - 1)
                xs = (np.arange(resize_to) * w // resize_to).clip(0, w - 1)
                rows["thumb"].append(
                    mid[np.ix_(ys, xs)].astype(np.float32).ravel().tolist()
                )
            yield pd.DataFrame(rows)

    return df.filter("modality = 'video'").select(
        "media_id", "payload", "width", "height", "duration_ms"
    ).mapInPandas(extract, schema=schema)
