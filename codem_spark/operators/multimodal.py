"""Multimodal (image/audio/video) column operators.

Engine-new tier: media are opaque ``binary`` columns plus typed metadata
structs, decoded INSIDE Arrow-batched mapInPandas workers so per-media
Python cost is amortized across the executor fleet. Real decode is
implemented from scratch (functions/imagecodec.py — PNG via stdlib zlib +
numpy unfiltering, PPM, BMP; functions/audiocodec.py — PCM WAV per the
RIFF spec; the container has no PIL/cv2/soundfile). ``fake=True`` keeps
the r2/r3 deterministic pseudo-decoder for tests that only exercise
plumbing shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"

#: feature vector layout of decode_image_features(fake=False)
REAL_FEATURE_NAMES = (
    "width", "height", "channels", "mean", "std", "min", "max", "edge_energy",
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Give each row a deterministic fake media payload + metadata struct
    (stand-in for a real WARC media extraction)."""
    payload = F.encode(F.concat(F.lit("IMG:"), F.col(id_col).cast("string")), "UTF-8")
    meta = F.struct(
        (F.pmod(F.col(id_col), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.col(id_col) * 7, F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit("fake").alias("format"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def attach_png_media(df: DataFrame, id_col: str = "doc_id", size: int = 24) -> DataFrame:
    """Give each row a REAL (deterministic) PNG payload, encoded in the
    executors with the from-scratch encoder — the distributed stand-in for
    media bytes pulled out of WARC records."""
    from codem_spark.functions import imagecodec

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def batches(it):
        for pdf in it:
            blobs = []
            for did in pdf[id_col]:
                rng = np.random.default_rng(int(did))
                img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                blobs.append(imagecodec.encode_png(img, filter_type=int(did) % 5))
            out = pdf.copy()
            out["media"] = blobs
            yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, media binary")


def _real_features(payload: bytes) -> np.ndarray:
    from codem_spark.functions import imagecodec

    img, _fmt = imagecodec.decode_image(bytes(payload))
    h, w, ch = img.shape
    fimg = img.astype(np.float64)
    gray = fimg.mean(axis=2)
    # mean absolute gradient — a cheap sharpness/edge-energy proxy
    gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    return np.array(
        [w, h, ch, fimg.mean(), fimg.std(), fimg.min(), fimg.max(), 0.5 * (gx + gy)]
    )


def decode_image_features(
    df: DataFrame, media_col: str = "media", fake: bool = False, n_features: int = 8
) -> DataFrame:
    """binary -> fixed-width feature vector via mapInPandas (Arrow batches).

    fake=False (default): real from-scratch decode (PNG/PPM/BMP) + pixel
    statistics, feature layout REAL_FEATURE_NAMES (n_features is fixed at 8
    on this path). fake=True: the deterministic sha256 pseudo-features used
    by plumbing-only tests.
    """
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    if fake:
        def batches(it):
            for pdf in it:
                feats = np.zeros((len(pdf), n_features), dtype=np.float64)
                for i, payload in enumerate(pdf[media_col]):
                    h = hashlib.sha256(bytes(payload)).digest()
                    feats[i] = [b / 255.0 for b in h[:n_features]]
                out = pdf.copy()
                out["features"] = list(feats)
                yield out
    else:
        def batches(it):
            for pdf in it:
                out = pdf.copy()
                out["features"] = [_real_features(p) for p in pdf[media_col]]
                yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, features array<double>")


#: feature vector layout of decode_audio_features (6 + n_windows entries)
AUDIO_FEATURE_NAMES = ("duration_sec", "sample_rate", "channels", "rms", "peak", "zcr")


def attach_wav_media(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 4096,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Give each row a REAL (deterministic) PCM WAV payload, encoded in the
    executors with the from-scratch RIFF codec (functions/audiocodec.py) —
    the audio analog of attach_png_media: an id-seeded sine + noise tone at
    an id-dependent frequency."""
    from codem_spark.functions import audiocodec

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def batches(it):
        for pdf in it:
            blobs = []
            for did in pdf[id_col]:
                did = int(did)
                rng = np.random.default_rng(did)
                t = np.arange(n_samples) / sample_rate
                freq = 110.0 * (1 + did % 40)
                wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samples)
                pcm = np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
                blobs.append(audiocodec.encode_wav(pcm, sample_rate))
            out = pdf.copy()
            out["audio"] = blobs
            yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, audio binary")


def decode_audio_features(
    df: DataFrame, media_col: str = "audio", n_windows: int = 8
) -> DataFrame:
    """binary WAV -> fixed-width feature vector (duration/rate/channels/
    RMS/peak/zero-cross rate + n_windows RMS energy contour) via
    mapInPandas — the real from-scratch decode, Arrow-batched like
    decode_image_features."""
    from codem_spark.functions import audiocodec

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def batches(it):
        for pdf in it:
            out = pdf.copy()
            feats = []
            for p in pdf[media_col]:
                samples, rate = audiocodec.decode_wav(bytes(p))
                feats.append(audiocodec.audio_features(samples, rate, n_windows))
            out["features"] = feats
            yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, features array<double>")


def frame_sample_plan(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling fan-out plan: one row per (doc, frame_index) —
    posexplode of a frame-index sequence; each frame's decode is the real
    codec above. This is the partitioning/fan-out shape a real pipeline
    uses (frames co-partitioned with their doc)."""
    return df.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_index", "_"),
    ).drop("_")


def attach_gif_media(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 6, size: int = 16
) -> DataFrame:
    """Give each row a REAL (deterministic) animated-GIF payload, encoded
    in the executors with the from-scratch GIF89a/LZW codec
    (functions/gifcodec.py) — an id-seeded moving-gradient animation."""
    from codem_spark.functions import gifcodec

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def batches(it):
        for pdf in it:
            blobs = []
            for did in pdf[id_col]:
                did = int(did)
                gx, gy = np.meshgrid(np.arange(size), np.arange(size))
                frames = np.stack(
                    [((gx * 7 + gy * 3 + k * 11 + did) % 256).astype(np.uint8)
                     for k in range(n_frames)]
                )
                blobs.append(gifcodec.encode_gif(frames))
            out = pdf.copy()
            out["video"] = blobs
            yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, video binary")


def decode_video_frames(
    df: DataFrame, media_col: str = "video", n_sample: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """binary video -> one row per SAMPLED frame (evenly spaced across the
    animation) with per-frame pixel features — decode once per doc inside
    the Arrow batch, fan out rows from the same worker (no re-decode per
    frame, no frame bytes crossing a stage boundary). Output:
    (id, frame_index, n_frames, features[8] as decode_image_features)."""
    from codem_spark.functions import gifcodec

    id_type = dict(df.dtypes)[id_col]

    def batches(it):
        for pdf in it:
            ids, fidx, nf_col, feats = [], [], [], []
            for did, p in zip(pdf[id_col], pdf[media_col]):
                frames = gifcodec.decode_gif(bytes(p))
                nf = len(frames)
                pick = np.unique(np.linspace(0, nf - 1, min(n_sample, nf)).astype(np.int64))
                for k in pick:
                    img = frames[k].astype(np.float64)
                    gray = img.mean(axis=2)
                    h, w = gray.shape
                    gxm = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
                    gym = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
                    ids.append(did)
                    fidx.append(int(k))
                    nf_col.append(nf)
                    feats.append(np.array(
                        [w, h, 3, img.mean(), img.std(), img.min(), img.max(),
                         0.5 * (gxm + gym)]
                    ))
            yield pd.DataFrame(
                {id_col: ids, "frame_index": fidx, "n_frames": nf_col, "features": feats}
            )

    return df.mapInPandas(
        batches,
        schema=f"{id_col} {id_type}, frame_index int, n_frames int, features array<double>",
    )
