"""Multimodal (image/audio/video) column plumbing.

Engine-new tier: media are opaque ``binary`` columns plus typed metadata
structs. The Spark-side plumbing — schema, partition-preserving batch UDF
shape, frame-sampling fan-out — is real and tested; the codec step itself is
STUBBED (the container has no image/audio libraries): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (bytes -> hashed pixel stats) stands in so the
downstream plumbing (feature extract, resize bookkeeping, batch shapes) is
exercised end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


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


def decode_image_features(
    df: DataFrame, media_col: str = "media", fake: bool = True, n_features: int = 8
) -> DataFrame:
    """binary -> fixed-width feature vector via mapInPandas (Arrow batches).

    Real decode is NOT IMPLEMENTED in this container (no PIL/cv2); the
    ``fake=True`` path derives deterministic pseudo-features from a sha256
    of the payload so batch shape / schema / partitioning are fully real.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image library not present in this "
            "container; run with fake=True for the plumbing path"
        )

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def batches(it):
        for pdf in it:
            feats = np.zeros((len(pdf), n_features), dtype=np.float64)
            for i, payload in enumerate(pdf[media_col]):
                h = hashlib.sha256(bytes(payload)).digest()
                feats[i] = [b / 255.0 for b in h[:n_features]]
            out = pdf.copy()
            out["features"] = list(feats)
            yield out

    return df.mapInPandas(batches, schema=f"{in_fields}, features array<double>")


def frame_sample_plan(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling fan-out plan: one row per (doc, frame_index) —
    posexplode of a frame-index sequence; the decode of each frame is the
    stubbed step above. This is the partitioning/fan-out shape a real
    pipeline uses (frames co-partitioned with their doc)."""
    return df.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_index", "_"),
    ).drop("_")
