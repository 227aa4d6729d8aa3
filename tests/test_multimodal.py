"""Multimodal plumbing: schema, fan-out, deterministic fake decode."""

from __future__ import annotations

import pytest

from codem_spark.operators import multimodal


def test_fake_decode_plumbing(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    media = multimodal.attach_fake_media(docs)
    feats = multimodal.decode_image_features(media, fake=True)
    pdf = feats.select("doc_id", "features").toPandas()
    assert len(pdf) == 50
    assert all(len(f) == 8 for f in pdf.features)
    # deterministic
    pdf2 = multimodal.decode_image_features(media, fake=True).select("doc_id", "features").toPandas()
    m = pdf.merge(pdf2, on="doc_id")
    assert all(list(a) == list(b) for a, b in zip(m.features_x, m.features_y))


def test_real_decode_not_implemented(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(1)
    media = multimodal.attach_fake_media(docs)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_features(media, fake=False)


def test_frame_sample_fanout(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    frames = multimodal.frame_sample_plan(docs, n_frames=4)
    assert frames.count() == 40
