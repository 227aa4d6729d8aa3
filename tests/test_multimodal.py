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


def test_real_decode_distributed_matches_numpy_oracle(spark):
    """REAL decode (VERDICT r3 item 4): PNGs generated in the executors with
    the from-scratch encoder (one of each filter type), decoded through
    mapInPandas, features matched against a driver-side numpy oracle."""
    import numpy as np

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    media = multimodal.attach_png_media(docs, size=24)
    feats = multimodal.decode_image_features(media, fake=False)
    pdf = feats.select("doc_id", "features").toPandas()
    assert len(pdf) == 40
    for did, f in zip(pdf.doc_id, pdf.features):
        rng = np.random.default_rng(int(did))
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.float64)
        gray = img.mean(axis=2)
        expect = [
            24, 24, 3, img.mean(), img.std(), img.min(), img.max(),
            0.5 * (np.abs(np.diff(gray, axis=1)).mean() + np.abs(np.diff(gray, axis=0)).mean()),
        ]
        assert np.allclose(list(f), expect), did


def test_real_decode_rejects_garbage_loudly(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(1)
    media = multimodal.attach_fake_media(docs)  # payload is not a real image
    with pytest.raises(Exception, match="unrecognized image signature"):
        multimodal.decode_image_features(media, fake=False).collect()


def test_frame_sample_fanout(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    frames = multimodal.frame_sample_plan(docs, n_frames=4)
    assert frames.count() == 40


def test_wav_codec_roundtrip_exact():
    """From-scratch RIFF/WAVE codec: encode -> decode is bit-exact for
    8/16/32-bit PCM, mono and stereo, including the odd-length pad byte."""
    import numpy as np

    from codem_spark.functions import audiocodec

    rng = np.random.default_rng(7)
    for dtype, lo, hi in ((np.uint8, 0, 256), (np.int16, -32768, 32768), (np.int32, -2**31, 2**31)):
        for ch in (1, 2):
            for n in (255, 1024):  # 255 mono 8-bit = odd data size -> pad path
                s = rng.integers(lo, hi, (n, ch)).astype(dtype)
                blob = audiocodec.encode_wav(s, 8000)
                back, rate = audiocodec.decode_wav(blob)
                assert rate == 8000
                assert back.shape == (n, ch)
                assert (back == s).all(), (dtype, ch, n)


def test_wav_decode_skips_unknown_chunks_and_rejects_garbage():
    import struct

    import numpy as np
    import pytest as _pytest

    from codem_spark.functions import audiocodec

    s = np.arange(100, dtype=np.int16)[:, None]
    blob = audiocodec.encode_wav(s, 44100)
    # splice a LIST chunk between fmt and data (readers must skip by size)
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = audiocodec.decode_wav(spliced)
    assert (back[:, 0] == s[:, 0]).all() and rate == 44100
    with _pytest.raises(ValueError):
        audiocodec.decode_wav(b"not a wav at all")


def test_audio_decode_distributed_matches_numpy_oracle(spark):
    """Real WAV decode through mapInPandas: id-seeded tones encoded in the
    executors, features matched against a driver-side numpy oracle."""
    import numpy as np

    from codem_spark.functions import audiocodec

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = multimodal.attach_wav_media(docs, n_samples=2048, sample_rate=16_000)
    feats = multimodal.decode_audio_features(media)
    pdf = feats.select("doc_id", "features").toPandas()
    assert len(pdf) == 30
    for did, f in zip(pdf.doc_id, pdf.features):
        did = int(did)
        rng = np.random.default_rng(did)
        t = np.arange(2048) / 16_000
        freq = 110.0 * (1 + did % 40)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(2048)
        pcm = np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
        expect = audiocodec.audio_features(pcm[:, None], 16_000)
        got = np.asarray(list(f))
        assert got.shape == expect.shape == (14,)
        assert np.allclose(got, expect, rtol=0, atol=1e-12), did
        # sanity: duration and rate decode to the planted values
        assert abs(got[0] - 2048 / 16_000) < 1e-12
        assert got[1] == 16_000.0 and got[2] == 1.0


def test_gif_codec_roundtrip_exact():
    """From-scratch GIF89a/LZW codec: gray frames roundtrip bit-exact
    (including the 4096-code LZW table-reset path); RGB maps through the
    integer luma onto the gray palette."""
    import numpy as np

    from codem_spark.functions import gifcodec

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (5, 17, 23), dtype=np.uint8)
    back = gifcodec.decode_gif(gifcodec.encode_gif(frames))
    assert back.shape == (5, 17, 23, 3)
    assert (back[..., 0] == frames).all() and (back[..., 2] == frames).all()
    big = rng.integers(0, 256, (1, 200, 300), dtype=np.uint8)  # forces LZW reset
    assert (gifcodec.decode_gif(gifcodec.encode_gif(big))[0, :, :, 0] == big[0]).all()
    rgb = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    luma = ((rgb.astype(np.int64)[..., 0] * 299 + rgb.astype(np.int64)[..., 1] * 587
             + rgb.astype(np.int64)[..., 2] * 114) // 1000).astype(np.uint8)
    assert (gifcodec.decode_gif(gifcodec.encode_gif(rgb))[..., 1] == luma).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gifcodec.decode_gif(b"JPEGnope")


def test_video_frame_decode_distributed_matches_numpy_oracle(spark):
    """Real video path: id-seeded animated GIFs encoded in the executors,
    decoded once per doc, fanned out to one row per sampled frame;
    features matched against a driver-side numpy oracle."""
    import numpy as np

    from codem_spark.functions import gifcodec

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = multimodal.attach_gif_media(docs, n_frames=6, size=16)
    rows = multimodal.decode_video_frames(media, n_sample=3)
    pdf = rows.toPandas().sort_values(["doc_id", "frame_index"]).reset_index(drop=True)
    # 3 evenly spaced of 6 frames -> indices {0, 2, 5} per doc
    assert len(pdf) == 60
    assert (pdf.n_frames == 6).all()
    assert sorted(pdf.frame_index.unique()) == [0, 2, 5]
    for did, k, f in zip(pdf.doc_id, pdf.frame_index, pdf.features):
        gx, gy = np.meshgrid(np.arange(16), np.arange(16))
        gray8 = ((gx * 7 + gy * 3 + int(k) * 11 + int(did)) % 256).astype(np.uint8)
        img = np.repeat(gray8[:, :, None], 3, axis=2).astype(np.float64)
        g = img.mean(axis=2)
        expect = [16, 16, 3, img.mean(), img.std(), img.min(), img.max(),
                  0.5 * (np.abs(np.diff(g, axis=1)).mean() + np.abs(np.diff(g, axis=0)).mean())]
        assert np.allclose(list(f), expect, atol=1e-12), (did, k)
