"""From-scratch PNG/PPM/BMP codec: byte-exact roundtrips vs numpy arrays."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from codem_spark.functions import imagecodec as ic


def _img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    return a


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_channels(ftype, ch):
    img = _img(13, 17, ch, seed=ftype * 10 + ch)
    data = ic.encode_png(img, filter_type=ftype)
    back = ic.decode_png(data)
    assert back.shape == (13, 17, ch)
    assert np.array_equal(back, img)


def test_png_gradient_smooth_image():
    # smooth ramps exercise predictor wraparound differently than noise
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256], axis=2).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(ic.decode_png(ic.encode_png(img, ft)), img)


def test_png_palette_decode():
    # hand-build a color-type-3 PNG: 2x2 palette indices
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    back = ic.decode_png(data)
    assert np.array_equal(back, pal[idx])


def test_png_rejects_exotic():
    img = _img(4, 4, 3)
    data = bytearray(ic.encode_png(img))
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12 = byte 28)
    data[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="interlace"):
        ic.decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        ic.decode_png(b"notapng" + bytes(16))


@pytest.mark.parametrize("ch", [1, 3])
def test_ppm_binary_roundtrip(ch):
    img = _img(9, 7, ch, seed=3)
    back = ic.decode_ppm(ic.encode_ppm(img))
    assert np.array_equal(back, img)


def test_ppm_ascii_and_comments():
    data = b"P3\n# a comment\n2 2\n255\n255 0 0  0 255 0\n0 0 255  10 20 30\n"
    back = ic.decode_ppm(data)
    assert back.shape == (2, 2, 3)
    assert list(back[1, 1]) == [10, 20, 30]
    gray = b"P2\n2 1\n255\n7 250\n"
    assert list(ic.decode_ppm(gray).reshape(-1)) == [7, 250]


@pytest.mark.parametrize("ch", [3, 4])
def test_bmp_roundtrip(ch):
    img = _img(5, 6, ch, seed=11)  # width 6*3=18 -> stride padding exercised
    back = ic.decode_bmp(ic.encode_bmp(img))
    assert np.array_equal(back, img)


def test_bmp_top_down_and_palette():
    img = _img(3, 3, 3, seed=5)
    data = bytearray(ic.encode_bmp(img))
    # make it top-down: negate height, re-order rows accordingly
    h = struct.unpack("<i", data[22:26])[0]
    struct.pack_into("<i", data, 22, -h)
    back = ic.decode_bmp(bytes(data))
    assert np.array_equal(back, img[::-1])


def test_dispatch_sniffs_format():
    img = _img(4, 4, 3)
    for blob, fmt in [
        (ic.encode_png(img, 2), "png"),
        (ic.encode_ppm(img), "ppm"),
        (ic.encode_bmp(img), "bmp"),
    ]:
        arr, f = ic.decode_image(blob)
        assert f == fmt and np.array_equal(arr, img)
    with pytest.raises(ValueError, match="unrecognized"):
        ic.decode_image(b"IMG:123456")
