"""From-scratch WAV (RIFF/WAVE) codec — no audio libraries in this
container, so PCM WAV is parsed/emitted directly per the public RIFF spec
(chunk-framed little-endian: 'RIFF' size 'WAVE', then 'fmt ' and 'data'
chunks; PCM samples interleaved by channel). The multimodal tier's audio
analog of functions/imagecodec.py: operators/multimodal.py decodes these
payloads inside Arrow-batched mapInPandas workers.

Supported: PCM (format tag 1) 8-bit unsigned / 16-bit / 32-bit signed,
any channel count; unknown chunks (LIST, fact, ...) are skipped by size,
as the spec requires of readers.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM WAV bytes from int samples. ``samples``: (n,) or (n, channels),
    dtype uint8 / int16 / int32 (bit depth follows the dtype)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype == np.uint8:
        bits = 8
    elif s.dtype == np.int16:
        bits = 16
    elif s.dtype == np.int32:
        bits = 32
    else:
        raise ValueError(f"unsupported sample dtype {s.dtype} (uint8/int16/int32)")
    n, ch = s.shape
    data = np.ascontiguousarray(s.astype(_PCM_DTYPES[bits], copy=False)).tobytes()
    block_align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # chunks are word-aligned; odd data gets a pad byte
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (samples (n, channels) in the native int dtype, sample_rate).
    Raises ValueError on non-RIFF/WAVE input or non-PCM encodings."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # skip the word-alignment pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    tag, ch, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"only PCM (format tag 1) supported, got {tag}")
    if bits not in _PCM_DTYPES:
        raise ValueError(f"unsupported bit depth {bits}")
    dt = np.dtype(_PCM_DTYPES[bits])
    n = len(data) // (dt.itemsize * ch)
    arr = np.frombuffer(data, dtype=dt, count=n * ch).reshape(n, ch)
    return arr, rate


def audio_features(samples: np.ndarray, sample_rate: int, n_windows: int = 8) -> np.ndarray:
    """Fixed-length feature vector from decoded PCM samples: duration,
    rate, channels, RMS, peak, zero-crossing rate, plus ``n_windows``
    equal-window RMS energies (the frame-level energy contour a training
    pipeline filters on). All float64, computed on the channel mean."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 2:
        ch = s.shape[1]
        if samples.dtype == np.uint8:
            s = s - 128.0  # 8-bit PCM is unsigned, center it
        mono = s.mean(axis=1)
    else:
        ch = 1
        mono = s
    n = len(mono)
    if n == 0:
        return np.array([0.0, float(sample_rate), float(ch)] + [0.0] * (3 + n_windows))
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    bounds = np.linspace(0, n, n_windows + 1).astype(np.int64)
    wrms = [
        float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a else 0.0
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    return np.array(
        [n / float(sample_rate), float(sample_rate), float(ch), rms, peak, zcr] + wrms
    )
