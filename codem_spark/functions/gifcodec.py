"""From-scratch animated-GIF codec (GIF89a, LZW) — the video analog of
functions/imagecodec.py / audiocodec.py: no media libraries in this
container, so multi-frame payloads are encoded/decoded directly per the
public GIF89a specification (logical screen descriptor, global color
table, graphic-control + image-descriptor blocks, variable-width LZW with
clear/EOI codes, 255-byte sub-block framing).

Scope (documented): global 256-entry color table, full-frame
non-interlaced images, disposal ignored (each frame carries the full
canvas) — exactly what the engine's own encoder emits; the decoder also
reads local color tables and skips extension blocks by sub-block size, as
the spec requires of readers.
"""

from __future__ import annotations

import struct

import numpy as np

#: 256-gray global palette (index i -> (i, i, i)) used by the encoder
_GRAY_PALETTE = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)


# ------------------------------------------------------------------- LZW
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR first, grow code width at table fill,
    reset at 4096, end with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    data = indices.astype(np.uint8).tobytes()
    if not data:
        emit(eoi)
    else:
        s = data[:1]
        for b in data[1:]:
            cand = s + bytes([b])
            if cand in table:
                s = cand
                continue
            emit(table[s])
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            elif next_code >= 4096:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
            s = bytes([b])
        emit(table[s])
        emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return np.frombuffer(bytes(out[:n_expected]), np.uint8).copy()
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    return np.frombuffer(bytes(out[:n_expected]), np.uint8).copy()


# ------------------------------------------------------------- container
def _subblocks(payload: bytes) -> bytes:
    """Frame LZW bytes into <=255-byte length-prefixed sub-blocks + 0."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """(n_frames, H, W) uint8 gray or (n_frames, H, W, 3) uint8 RGB ->
    animated GIF89a bytes. RGB is mapped onto the 256-gray global palette
    via the integer luma (r*299 + g*587 + b*114) // 1000."""
    f = np.asarray(frames)
    if f.ndim == 3:
        gray = f.astype(np.uint8)
    elif f.ndim == 4 and f.shape[3] == 3:
        fi = f.astype(np.int64)
        gray = ((fi[..., 0] * 299 + fi[..., 1] * 587 + fi[..., 2] * 114) // 1000).astype(np.uint8)
    else:
        raise ValueError(f"expected (n,H,W[,3]) uint8, got {f.shape}")
    n, h, w = gray.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT present, 256 entries
    out += _GRAY_PALETTE.tobytes()
    if n > 1:  # NETSCAPE looping extension for animations
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for k in range(n):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # full frame, no LCT
        out.append(8)  # LZW min code size
        out += _subblocks(_lzw_encode(gray[k].reshape(-1), 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, H, W, 3) uint8 RGB (full-canvas frames;
    frames smaller than the canvas are composited onto the previous
    frame at their declared offset)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    W, H, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n_colors * 3, pos).reshape(-1, 3)
        pos += n_colors * 3
    frames: list[np.ndarray] = []
    canvas = np.zeros((H, W, 3), np.uint8)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip by size
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            pal = gct
            if iflags & 0x80:
                n_colors = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n_colors * 3, pos).reshape(-1, 3)
                pos += n_colors * 3
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if pal is None:
                raise ValueError("no color table")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
            canvas = canvas.copy()
            canvas[y : y + h, x : x + w] = pal[np.minimum(idx, len(pal) - 1)]
            frames.append(canvas)
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)
