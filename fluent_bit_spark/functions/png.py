"""Stdlib-only PNG codec (zlib + per-scanline filters).

A real — not stubbed — image decode path for the multimodal operators:
the container has no PIL/cv2, but PNG is just DEFLATE (stdlib ``zlib``)
plus five per-scanline prediction filters, so 8-bit greyscale / RGB /
RGBA images decode with nothing outside the standard library + numpy.
``operators/multimodal.py`` plugs this in for ``image/png`` payloads;
other formats keep the documented strict-mode stub.

Encoder notes: cycles filter types 0..4 across scanlines so the decoder's
unfilter paths (None/Sub/Up/Average/Paeth) are all exercised by any
multi-row image — a round-trip test covers the whole filter matrix.

Scope (honest limits): bit depth 8, color types 0 (grey), 2 (RGB),
6 (RGBA), no interlace, no palette. Out-of-scope inputs raise
ValueError rather than mis-decoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a (H, W) or (H, W, C∈{1,3,4}) uint8 array as a PNG,
    cycling scanline filters 0..4 (see module docstring)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            out = row
        elif ft == 1:                                 # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            out = (row - left) % 256
        elif ft == 2:                                 # Up
            out = (row - prev) % 256
        elif ft == 3:                                 # Average
            out = np.empty_like(row)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - (a + prev[i]) // 2) % 256
        else:                                         # Paeth
            out = np.empty_like(row)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - _paeth(a, int(prev[i]), c)) % 256
        raw.extend(int(v) for v in out)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by any conformant encoder (8-bit
    grey/RGB/RGBA, non-interlaced) to a (H, W) or (H, W, C) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, 0
    h = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); codec scope is 8-bit grey/RGB/RGBA")
    ch = _CHANNELS[color_type]
    bpp = ch
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:
            rec = row.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) % 256
        elif ft == 2:
            rec = (row + prev) % 256
        elif ft == 3:
            rec = row.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:
            rec = row.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(a, int(prev[i]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample — src index floor(dst·src_dim/dst_dim),
    exactly reproducible by integer arithmetic in any engine (the DuckDB
    oracle recomputes the same mapping in SQL)."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[np.ix_(ys, xs)] if px.ndim == 2 else px[np.ix_(ys, xs)]
