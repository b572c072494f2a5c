"""Stdlib-only baseline JPEG codec (DCT + canonical huffman).

The second REAL image codec for the multimodal operators (the PNG path
is ``functions/png.py``): the container has no PIL/cv2/libjpeg, but
baseline sequential JPEG is 8×8 DCT + quantization + canonical huffman
over a marker stream — implementable with the standard library + numpy,
same posture as the PNG codec. Tables are the JPEG Annex K defaults,
so the emitted bitstream is a standard interchange-format JPEG any
external decoder reads.

Scope (honest limits): baseline sequential DCT (SOF0), 8-bit samples,
1-component greyscale or 3-component YCbCr with 4:4:4 or 4:2:0
sampling, no restart intervals, no progressive/arithmetic/12-bit.
Out-of-scope inputs raise ValueError rather than mis-decoding.

Exactness notes for tests/oracles: JPEG is lossy, but a BLOCK-CONSTANT
greyscale image encoded at quality=100 (all-ones quant tables) round-
trips EXACTLY — a constant 8×8 block has only a DC coefficient, which
is an exact multiple of 8 (orthonormal DCT of a level-shifted integer
constant), survives round() unchanged, and IDCTs back to the constant.
The ``multimodal_jpeg_roundtrip`` oracle leans on this; the lossy AC
path is pytest-bounded instead (tolerance round-trips).
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables ----------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# (bits[1..16], huffval) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

_K = np.arange(8)
_DCT = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * 0.5
_DCT[0] *= 1 / np.sqrt(2)          # orthonormal: fwd = C·B·Cᵀ, inv = Cᵀ·B·C


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling; quality=100 → all-ones (lossless DC for
    constant blocks, see module docstring)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """huffval → (code, length), canonical assignment (C.2)."""
    out: dict[int, tuple] = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0xFF, 8 - self.n)   # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2          # stuffed 0xFF data byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside "
                                 f"entropy data (restart intervals are "
                                 f"out of scope)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8, W//8, 8, 8); H, W multiples of 8."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3))


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    return [0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                  cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder -----------------------------------------------------------------


def _encode_plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (nby, nbx, 64) zigzagged quantized int
    coefficients; all blocks DCT'd in one vectorized einsum."""
    blocks = _to_blocks(plane - 128.0)
    coeffs = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = np.round(coeffs / quant).astype(np.int64)
    return q.reshape(*q.shape[:2], 64)[..., ZIGZAG]


def _emit_block(w: _BitWriter, zz: np.ndarray, pred: int,
                dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(bits, s)
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]          # ZRL
            w.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]              # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Encode (H, W) greyscale or (H, W, 3) RGB uint8 as baseline JPEG.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2×2 Y blocks + one Cb + one Cr per 16×16 MCU, chroma = 2×2 mean).
    Greyscale ignores it (single component)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("expected (H, W) grey or (H, W, 3) RGB uint8")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, "
                         f"got {subsampling!r}")
    h, w = px.shape[:2]
    grey = px.ndim == 2
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if grey:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
        mcu_h = mcu_w = 8
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsampling == "420":
            mcu_h = mcu_w = 16
            y = _pad_replicate(y, 16, 16)
            cbp = _pad_replicate(cb, 16, 16)
            crp = _pad_replicate(cr, 16, 16)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            mcu_h = mcu_w = 8
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql, qc, qc]

    zz = [_encode_plane_blocks(_pad_replicate(p, 8, 8), q)
          for p, q in zip(planes, quants)]

    out = bytearray(b"\xff\xd8")                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"         # APP0
    for tid, q in ((0, ql),) + (() if grey else ((1, qc),)):       # DQT
        body = bytes([tid]) + bytes(int(v) for v in
                                    q.reshape(64)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)                     # SOF0
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]                    # DHT
    if not grey:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([ncomp])                                           # SOS
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if grey:
        dc_c = [_canonical_codes(*DC_LUMA)]
        ac_c = [_canonical_codes(*AC_LUMA)]
    else:
        dc_c = [_canonical_codes(*DC_LUMA),
                _canonical_codes(*DC_CHROMA),
                _canonical_codes(*DC_CHROMA)]
        ac_c = [_canonical_codes(*AC_LUMA),
                _canonical_codes(*AC_CHROMA),
                _canonical_codes(*AC_CHROMA)]

    bw = _BitWriter()
    preds = [0] * ncomp
    mcus_y = -(-h // mcu_h)
    mcus_x = -(-w // mcu_w)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _emit_block(bw, blk, preds[ci],
                                                dc_c[ci], ac_c[ci])
    out += bw.flush()
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------


def _decode_block(br: _BitReader, dc_map: dict, ac_map: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)

    def read_sym(table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in entropy data")

    s = read_sym(dc_map)
    dc = pred + _extend(br.bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        sym = read_sym(ac_map)
        if sym == 0x00:                     # EOB
            break
        if sym == 0xF0:                     # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63:
            raise ValueError("AC run overflows block")
        s = sym & 0x0F
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W) grey or (H, W, 3) RGB uint8.
    Supports the scope in the module docstring; anything else raises."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    frame = None
    scan_pos = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                        # parameterless
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    body[off + 1:off + 65], dtype=np.uint8)
                quants[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:                # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                (ac_maps if tc else dc_maps)[th] = _decode_map(bits, vals)
                off += 17 + n
        elif marker == 0xC0:                # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             f"(baseline sequential only)")
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:                # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            by_id = {c[0]: i for i, c in enumerate(frame[2])}
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i:3 + 2 * i]
                scan_comps.append((by_id[cs], td_ta >> 4, td_ta & 0x0F))
            scan_pos = pos
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan_pos is None:
        raise ValueError("missing SOF0/SOS")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(c[1] in (1, 2) and c[2] in (1, 2) for c in comps) or \
            {(hmax, vmax)} - {(1, 1), (2, 2)}:
        raise ValueError("only 4:4:4 / 4:2:0 / greyscale sampling "
                         "supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)

    planes = []
    for _, ch, cv, _tq in comps:
        planes.append(np.zeros((mcus_y * cv * 8, mcus_x * ch * 8),
                               dtype=np.float64))
    br = _BitReader(data, scan_pos)
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, td, ta in scan_comps:
                _, ch, cv, tq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz, preds[ci] = _decode_block(
                            br, dc_maps[td], ac_maps[ta], preds[ci])
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * quants[tq]
                        pix = _DCT.T @ blk @ _DCT + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    if len(comps) == 1:
        return np.clip(np.round(planes[0][:fh, :fw]),
                       0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component scans unsupported")
    up = []
    for i, (_, ch, cv, _tq) in enumerate(comps):
        p = planes[i]
        if (ch, cv) != (hmax, vmax):
            p = p.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
        up.append(p[:fh, :fw])
    return _ycbcr_to_rgb(*up)
