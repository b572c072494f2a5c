"""Stdlib-only YUV4MPEG2 (.y4m) codec for mono/4:2:0 frames, numpy in/out.

Clears the video half of the multimodal stub row: .y4m is the
uncompressed interchange format every video toolchain (ffmpeg,
mjpegtools, VP9/AV1 test vectors) reads and writes — a one-line ASCII
stream header followed by raw planar frames, each prefixed with a
``FRAME`` line. Public format: the yuv4mpeg(5) man page from
mjpegtools. No compression, so decode is header parsing + buffer
reshape — exactly representable stdlib-only, and the honest analogue
of "frame extraction" that ffmpeg would do on compressed payloads
(the compressed-codec plug-point stays documented in
``operators/multimodal.py``).

Colorspace tags supported: ``Cmono`` (one Y plane per frame) and
``C420jpeg`` (Y + quarter-size U/V planes).
"""

from __future__ import annotations

import numpy as np

MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               chroma: np.ndarray | None = None) -> bytes:
    """uint8 Y frames ``(n_frames, h, w)`` → .y4m bytes.

    ``chroma=None`` writes ``Cmono``; otherwise ``chroma`` is a
    ``(n_frames, 2, h//2, w//2)`` uint8 array of U/V planes and the
    stream is ``C420jpeg``."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("need uint8 frames of shape (n, h, w)")
    n, h, w = frames.shape
    cs = b"Cmono" if chroma is None else b"C420jpeg"
    out = [b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
           % (MAGIC, w, h, fps[0], fps[1], cs)]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        if chroma is not None:
            out.append(chroma[i, 0].tobytes())
            out.append(chroma[i, 1].tobytes())
    return b"".join(out)


def decode_y4m(b: bytes) -> tuple[np.ndarray, dict]:
    """.y4m bytes → (uint8 Y frames ``(n, h, w)``, meta dict).

    meta carries ``width height fps chroma`` and, for 4:2:0 streams,
    ``chroma_planes`` of shape ``(n, 2, h//2, w//2)``."""
    nl = b.index(b"\n")
    header = b[:nl].split(b" ")
    if header[0] != MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    cs = b"420jpeg"  # yuv4mpeg default when no C tag present
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = (int(num), int(den))
        elif tok[:1] == b"C":
            cs = tok[1:]
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    mono = cs == b"mono"
    if not mono and not cs.startswith(b"420"):
        raise ValueError(f"unsupported chroma {cs!r}")
    y_size = w * h
    c_size = 0 if mono else (w // 2) * (h // 2)
    ys, us, vs = [], [], []
    pos = nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if b[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        ys.append(np.frombuffer(b, np.uint8, y_size, pos).reshape(h, w))
        pos += y_size
        if not mono:
            us.append(np.frombuffer(b, np.uint8, c_size, pos)
                      .reshape(h // 2, w // 2))
            pos += c_size
            vs.append(np.frombuffer(b, np.uint8, c_size, pos)
                      .reshape(h // 2, w // 2))
            pos += c_size
    meta = {"width": w, "height": h, "fps": fps,
            "chroma": "mono" if mono else cs.decode()}
    if not mono:
        meta["chroma_planes"] = np.stack(
            [np.stack(us), np.stack(vs)], axis=1)
    return np.stack(ys), meta
