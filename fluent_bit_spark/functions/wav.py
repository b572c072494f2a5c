"""Stdlib-only RIFF/WAVE PCM codec (16-bit), numpy in/out.

Clears the audio half of the multimodal stub row the same way
``functions/png.py`` / ``functions/jpeg.py`` cleared the image half:
the container has no audio libraries, but canonical WAVE is just a
RIFF container around raw little-endian PCM — ``struct`` + numpy
cover it completely. Format per the public RIFF/WAVE spec
(Microsoft/IBM 1991; the same layout the stdlib ``wave`` module and
fluent-bit's own file readers assume): a ``RIFF`` chunk wrapping a
``fmt `` chunk (PCM tag 1, channels, rate, block align) and a
``data`` chunk of interleaved frames.

Decode walks the chunk list generically (tolerates extra chunks such
as ``LIST``/``fact`` and the odd-size pad byte), so real-world files
decode, not just our own encoder's output.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples ``(n,)`` (mono) or ``(n, channels)`` → WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError(f"need int16 PCM, got {samples.dtype}")
    n, channels = samples.shape
    block_align = channels * 2
    data = samples.astype("<i2").tobytes()  # interleaved frames
    fmt = struct.pack("<HHIIHH", _FMT_PCM, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAVE bytes → (int16 samples ``(n, channels)``, sample_rate)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", b[4:8])[0]
    channels = sample_rate = None
    data = None
    while pos + 8 <= min(end, len(b)):
        cid = b[pos:pos + 4]
        size = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        chunk = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16])
            if tag != _FMT_PCM or bits != 16:
                raise ValueError(f"only 16-bit PCM supported "
                                 f"(tag={tag}, bits={bits})")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), sample_rate
