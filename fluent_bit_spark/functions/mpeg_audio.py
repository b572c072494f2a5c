"""Stdlib-only MPEG-1 Layer III (mp3) frame-header codec: metadata
probe + fixture frame builder.

Narrows the compressed-audio plug-point (operators/multimodal.py)
the honest way this container allows: FULL mp3 sample decode needs a
polyphase filterbank + huffman tables (ffmpeg-class work, out of
scope), but the FRAME LAYER — the part a data pipeline actually needs
to validate, deduplicate, and meter 100 TB of crawled audio — is pure
public-spec arithmetic (ISO/IEC 11172-3: 11-bit syncword, version /
layer / bitrate-index / sample-rate-index / padding fields, frame
length ``144 * bitrate / sample_rate + padding``).  ``probe_mp3``
walks every frame and returns the stream's structural metadata
(frame count, rate, CBR/VBR, exact sample count → duration) without
decoding a single sample; ``encode_mp3_frames`` builds spec-valid
frame sequences (headers real, payload deterministic filler) so the
probe is exercised against independently-computable expectations.

Same two-sided posture as functions/msgpack.py: the encoder and the
prober are written against the public spec separately, and the
DuckDB oracle recomputes every expected field arithmetically — a
shared bug would have to be a shared misreading of the spec.
"""

from __future__ import annotations

# MPEG-1 Layer III tables (ISO/IEC 11172-3 §2.4.2.3).
BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320, None)
SAMPLE_RATE = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152


def frame_length(kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III frame length in bytes: floor(144 * bitrate /
    sample_rate) + padding (bitrate in bit/s; 144 = 1152/8)."""
    return 144_000 * kbps // sample_rate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """4-byte frame header: sync(11) version(2)=11 layer(2)=01
    no-CRC(1)=1 bitrate(4) rate(2) padding(1) private(1)
    mode(2)=stereo ext(2) copy(1) orig(1) emphasis(2)."""
    b2 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 1
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    return bytes((0xFF, b2, b3, 0x00))


def encode_mp3_frames(frames: list[tuple[int, int]], sr_idx: int,
                      id3_body: int = 0) -> bytes:
    """Build an mp3 byte stream: optional ID3v2 tag (``id3_body``
    bytes of zero body behind a real syncsafe-size header) followed
    by one spec-valid frame per ``(bitrate_idx, padding)`` pair.
    Filler bytes are zero — no 0xFF, so no false syncwords."""
    out = bytearray()
    if id3_body:
        out += b"ID3\x04\x00\x00" + bytes(
            (id3_body >> s) & 0x7F for s in (21, 14, 7, 0))
        out += bytes(id3_body)
    sr = SAMPLE_RATE[sr_idx]
    for bitrate_idx, padding in frames:
        kbps = BITRATE_KBPS[bitrate_idx]
        flen = frame_length(kbps, sr, padding)
        out += _header(bitrate_idx, sr_idx, padding)
        out += bytes(flen - 4)
    return bytes(out)


def probe_mp3(b: bytes) -> dict:
    """Walk the frame chain; return structural metadata.

    Tolerant the way a crawl pipeline must be: skips a leading ID3v2
    tag, stops cleanly at a truncated trailing frame (counting only
    complete frames), rejects non-MPEG1-LayerIII streams and free/bad
    bitrate or reserved sample-rate indexes with ValueError.
    """
    pos, id3_bytes = 0, 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = 0
        for byte in b[6:10]:
            size = (size << 7) | (byte & 0x7F)
        id3_bytes = 10 + size
        pos = id3_bytes
    n_frames = 0
    sr = None
    kbps_min = kbps_max = None
    while pos + 4 <= len(b):
        h0, h1, h2 = b[pos], b[pos + 1], b[pos + 2]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"lost sync at byte {pos}")
        version = (h1 >> 3) & 0b11
        layer = (h1 >> 1) & 0b11
        if version != 0b11 or layer != 0b01:
            raise ValueError(
                f"only MPEG-1 Layer III supported "
                f"(version bits {version:#b}, layer bits {layer:#b})")
        bitrate_idx = h2 >> 4
        sr_idx = (h2 >> 2) & 0b11
        padding = (h2 >> 1) & 1
        kbps = BITRATE_KBPS[bitrate_idx]
        rate = SAMPLE_RATE[sr_idx]
        if kbps is None or rate is None:
            raise ValueError(f"bad bitrate/rate index at byte {pos}")
        if sr is None:
            sr = rate
        elif rate != sr:
            raise ValueError("sample rate changed mid-stream")
        flen = frame_length(kbps, rate, padding)
        if pos + flen > len(b):
            break  # truncated trailing frame — count complete ones only
        kbps_min = kbps if kbps_min is None else min(kbps_min, kbps)
        kbps_max = kbps if kbps_max is None else max(kbps_max, kbps)
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no complete mp3 frame")
    total_samples = n_frames * SAMPLES_PER_FRAME
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "kbps_min": kbps_min,
        "kbps_max": kbps_max,
        "vbr": kbps_min != kbps_max,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // sr,
        "id3_bytes": id3_bytes,
        "parsed_bytes": pos,
    }
