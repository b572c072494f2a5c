"""Stdlib-only AAC ADTS frame-header codec: metadata probe + fixture
frame builder.

Completes the compressed-codec structural-probe triple (mp3 →
functions/mpeg_audio.py, H.264 → functions/h264.py): FULL AAC sample
decode needs filterbank + huffman machinery (ffmpeg-class, out of
scope for this container), but the ADTS TRANSPORT layer — what a data
pipeline needs to validate, meter, and fingerprint crawled AAC audio
— is pure public-spec bit arithmetic (ISO/IEC 13818-7 §6.2 / 14496-3:
12-bit syncword, profile / sampling-frequency-index / channel-config
fields, 13-bit frame length that INCLUDES the header, 2-bit raw-data-
block count where each block carries 1024 samples).

Same two-sided posture as mpeg_audio.py: ``encode_adts_frames`` and
``probe_adts`` are written against the spec separately, and the DuckDB
oracle recomputes every expected field arithmetically from the fixture
formulas — a shared bug would have to be a shared misreading of the
spec.
"""

from __future__ import annotations

# ISO/IEC 14496-3 §1.6.3.4 samplingFrequencyIndex table.
SAMPLE_RATE = (96000, 88200, 64000, 48000, 44100, 32000, 24000,
               22050, 16000, 12000, 11025, 8000, 7350,
               None, None, None)
# profile field = Audio Object Type - 1: 0=Main, 1=LC, 2=SSR, 3=LTP.
PROFILE_NAMES = ("Main", "LC", "SSR", "LTP")
SAMPLES_PER_BLOCK = 1024
HEADER_LEN = 7          # protection_absent=1 (no CRC) variant
CRC_HEADER_LEN = 9


def _header(profile: int, sr_idx: int, channels: int, frame_len: int,
            blocks: int, crc: bool) -> bytes:
    """ADTS fixed+variable header (7 bytes, 9 with CRC placeholder).

    Bit layout: sync(12)=0xFFF id(1)=0 layer(2)=00
    protection_absent(1) profile(2) sf_index(4) private(1)
    channel_config(3) original(1) home(1) cib(1) cis(1)
    frame_length(13) buffer_fullness(11)=0x7FF (VBR signal)
    raw_data_blocks-1(2).
    """
    hdr = bytearray(CRC_HEADER_LEN if crc else HEADER_LEN)
    hdr[0] = 0xFF
    hdr[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    hdr[2] = ((profile << 6) | (sr_idx << 2) | (0 << 1)
              | ((channels >> 2) & 1))
    hdr[3] = ((channels & 0b11) << 6) | ((frame_len >> 11) & 0b11)
    hdr[4] = (frame_len >> 3) & 0xFF
    hdr[5] = ((frame_len & 0b111) << 5) | 0b11111        # fullness hi
    hdr[6] = (0b111111 << 2) | (blocks - 1)              # fullness lo
    # bytes 7..8 stay zero: CRC placeholder (prober skips, never checks)
    return bytes(hdr)


def encode_adts_frames(frames: list[tuple[int, int]], profile: int,
                       sr_idx: int, channels: int,
                       crc_every: int = 0) -> bytes:
    """Build an ADTS byte stream: one frame per ``(payload_len,
    n_blocks)`` pair. ``crc_every > 0`` gives every k-th frame the
    9-byte CRC-present header (CRC bytes zero filler — structural,
    not computed; the prober skips them by length arithmetic).
    Payload filler avoids 0xFF so no false syncwords arise."""
    out = bytearray()
    for i, (payload_len, blocks) in enumerate(frames):
        crc = crc_every > 0 and i % crc_every == 0
        hlen = CRC_HEADER_LEN if crc else HEADER_LEN
        flen = hlen + payload_len
        if flen >= 1 << 13:
            raise ValueError("frame_length exceeds 13 bits")
        if not 1 <= blocks <= 4:
            raise ValueError("raw_data_blocks must be 1..4")
        out += _header(profile, sr_idx, channels, flen, blocks, crc)
        out += bytes((i + j) % 0x7F for j in range(payload_len))
    return bytes(out)


def probe_adts(b: bytes) -> dict:
    """Walk the ADTS frame chain; return structural metadata.

    Crawl-tolerant: stops cleanly at a truncated trailing frame
    (complete frames only); rejects lost sync, non-zero layer,
    reserved sampling index, channel_config 0 (PCE-dependent — a
    metering pipeline can't size it), and mid-stream parameter
    changes with ValueError.
    """
    pos = 0
    n_frames = n_blocks = n_crc = 0
    profile = sr = channels = None
    while pos + HEADER_LEN <= len(b):
        h = b[pos:pos + HEADER_LEN]
        if h[0] != 0xFF or (h[1] & 0xF0) != 0xF0:
            raise ValueError(f"lost sync at byte {pos}")
        if (h[1] >> 1) & 0b11 != 0:
            raise ValueError("layer must be 00 in ADTS")
        crc = (h[1] & 1) == 0
        prof = h[2] >> 6
        sr_idx = (h[2] >> 2) & 0b1111
        rate = SAMPLE_RATE[sr_idx]
        if rate is None:
            raise ValueError(f"reserved sampling index at byte {pos}")
        chans = ((h[2] & 1) << 2) | (h[3] >> 6)
        if chans == 0:
            raise ValueError("channel_config 0 (inband PCE) unsupported")
        flen = ((h[3] & 0b11) << 11) | (h[4] << 3) | (h[5] >> 5)
        blocks = (h[6] & 0b11) + 1
        if flen < (CRC_HEADER_LEN if crc else HEADER_LEN):
            raise ValueError(f"frame_length shorter than header "
                             f"at byte {pos}")
        if profile is None:
            profile, sr, channels = prof, rate, chans
        elif (prof, rate, chans) != (profile, sr, channels):
            raise ValueError("stream parameters changed mid-stream")
        if pos + flen > len(b):
            break  # truncated trailing frame — count complete ones only
        n_frames += 1
        n_blocks += blocks
        n_crc += int(crc)
        pos += flen
    if n_frames == 0:
        raise ValueError("no complete ADTS frame")
    total_samples = n_blocks * SAMPLES_PER_BLOCK
    return {
        "n_frames": n_frames,
        "profile": PROFILE_NAMES[profile],
        "sample_rate": sr,
        "channels": channels,
        "n_crc_frames": n_crc,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // sr,
        "parsed_bytes": pos,
    }
