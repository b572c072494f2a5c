"""Stdlib-only MP4 / ISO-BMFF box-structure codec: container probe +
fixture builder.

Extends the compressed-codec structural-probe set (mp3/aac/h264 →
functions/mpeg_audio.py, adts.py, h264.py) with the CONTAINER layer:
most crawled web video is H.264-in-MP4, and the metadata a training
pipeline needs to validate/meter/route it — brand, duration, track
count, video dimensions, codec fourccs, payload size — lives in the
box tree (ISO/IEC 14496-12: 32-bit size + fourcc headers, 64-bit
``largesize`` escape when size==1, size==0 meaning to-EOF, full-box
version/flags, mvhd/tkhd/mdhd/hdlr/stsd layouts; tkhd width/height in
16.16 fixed point). ``probe_mp4`` walks the tree and returns the
structural metadata without touching a sample; ``encode_mp4`` builds
spec-valid trees (both mvhd versions, both size forms) so the probe is
exercised against independently-computable expectations.

Two-sided posture (functions/msgpack.py precedent): builder and prober
are written against the public spec separately; the DuckDB oracle
recomputes every expected field arithmetically from fixture formulas.
"""

from __future__ import annotations

import struct

_CONTAINERS = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl"))


def _box(fourcc: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I4sQ", 1, fourcc, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


def _full(version: int, flags: int = 0) -> bytes:
    return struct.pack(">I", (version << 24) | flags)


def _mvhd(timescale: int, duration: int, version: int) -> bytes:
    """mvhd: creation/modification times zero; v1 uses 64-bit times."""
    t = struct.pack(">QQIQ" if version else ">IIII",
                    0, 0, timescale, duration)
    tail = (struct.pack(">iH", 0x00010000, 0x0100) + bytes(10)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + bytes(24) + struct.pack(">I", 2))  # next_track_ID
    return _box(b"mvhd", _full(version) + t + tail)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    body = (_full(0, 7) + struct.pack(">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", duration) + bytes(8)
            + struct.pack(">hhhH", 0, 0, 0, 0) + bytes(36)
            + struct.pack(">II", w << 16, h << 16))
    return _box(b"tkhd", body)


def _mdhd(timescale: int, duration: int) -> bytes:
    return _box(b"mdhd", _full(0)
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0))  # language 'und'


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0) + b"\x00" * 4 + handler
                + bytes(12) + b"\x00")


def _stsd(fourcc: bytes) -> bytes:
    entry = _box(fourcc, bytes(6) + struct.pack(">H", 1) + bytes(70))
    return _box(b"stsd", _full(0) + struct.pack(">I", 1) + entry)


def _trak(track_id: int, handler: bytes, fourcc: bytes, duration: int,
          timescale: int, w: int = 0, h: int = 0) -> bytes:
    stbl = _box(b"stbl", _stsd(fourcc))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _mdhd(timescale, duration) + _hdlr(handler)
                + minf)
    return _box(b"trak", _tkhd(track_id, duration, w, h) + mdia)


def encode_mp4(brand: bytes, timescale: int, duration: int,
               width: int, height: int, video_codec: bytes,
               audio_codec: bytes | None, mdat_len: int,
               mvhd_version: int = 0,
               largesize_mdat: bool = False) -> bytes:
    """Spec-valid ISO-BMFF tree: ftyp + moov(mvhd + video trak
    [+ audio trak]) + mdat (deterministic filler). ``mvhd_version``
    and ``largesize_mdat`` exercise the 64-bit paths."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200)
                + brand + b"isom")
    traks = _trak(1, b"vide", video_codec, duration, timescale,
                  width, height)
    if audio_codec is not None:
        traks += _trak(2, b"soun", audio_codec, duration, timescale)
    moov = _box(b"moov", _mvhd(timescale, duration, mvhd_version)
                + traks)
    mdat = _box(b"mdat", bytes(i % 251 for i in range(mdat_len)),
                largesize=largesize_mdat)
    return ftyp + moov + mdat


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the box sequence
    in b[start:end); validates size arithmetic (§4.2)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at byte {pos}")
        size = struct.unpack_from(">I", b, pos)[0]
        fourcc = b[pos + 8 - 4:pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize at byte {pos}")
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            head = 16
        elif size == 0:
            size = end - pos  # to end of enclosing scope (§4.2)
        if size < head or pos + size > end:
            raise ValueError(
                f"box '{fourcc.decode('latin1')}' size {size} overruns "
                f"scope at byte {pos}")
        yield fourcc, pos + head, pos + size
        pos += size


def probe_mp4(b: bytes) -> dict:
    """Box-tree walk → container metadata, zero samples touched.

    Returns major brand, movie timescale/duration (ms), track count,
    first video track's dimensions + sample-entry fourcc, first audio
    fourcc, mdat payload bytes, and total box count. Raises ValueError
    on size overruns, missing ftyp/moov/mvhd, or a bad mvhd version.
    """
    meta = {"major_brand": None, "timescale": None, "duration_ms": None,
            "n_tracks": 0, "width": None, "height": None,
            "video_codec": None, "audio_codec": None,
            "mdat_bytes": 0, "n_boxes": 0}
    state = {"handler": None, "tkhd_wh": None}

    def walk(start: int, end: int, depth: int) -> None:
        for fourcc, ps, pe in _walk(b, start, end):
            meta["n_boxes"] += 1
            if fourcc == b"ftyp" and depth == 0:
                meta["major_brand"] = b[ps:ps + 4].decode("latin1")
            elif fourcc == b"mdat" and depth == 0:
                meta["mdat_bytes"] += pe - ps
            elif fourcc == b"mvhd":
                version = b[ps]
                if version == 0:
                    ts, dur = struct.unpack_from(">II", b, ps + 12)
                elif version == 1:
                    ts, dur = struct.unpack_from(">IQ", b, ps + 20)
                else:
                    raise ValueError(f"mvhd version {version}")
                meta["timescale"] = ts
                meta["duration_ms"] = dur * 1000 // ts
            elif fourcc == b"trak":
                meta["n_tracks"] += 1
                state["handler"] = state["tkhd_wh"] = None
                walk(ps, pe, depth + 1)
            elif fourcc == b"tkhd":
                w16, h16 = struct.unpack_from(">II", b, pe - 8)
                state["tkhd_wh"] = (w16 >> 16, h16 >> 16)
            elif fourcc == b"hdlr":
                state["handler"] = b[ps + 8:ps + 12]
            elif fourcc == b"stsd":
                n = struct.unpack_from(">I", b, ps + 4)[0]
                if n < 1:
                    raise ValueError("empty stsd")
                entry = b[ps + 12:ps + 16].decode("latin1")
                if (state["handler"] == b"vide"
                        and meta["video_codec"] is None):
                    meta["video_codec"] = entry
                    if state["tkhd_wh"]:
                        meta["width"], meta["height"] = state["tkhd_wh"]
                elif (state["handler"] == b"soun"
                        and meta["audio_codec"] is None):
                    meta["audio_codec"] = entry
            elif fourcc in _CONTAINERS:
                walk(ps, pe, depth + 1)

    walk(0, len(b), 0)
    if meta["major_brand"] is None:
        raise ValueError("no ftyp box")
    if meta["timescale"] is None:
        raise ValueError("no moov/mvhd box")
    return meta
