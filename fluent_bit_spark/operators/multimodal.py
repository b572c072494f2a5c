"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data extension (not in the reference). Images/audio/video are
carried as ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` operators.

Every modality has a REAL stdlib-only decode path now — no codec
libraries needed in-container:

- images: PNG (``functions/png.py``, zlib + scanline unfilter) and
  baseline JPEG (``functions/jpeg.py``, huffman + IDCT) — r3/r4;
- audio: RIFF/WAVE 16-bit PCM (``functions/wav.py``) — r4;
- video: YUV4MPEG2 frame streams (``functions/y4m.py``) — r4.

``decode_images`` / ``decode_audio`` / ``sample_video_frames`` and the
image path of ``resize_images`` operate on actual samples/pixels.

Compressed codecs (r5) get STRUCTURAL probes — real container/frame
parsing without sample decode: mp3 frame-header walk
(``functions/mpeg_audio.py``), AAC ADTS header walk
(``functions/adts.py``), H.264 Annex B NAL walk + Exp-Golomb SPS
parse (``functions/h264.py``), and MP4/ISO-BMFF box-tree walk
(``functions/mp4.py``) in ``probe_audio_frames`` /
``probe_adts_frames`` / ``probe_video_structure`` /
``probe_mp4_structure`` below. Only full SAMPLE decode of compressed
codecs remains a plug-point — that genuinely needs ffmpeg-class
libraries, and the ``strict=True`` NotImplementedError markers below
document exactly where they slot in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.jpeg import decode_jpeg, encode_jpeg
from ..functions.png import decode_png, encode_png, resize_nearest
from ..functions.wav import decode_wav, encode_wav
from ..functions.y4m import decode_y4m, encode_y4m

PNG_MAGIC = b"\x89PNG"
JPEG_MAGIC = b"\xff\xd8"

MEDIA_META_SCHEMA = ("media_type string, byte_len bigint, sha256 string")

FEATURE_DIM = 8


def with_media_meta(df: DataFrame, payload_col: str = "payload",
                    media_type: str = "image") -> DataFrame:
    """Typed metadata derived natively from the binary column — no UDF."""
    return (df.withColumn("media_type", F.lit(media_type))
              .withColumn("byte_len", F.octet_length(F.col(payload_col)))
              .withColumn("sha256", F.sha2(F.col(payload_col), 256)))


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real codec: FEATURE_DIM floats derived
    from the sha256 digest. Replace with PIL/torchvision/ffmpeg decode in
    an environment that has them."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_features(df: DataFrame, payload_col: str = "payload",
                    out_col: str = "features",
                    strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: Arrow record batches of the input schema; output adds
    ``features array<float>``. ``strict=True`` raises NotImplementedError
    — the marker that a real codec is required here.
    """
    if strict:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this container; use strict=False for the deterministic "
            "fake (plumbing test) path")

    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} array<float>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(
                lambda b: _fake_decode(bytes(b)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def resize_images(df: DataFrame, payload_col: str = "payload",
                  width: int = 64, height: int = 64,
                  out_col: str = "thumb",
                  strict: bool = False) -> DataFrame:
    """Resize for image payloads: 1:1 mapInPandas adding a ``thumb
    binary`` column plus its (thumb_w, thumb_h) dims.

    PNG and baseline JPEG payloads take the REAL path: decode
    (functions/png.py, functions/jpeg.py) → nearest-neighbour resample
    on actual pixels → re-encode in the same format. Other payloads
    (audio/video, exotic image formats) fall back to the deterministic
    byte-downsample stub (right cardinality and batch shape, content is
    a stand-in); ``strict=True`` raises NotImplementedError for them —
    the marker that a real codec (PIL/ffmpeg) must be plugged in
    there."""
    n_bytes = width * height

    def _fake_resize(b: bytes) -> bytes:
        if len(b) == 0:
            return b""
        step = max(1, len(b) // n_bytes)
        return bytes(b[::step][:n_bytes])

    def _resize(b: bytes) -> bytes:
        if b[:4] == PNG_MAGIC:
            return encode_png(resize_nearest(decode_png(b), width, height))
        if b[:2] == JPEG_MAGIC:
            return encode_jpeg(
                resize_nearest(decode_jpeg(b), width, height),
                quality=95)
        if strict:
            raise NotImplementedError(
                "real non-PNG/JPEG resize requires PIL/cv2/ffmpeg, "
                "absent in this container; strict=False runs the "
                "deterministic stub")
        return _fake_resize(b)

    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary, thumb_w int, thumb_h int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(
                lambda b: _resize(bytes(b)))
            pdf["thumb_w"] = width
            pdf["thumb_h"] = height
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


# ---------------------------------------------------------------------------
# Real PNG pixel path (stdlib codec) + formula-keyed fixture images
# ---------------------------------------------------------------------------


def fixture_image(doc_id: int) -> np.ndarray:
    """Deterministic greyscale fixture keyed on doc_id: dims
    (8+id%5) × (8+id%7), pixel(x, y) = (id·31 + x·7 + y·13) mod 256.
    A pure integer formula, so a SQL oracle can recompute any pixel —
    or any resampled checksum — without a decoder (see the
    multimodal_png_roundtrip oracle in queries.py)."""
    w, h = 8 + doc_id % 5, 8 + doc_id % 7
    x = np.arange(w, dtype=np.int64) * 7
    y = np.arange(h, dtype=np.int64)[:, None] * 13
    return ((doc_id * 31 + x + y) % 256).astype(np.uint8)


def encode_fixture_pngs(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL PNG binary per row from the
    formula-keyed fixture image — the encode half of the round-trip."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: encode_png(fixture_image(int(i))))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode for PNG and baseline-JPEG payloads: adds
    (width, height, pixel_sum) from actual decoded pixels — no stub, no
    hash fake. Arrow-batched mapInPandas; other payloads raise (this is
    the strict path by construction)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += ", width int, height int, pixel_sum bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims_w, dims_h, sums = [], [], []
            for b in pdf[payload_col]:
                raw = bytes(b)
                px = (decode_jpeg(raw) if raw[:2] == JPEG_MAGIC
                      else decode_png(raw))
                dims_h.append(px.shape[0])
                dims_w.append(px.shape[1])
                sums.append(int(px.astype(np.int64).sum()))
            pdf["width"] = dims_w
            pdf["height"] = dims_h
            pdf["pixel_sum"] = sums
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def fixture_image_blocks(doc_id: int) -> np.ndarray:
    """Deterministic BLOCK-CONSTANT greyscale fixture keyed on doc_id:
    dims (8 + id%9) × (8 + id%11) — partial edge blocks on most ids —
    with pixel(x, y) = (id·37 + (x DIV 8)·11 + (y DIV 8)·17) mod 256.
    Constant 8×8 blocks make a quality-100 JPEG round-trip EXACT
    (DC-only blocks; see functions/jpeg.py), so a SQL oracle can
    recompute pixel sums with integer arithmetic and no decoder."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 11
    bx = (np.arange(w, dtype=np.int64) // 8) * 11
    by = (np.arange(h, dtype=np.int64)[:, None] // 8) * 17
    return ((doc_id * 37 + bx + by) % 256).astype(np.uint8)


def encode_fixture_jpegs(df: DataFrame, id_col: str = "doc_id",
                         out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL baseline-JPEG binary per row from
    the block-constant fixture image at quality 100 — the encode half
    of the JPEG round-trip (huffman, DC prediction, byte stuffing and
    edge-block padding all exercised)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: encode_jpeg(fixture_image_blocks(int(i)),
                                      quality=100))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


# ---------------------------------------------------------------------------
# Real audio path (stdlib WAV codec) + formula-keyed fixture clips
# ---------------------------------------------------------------------------


def fixture_audio(doc_id: int) -> np.ndarray:
    """Deterministic int16 PCM clip keyed on doc_id: 1 + id%2 channels,
    256 + id%97 frames, sample(frame, ch) = (id·13 + ch·29 + frame·7)
    mod 4096 − 2048. Pure integer formula → a SQL oracle recomputes
    any sample, sum, or peak without a decoder (multimodal_wav_features
    in queries.py)."""
    channels = 1 + doc_id % 2
    n = 256 + doc_id % 97
    i = np.arange(n, dtype=np.int64)[:, None] * 7
    c = np.arange(channels, dtype=np.int64) * 29
    return ((doc_id * 13 + c + i) % 4096 - 2048).astype(np.int16)


def encode_fixture_wavs(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL RIFF/WAVE binary per row from the
    formula-keyed PCM fixture — the encode half of the audio
    round-trip (chunk layout, interleave, word-align pad byte all
    exercised)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: encode_wav(fixture_audio(int(i)),
                                     sample_rate=8000))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for WAVE/PCM payloads: adds (sample_rate,
    n_channels, n_samples, sample_sum, abs_sum, peak) from actual
    decoded samples — no stub, no hash fake. Arrow-batched
    mapInPandas, map-only (one pass, no shuffle at any scale).
    Compressed codecs (mp3/aac/flac) raise inside decode_wav — that is
    the documented ffmpeg plug-point."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", sample_rate int, n_channels int, n_samples int"
                   ", sample_sum bigint, abs_sum bigint, peak int")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("sample_rate", "n_channels",
                                    "n_samples", "sample_sum",
                                    "abs_sum", "peak")}
            for b in pdf[payload_col]:
                samples, rate = decode_wav(bytes(b))
                s64 = samples.astype(np.int64)
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(samples.shape[1])
                cols["n_samples"].append(samples.shape[0])
                cols["sample_sum"].append(int(s64.sum()))
                cols["abs_sum"].append(int(np.abs(s64).sum()))
                cols["peak"].append(int(np.abs(s64).max(initial=0)))
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


# ---------------------------------------------------------------------------
# Real video path (stdlib Y4M codec) + formula-keyed fixture streams
# ---------------------------------------------------------------------------


def fixture_video(doc_id: int) -> np.ndarray:
    """Deterministic mono frame stack keyed on doc_id: 4 + id%5 frames
    of (6 + id%4) × (8 + id%5), pixel(f, y, x) = (id·31 + f·19 + x·7 +
    y·13) mod 256 — integer formula, SQL-recomputable per frame."""
    n, w, h = 4 + doc_id % 5, 8 + doc_id % 5, 6 + doc_id % 4
    f = np.arange(n, dtype=np.int64)[:, None, None] * 19
    y = np.arange(h, dtype=np.int64)[:, None] * 13
    x = np.arange(w, dtype=np.int64) * 7
    return ((doc_id * 31 + f + y + x) % 256).astype(np.uint8)


def encode_fixture_y4ms(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL YUV4MPEG2 binary per row from the
    formula-keyed frame stack — the encode half of the video
    round-trip."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: encode_y4m(fixture_video(int(i))))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def sample_video_frames(df: DataFrame, payload_col: str = "payload",
                        every: int = 2) -> DataFrame:
    """REAL 1:N frame sampling for Y4M payloads: decodes the stream
    (functions/y4m.py) and emits one row per every-th frame with
    (n_frames, frame_idx, frame_w, frame_h, frame_sum) computed from
    actual pixels — the production shape of ffmpeg-style keyframe
    extraction, minus the compressed codec (that plug-point stays in
    ``sample_frames``'s stub path). Arrow-batched mapInPandas, 1:N
    fan-out inside the batch, no shuffle."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", n_frames int, frame_idx int, frame_w int,"
                   " frame_h int, frame_sum bigint")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, extra = [], {k: [] for k in (
                "n_frames", "frame_idx", "frame_w", "frame_h",
                "frame_sum")}
            for row_pos, b in enumerate(pdf[payload_col]):
                frames, meta = decode_y4m(bytes(b))
                for fi in range(0, frames.shape[0], every):
                    idx.append(row_pos)
                    extra["n_frames"].append(frames.shape[0])
                    extra["frame_idx"].append(fi)
                    extra["frame_w"].append(meta["width"])
                    extra["frame_h"].append(meta["height"])
                    extra["frame_sum"].append(
                        int(frames[fi].astype(np.int64).sum()))
            out = pdf.iloc[idx].reset_index(drop=True)
            for k, v in extra.items():
                out[k] = v
            yield out

    return df.mapInPandas(op, schema=schema_str)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: 1 row in → n_frames
    rows out via mapInPandas (the UDTF-shaped 1:N path). Frames are
    deterministic byte slices standing in for real decoded frames."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += ", frame_idx int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps = pdf.loc[pdf.index.repeat(n_frames)].reset_index(drop=True)
            reps["frame_idx"] = list(range(n_frames)) * len(pdf)
            reps["frame"] = [
                bytes(b)[i::n_frames] for b in pdf[payload_col]
                for i in range(n_frames)]
            yield reps

    return df.mapInPandas(op, schema=schema_str)


# ---------------------------------------------------------------------------
# Compressed-codec STRUCTURAL probes (r5). Full sample decode of
# mp3/aac/h264 remains the documented ffmpeg plug-point above, but the
# frame/NAL layer — validate, meter, and fingerprint 100 TB of crawled
# media without decoding a sample — is pure public-spec arithmetic
# (functions/mpeg_audio.py, functions/h264.py). Map-only Arrow kernels,
# one pass, no shuffle at any scale.
# ---------------------------------------------------------------------------

def fixture_mp3_stream(doc_id: int) -> bytes:
    """Formula-keyed spec-valid mp3 stream: sample rate by id mod 3,
    3..9 frames, per-frame bitrate index (CBR for even ids, VBR walk
    for odd), alternating padding bit, ID3v2 tag on every 4th id."""
    from ..functions.mpeg_audio import encode_mp3_frames
    n = 3 + doc_id % 7
    frames = [(1 + ((doc_id + (doc_id % 2) * i) % 14), (doc_id + i) % 2)
              for i in range(n)]
    id3 = (17 + doc_id % 23) if doc_id % 4 == 0 else 0
    return encode_mp3_frames(frames, doc_id % 3, id3_body=id3)


def encode_fixture_mp3s(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL mp3 frame chain per row (headers
    spec-valid, payload filler) — the encode half of the compressed-
    audio structural round-trip."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: fixture_mp3_stream(int(i)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def probe_audio_frames(df: DataFrame,
                       payload_col: str = "payload") -> DataFrame:
    """Structural mp3 probe: frame count, sample rate, CBR/VBR bitrate
    band, exact sample count → duration, ID3 overhead — all from the
    frame headers (functions/mpeg_audio.py), zero samples decoded."""
    from ..functions.mpeg_audio import probe_mp3
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", n_frames int, sample_rate int, kbps_min int"
                   ", kbps_max int, vbr boolean, total_samples bigint"
                   ", duration_ms bigint, id3_bytes int"
                   ", parsed_bytes bigint")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ("n_frames", "sample_rate", "kbps_min", "kbps_max",
                "vbr", "total_samples", "duration_ms", "id3_bytes",
                "parsed_bytes")
        for pdf in batches:
            cols = {k: [] for k in keys}
            for b in pdf[payload_col]:
                m = probe_mp3(bytes(b))
                for k in keys:
                    cols[k].append(m[k])
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def fixture_h264_stream(doc_id: int) -> bytes:
    """Formula-keyed Annex B stream: even non-mod-16 dimensions (real
    frame-cropping fields), profile sweep baseline/main/high (the high
    branch adds the chroma/bit-depth SPS fields), IDR every 3rd slice,
    slice payloads in 0x10..0xEE (no start-code emulation needed —
    the SPS path still exercises escape/unescape)."""
    from ..functions.h264 import build_annexb, encode_sps
    w = 300 + 2 * (doc_id % 11)
    h = 180 + 2 * (doc_id % 7)
    prof = (66, 77, 100)[doc_id % 3]
    lev = 30 + 10 * (doc_id % 3)
    n_sl = 2 + doc_id % 6
    slices = [(s % 3 == 0,
               bytes((doc_id * 7 + s * 13 + j * 29) % 223 + 16
                     for j in range(5 + s % 3)))
              for s in range(n_sl)]
    return build_annexb(encode_sps(w, h, prof, lev), b"\xc8\x42", slices)


def encode_fixture_h264s(df: DataFrame, id_col: str = "doc_id",
                         out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL Annex B H.264 structure per row
    (bit-exact SPS, start codes, NAL headers; slice payload filler)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: fixture_h264_stream(int(i)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def probe_video_structure(df: DataFrame,
                          payload_col: str = "payload") -> DataFrame:
    """Structural H.264 probe: resolution/profile/level from a real
    Exp-Golomb SPS parse, keyframe (IDR) and slice counts from the
    Annex B NAL walk (functions/h264.py) — zero pixels decoded."""
    from ..functions.h264 import probe_h264
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", width int, height int, profile_idc int"
                   ", level_idc int, n_sps int, n_pps int, n_idr int"
                   ", n_slices int")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ("width", "height", "profile_idc", "level_idc",
                "n_sps", "n_pps", "n_idr", "n_slices")
        for pdf in batches:
            cols = {k: [] for k in keys}
            for b in pdf[payload_col]:
                m = probe_h264(bytes(b))
                for k in keys:
                    cols[k].append(m[k])
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def fixture_aac_stream(doc_id: int) -> bytes:
    """Formula-keyed spec-valid ADTS stream: profile sweep
    Main/LC/SSR/LTP, sample rate by id mod 5, 1-3 channels, 2..7
    frames with varying payload length and 1-2 raw data blocks each,
    CRC-present header on every 3rd frame for even ids."""
    from ..functions.adts import encode_adts_frames
    n = 2 + doc_id % 6
    frames = [(100 + (doc_id * 3 + i * 17) % 200, 1 + (doc_id + i) % 2)
              for i in range(n)]
    return encode_adts_frames(
        frames, doc_id % 4, 3 + doc_id % 5, 1 + doc_id % 3,
        crc_every=3 if doc_id % 2 == 0 else 0)


def encode_fixture_aacs(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL ADTS frame chain per row (headers
    bit-exact per ISO 13818-7 §6.2, payload filler)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: fixture_aac_stream(int(i)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def probe_adts_frames(df: DataFrame,
                      payload_col: str = "payload") -> DataFrame:
    """Structural AAC/ADTS probe: frame/raw-block counts, profile,
    rate, channels, CRC-frame count, exact sample count → duration —
    all from the 7/9-byte headers (functions/adts.py), zero samples
    decoded. Map-only Arrow kernel, no shuffle at any scale."""
    from ..functions.adts import probe_adts
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", n_frames int, profile string, sample_rate int"
                   ", channels int, n_crc_frames int"
                   ", total_samples bigint, duration_ms bigint"
                   ", parsed_bytes bigint")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ("n_frames", "profile", "sample_rate", "channels",
                "n_crc_frames", "total_samples", "duration_ms",
                "parsed_bytes")
        for pdf in batches:
            cols = {k: [] for k in keys}
            for b in pdf[payload_col]:
                m = probe_adts(bytes(b))
                for k in keys:
                    cols[k].append(m[k])
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def fixture_mp4_stream(doc_id: int) -> bytes:
    """Formula-keyed spec-valid ISO-BMFF tree: brand/timescale/codec
    sweeps, non-round durations (exercise the ms floor division),
    audio trak dropped on every 3rd id, mvhd v1 on odd ids, 64-bit
    largesize mdat on every 5th id."""
    from ..functions.mp4 import encode_mp4
    ts = (1000, 90000, 600, 30000, 12288)[doc_id % 5]
    return encode_mp4(
        brand=(b"isom", b"mp42", b"avc1", b"dash")[doc_id % 4],
        timescale=ts,
        duration=ts * (3 + doc_id % 10) + doc_id % 7,
        width=320 + doc_id % 65,
        height=180 + doc_id % 37,
        video_codec=(b"avc1", b"hev1", b"av01")[doc_id % 3],
        audio_codec=(None if doc_id % 3 == 0
                     else (b"mp4a", b"opus")[doc_id % 2]),
        mdat_len=1000 + (doc_id * 37) % 5000,
        mvhd_version=doc_id % 2,
        largesize_mdat=doc_id % 5 == 0,
    )


def encode_fixture_mp4s(df: DataFrame, id_col: str = "doc_id",
                        out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL MP4 box tree per row (ISO 14496-12
    headers bit-exact; mdat filler)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: fixture_mp4_stream(int(i)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)


def probe_mp4_structure(df: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """Structural MP4 probe: brand, movie duration, track count,
    video dimensions + codec fourccs, mdat payload size, box count —
    from the box-tree walk (functions/mp4.py), zero samples touched.
    Map-only Arrow kernel, no shuffle at any scale."""
    from ..functions.mp4 import probe_mp4
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += (", major_brand string, timescale int"
                   ", duration_ms bigint, n_tracks int, width int"
                   ", height int, video_codec string"
                   ", audio_codec string, mdat_bytes bigint"
                   ", n_boxes int")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ("major_brand", "timescale", "duration_ms", "n_tracks",
                "width", "height", "video_codec", "audio_codec",
                "mdat_bytes", "n_boxes")
        for pdf in batches:
            cols = {k: [] for k in keys}
            for b in pdf[payload_col]:
                m = probe_mp4(bytes(b))
                for k in keys:
                    cols[k].append(m[k])
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(op, schema=schema_str)
