"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data extension (not in the reference). Images/audio/video are
carried as ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` operators.

PNG payloads decode FOR REAL via the stdlib-only codec in
``functions/png.py`` (zlib + scanline unfilter — no PIL/cv2 needed):
``decode_images`` and the PNG path of ``resize_images`` operate on
actual pixels. Other formats (JPEG/audio/video) need codec libraries
absent from this container, so their kernels remain the documented
deterministic stub (``strict=True`` raises NotImplementedError — the
marker where PIL/ffmpeg plugs in).
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
