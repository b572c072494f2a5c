"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data extension (not in the reference). Images/audio/video are
carried as ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` operators. The
image/audio codec libraries are NOT in this container, so the decode
kernel is stubbed (deterministic fake keyed on the payload hash, or
NotImplementedError in strict mode) — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """Resize plumbing for image payloads: 1:1 mapInPandas adding a
    ``thumb binary`` column plus its (thumb_w, thumb_h) dims.

    The resize kernel is STUBBED (container has no PIL/cv2): the thumb
    is a deterministic byte downsample of the payload to width·height
    bytes — a stand-in with the right cardinality and batch shape.
    ``strict=True`` raises NotImplementedError, the marker that a real
    codec+resampler must be plugged in here (swap ``_fake_resize`` for
    ``PIL.Image.open(io.BytesIO(b)).resize((w, h))``)."""
    if strict:
        raise NotImplementedError(
            "real image resize requires PIL/cv2, absent in this "
            "container; strict=False runs the deterministic stub")
    n_bytes = width * height

    def _fake_resize(b: bytes) -> bytes:
        if len(b) == 0:
            return b""
        step = max(1, len(b) // n_bytes)
        return bytes(b[::step][:n_bytes])

    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary, thumb_w int, thumb_h int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(
                lambda b: _fake_resize(bytes(b)))
            pdf["thumb_w"] = width
            pdf["thumb_h"] = height
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
