"""Multimodal path: stdlib PNG codec + real-pixel decode/resize kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.png import (
    decode_png, encode_png, resize_nearest,
)
from fluent_bit_spark.operators.multimodal import (
    decode_images, encode_fixture_pngs, fixture_image, resize_images,
)


def test_png_roundtrip_all_shapes_and_filters():
    # >=5 rows per image exercises every scanline filter (encoder
    # cycles 0..4); grey / RGB / RGBA cover the supported color types.
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (11, 5), (16, 9, 3), (7, 13, 4), (1, 1)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()


def test_png_rejects_non_png_and_bad_filter():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")


def test_resize_nearest_integer_mapping():
    px = np.arange(10 * 6, dtype=np.uint8).reshape(6, 10)
    r = resize_nearest(px, 4, 4)
    for yd in range(4):
        for xd in range(4):
            assert r[yd, xd] == px[(yd * 6) // 4, (xd * 10) // 4]


def test_fixture_image_formula():
    px = fixture_image(3)
    assert px.shape == (8 + 3 % 7, 8 + 3 % 5)
    assert px[2, 4] == (3 * 31 + 4 * 7 + 2 * 13) % 256


def test_decode_resize_real_pixels(spark):
    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    pngs = encode_fixture_pngs(df)
    dec = decode_images(pngs)
    rows = {r.doc_id: r for r in dec.collect()}
    for i in range(12):
        exp = fixture_image(i)
        assert rows[i].width == exp.shape[1]
        assert rows[i].height == exp.shape[0]
        assert rows[i].pixel_sum == int(exp.astype(np.int64).sum())
    # real PNG resize path: thumb is itself a decodable PNG whose
    # pixels equal the nearest-neighbour resample of the original
    th = {r.doc_id: bytes(r.thumb)
          for r in resize_images(pngs, "payload", 4, 4).collect()}
    for i in range(12):
        got = decode_png(th[i])
        assert (got == resize_nearest(fixture_image(i), 4, 4)).all()


def test_resize_strict_raises_for_non_png(spark):
    df = spark.createDataFrame([(1, b"not a png")], "id long, payload binary")
    out = resize_images(df, "payload", 4, 4, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        out.collect()
    # non-strict non-PNG falls back to the documented byte stub
    row = resize_images(df, "payload", 2, 2).collect()[0]
    assert len(row.thumb) > 0


def test_fixture_encoding_is_deterministic(spark):
    df = spark.range(0, 5).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: bytes(r.payload) for r in
         encode_fixture_pngs(df).collect()}
    b = {r.doc_id: bytes(r.payload) for r in
         encode_fixture_pngs(df.repartition(3)).collect()}
    assert a == b
