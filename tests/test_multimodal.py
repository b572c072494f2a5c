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


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py) — the r4 real-codec addition
# ---------------------------------------------------------------------------


def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant grey at quality 100 round-trips EXACTLY (DC-only
    blocks; the invariant the multimodal_jpeg_roundtrip oracle leans
    on), including non-multiple-of-8 dims (edge-block padding)."""
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from fluent_bit_spark.operators.multimodal import fixture_image_blocks
    for i in (0, 3, 7, 12, 40):
        img = fixture_image_blocks(i)
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert dec.shape == img.shape
        assert (dec == img).all()


def test_jpeg_lossy_roundtrip_bounded():
    """The AC/lossy path: random grey and smooth color content at
    quality 95 decode within a small bounded error (the standard codec
    sanity check when an external reference decoder is unavailable)."""
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(7)
    grey = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(grey, quality=95))
    err = np.abs(dec.astype(int) - grey.astype(int))
    assert err.max() <= 12 and err.mean() < 4.0
    x = np.linspace(0, 255, 32)
    y = np.linspace(0, 255, 24)
    rgb = np.stack([np.tile(x, (24, 1)), np.tile(y[:, None], (1, 32)),
                    (np.tile(x, (24, 1)) + np.tile(y[:, None], (1, 32)))
                    / 2], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="444"))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_jpeg_420_constant_mcus_exact():
    """4:2:0: 16×16-constant color MCUs survive chroma downsample +
    upsample exactly (2×2 mean of a constant is the constant)."""
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(2):
            img[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16] = [
                (bx * 90 + 10) % 256, (by * 70 + 40) % 256,
                (bx * 50 + by * 30 + 20) % 256]
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert (dec == img).all()


def test_jpeg_unsupported_modes_raise():
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg
    with pytest.raises(ValueError, match="baseline sequential"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05abc")  # progressive SOF2
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError, match="444|420"):
        encode_jpeg(np.zeros((8, 8), np.uint8), subsampling="422")


def test_jpeg_resize_path_in_operator(spark):
    """resize_images routes JPEG payloads through the REAL codec: the
    thumb is itself a decodable JPEG whose pixels approximate the
    nearest-neighbour resample of the original (re-encode at q95)."""
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from fluent_bit_spark.functions.png import resize_nearest
    from fluent_bit_spark.operators.multimodal import fixture_image_blocks
    rows = [(i, encode_jpeg(fixture_image_blocks(i), quality=100))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    th = {r.doc_id: bytes(r.thumb)
          for r in resize_images(df, "payload", 8, 8).collect()}
    for i in range(6):
        got = decode_jpeg(th[i])
        want = resize_nearest(fixture_image_blocks(i), 8, 8)
        assert got.shape == want.shape
        err = np.abs(got.astype(int) - want.astype(int))
        assert err.max() <= 12, err.max()


def test_jpeg_fixture_encoding_is_deterministic(spark):
    from fluent_bit_spark.operators.multimodal import encode_fixture_jpegs
    df = spark.range(0, 5).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: bytes(r.payload) for r in
         encode_fixture_jpegs(df).collect()}
    b = {r.doc_id: bytes(r.payload) for r in
         encode_fixture_jpegs(df.repartition(3)).collect()}
    assert a == b


def test_jpeg_block_constant_roundtrip_property():
    """Hypothesis: ANY block-constant greyscale image round-trips
    exactly at quality 100 — dims and block values drawn freely
    (exercises edge padding, DC prediction across arbitrary value
    jumps, huffman categories up to the extremes)."""
    from hypothesis import given, settings, strategies as st
    from fluent_bit_spark.functions.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32))
    def check(w, h, seed):
        import numpy as np
        rng = np.random.default_rng(seed)
        nbx, nby = -(-w // 8), -(-h // 8)
        blocks = rng.integers(0, 256, (nby, nbx), dtype=np.uint8)
        img = blocks.repeat(8, axis=0).repeat(8, axis=1)[:h, :w]
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert dec.shape == img.shape
        assert (dec == img).all()

    check()


# ---------------------------------------------------------------------------
# Audio (WAV) — r4
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo_oddlen():
    from fluent_bit_spark.functions.wav import decode_wav, encode_wav
    rng = np.random.default_rng(7)
    for channels in (1, 2, 4):
        for n in (1, 255, 256, 257):  # odd byte counts hit the pad byte
            s = rng.integers(-32768, 32768, (n, channels)).astype(np.int16)
            b = encode_wav(s, sample_rate=44100)
            assert len(b) % 2 == 0  # RIFF word alignment
            dec, rate = decode_wav(b)
            assert rate == 44100
            assert np.array_equal(dec, s)


def test_wav_tolerates_extra_chunks_and_rejects_garbage():
    import struct

    from fluent_bit_spark.functions.wav import decode_wav, encode_wav
    s = np.arange(-5, 5, dtype=np.int16)[:, None]
    b = bytearray(encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data (odd size → pad byte)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    fmt_end = 12 + 8 + 16
    spliced = bytes(b[:fmt_end]) + extra + bytes(b[fmt_end:])
    spliced = (spliced[:4] + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    dec, rate = decode_wav(spliced)
    assert np.array_equal(dec, s) and rate == 8000
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 32)
    with pytest.raises(ValueError):
        encode_wav(s.astype(np.int32))


def test_fixture_audio_formula():
    from fluent_bit_spark.operators.multimodal import fixture_audio
    s = fixture_audio(5)
    assert s.shape == (256 + 5 % 97, 2)
    assert s[3, 1] == (5 * 13 + 29 + 3 * 7) % 4096 - 2048


def test_decode_audio_real_samples(spark):
    from fluent_bit_spark.operators.multimodal import (
        decode_audio, encode_fixture_wavs, fixture_audio,
    )
    df = spark.range(12).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r
            for r in decode_audio(encode_fixture_wavs(df)).collect()}
    for i in range(12):
        s = fixture_audio(i).astype(np.int64)
        r = rows[i]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == \
            (8000, s.shape[1], s.shape[0])
        assert r["sample_sum"] == int(s.sum())
        assert r["abs_sum"] == int(np.abs(s).sum())
        assert r["peak"] == int(np.abs(s).max())


# ---------------------------------------------------------------------------
# Video (Y4M) — r4
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_mono_and_420():
    from fluent_bit_spark.functions.y4m import decode_y4m, encode_y4m
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (5, 10, 16)).astype(np.uint8)
    fr, meta = decode_y4m(encode_y4m(y, fps=(30, 1)))
    assert np.array_equal(fr, y)
    assert meta == {"width": 16, "height": 10, "fps": (30, 1),
                    "chroma": "mono"}
    c = rng.integers(0, 256, (5, 2, 5, 8)).astype(np.uint8)
    fr, meta = decode_y4m(encode_y4m(y, chroma=c))
    assert np.array_equal(fr, y)
    assert meta["chroma"] == "420jpeg"
    assert np.array_equal(meta["chroma_planes"], c)


def test_y4m_rejects_bad_payloads():
    from fluent_bit_spark.functions.y4m import decode_y4m, encode_y4m
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m\n")
    y = np.zeros((1, 4, 4), np.uint8)
    good = encode_y4m(y)
    with pytest.raises(ValueError):  # corrupt FRAME marker
        decode_y4m(good.replace(b"FRAME", b"FRUME"))
    with pytest.raises(ValueError):
        encode_y4m(y.astype(np.int16))


def test_sample_video_frames_real_pixels(spark):
    from fluent_bit_spark.operators.multimodal import (
        encode_fixture_y4ms, fixture_video, sample_video_frames,
    )
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    out = sample_video_frames(encode_fixture_y4ms(df), every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(10):
        v = fixture_video(i).astype(np.int64)
        rows = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == \
            list(range(0, v.shape[0], 2))
        for r in rows:
            assert (r["n_frames"], r["frame_h"], r["frame_w"]) == v.shape
            assert r["frame_sum"] == int(v[r["frame_idx"]].sum())
