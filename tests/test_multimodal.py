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


# ---------------------------------------------------------------------------
# Compressed-codec structural probes (r5): mp3 frame chain, H.264 Annex B
# ---------------------------------------------------------------------------


def test_mp3_probe_cbr_vbr_id3_and_truncation():
    from fluent_bit_spark.functions.mpeg_audio import (
        encode_mp3_frames, frame_length, probe_mp3,
    )
    # CBR, no ID3: 4 frames at 128 kbps / 44100, alternating padding.
    b = encode_mp3_frames([(9, i % 2) for i in range(4)], 0)
    m = probe_mp3(b)
    assert m["n_frames"] == 4 and m["sample_rate"] == 44100
    assert (m["kbps_min"], m["kbps_max"], m["vbr"]) == (128, 128, False)
    assert m["total_samples"] == 4 * 1152
    assert m["duration_ms"] == 4 * 1152 * 1000 // 44100
    assert m["parsed_bytes"] == len(b) == sum(
        frame_length(128, 44100, i % 2) for i in range(4))
    # VBR with ID3v2 tag: sizes and flags tracked.
    b = encode_mp3_frames([(1, 0), (14, 1), (5, 0)], 1, id3_body=300)
    m = probe_mp3(b)
    assert (m["kbps_min"], m["kbps_max"], m["vbr"]) == (32, 320, True)
    assert m["sample_rate"] == 48000 and m["id3_bytes"] == 310
    assert m["parsed_bytes"] == len(b)
    # Truncated trailing frame: complete frames only, parse stops clean.
    m2 = probe_mp3(b[:-3])
    assert m2["n_frames"] == 2 and m2["parsed_bytes"] < len(b) - 3


def test_mp3_probe_rejects_bad_streams():
    from fluent_bit_spark.functions.mpeg_audio import (
        encode_mp3_frames, probe_mp3,
    )
    with pytest.raises(ValueError, match="lost sync"):
        probe_mp3(b"\x00\x00\x00\x00")
    good = encode_mp3_frames([(9, 0)], 0)
    with pytest.raises(ValueError, match="Layer III"):
        probe_mp3(bytes((good[0], good[1] & ~0x08)) + good[2:])  # MPEG-2
    with pytest.raises(ValueError, match="bad bitrate"):
        probe_mp3(bytes((good[0], good[1], 0xF0, 0)) + good[4:])
    with pytest.raises(ValueError, match="no complete"):
        probe_mp3(good[:-1])
    with pytest.raises(ValueError, match="changed mid-stream"):
        probe_mp3(encode_mp3_frames([(9, 0)], 0)
                  + encode_mp3_frames([(9, 0)], 1))


def test_h264_rbsp_escape_roundtrip_property():
    from fluent_bit_spark.functions.h264 import escape_rbsp, unescape_rbsp
    import itertools
    # Exhaustive over short strings from the dangerous alphabet.
    for n in range(1, 5):
        for tup in itertools.product((0, 1, 2, 3, 0xFF), repeat=n):
            raw = bytes(tup)
            esc = escape_rbsp(raw)
            assert unescape_rbsp(esc) == raw
            # No forbidden 00 00 0x (x<=2) survives escaping; 00 00 03
            # is the legal emulation-prevention form itself (§7.4.1).
            for i in range(len(esc) - 2):
                assert not (esc[i] == 0 and esc[i + 1] == 0
                            and esc[i + 2] <= 2)


def test_h264_sps_roundtrip_crop_and_profiles():
    from fluent_bit_spark.functions.h264 import encode_sps, parse_sps
    for w, h in ((320, 192), (322, 182), (1920, 1080), (16, 16), (2, 2)):
        for prof in (66, 77, 100):
            m = parse_sps(encode_sps(w, h, prof, 41))
            assert (m["width"], m["height"]) == (w, h)
            assert (m["profile_idc"], m["level_idc"]) == (prof, 41)
    with pytest.raises(ValueError, match="even"):
        encode_sps(321, 180)


def test_h264_probe_annexb_walk():
    from fluent_bit_spark.functions.h264 import (
        build_annexb, encode_sps, probe_h264,
    )
    slices = [(True, b"\x55" * 6), (False, b"\x66" * 4), (False, b"\x20")]
    b = build_annexb(encode_sps(640, 360, 100, 31), b"\xc8\x42", slices)
    m = probe_h264(b)
    assert (m["width"], m["height"]) == (640, 360)
    assert (m["profile_idc"], m["level_idc"]) == (100, 31)
    assert (m["n_sps"], m["n_pps"], m["n_idr"], m["n_slices"]) == (1, 1, 1, 3)
    with pytest.raises(ValueError, match="start code"):
        probe_h264(b"\xff" * 12)
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        probe_h264(b"\x00\x00\x01\x80")
    with pytest.raises(ValueError, match="no SPS"):
        probe_h264(b"\x00\x00\x01" + bytes((0x41,)) + b"\x99")


def test_mp3_h264_probe_spark_paths(spark):
    from fluent_bit_spark.operators.multimodal import (
        encode_fixture_h264s, encode_fixture_mp3s, fixture_h264_stream,
        fixture_mp3_stream, probe_audio_frames, probe_video_structure,
    )
    from fluent_bit_spark.functions.h264 import probe_h264
    from fluent_bit_spark.functions.mpeg_audio import probe_mp3
    df = spark.range(24).withColumnRenamed("id", "doc_id")
    audio = {r["doc_id"]: r.asDict()
             for r in probe_audio_frames(encode_fixture_mp3s(df)).collect()}
    video = {r["doc_id"]: r.asDict()
             for r in probe_video_structure(
                 encode_fixture_h264s(df)).collect()}
    for i in range(24):
        am = probe_mp3(fixture_mp3_stream(i))
        vm = probe_h264(fixture_h264_stream(i))
        for k, v in am.items():
            assert audio[i][k] == v, (i, k)
        for k, v in vm.items():
            assert video[i][k] == v, (i, k)
        # Fixture-formula expectations, independent of the prober:
        assert audio[i]["n_frames"] == 3 + i % 7
        assert audio[i]["vbr"] == (i % 2 == 1 and 3 + i % 7 > 1)
        assert video[i]["width"] == 300 + 2 * (i % 11)
        assert video[i]["n_idr"] == (2 + i % 6 + 2) // 3


def test_adts_probe_fields_crc_and_truncation():
    from fluent_bit_spark.functions.adts import encode_adts_frames, probe_adts
    # LC stereo at 44100, 3 frames, 2 blocks on frame 1, CRC on frame 0.
    b = encode_adts_frames([(64, 1), (80, 2), (96, 1)], 1, 4, 2,
                           crc_every=3)
    m = probe_adts(b)
    assert (m["n_frames"], m["profile"], m["sample_rate"],
            m["channels"]) == (3, "LC", 44100, 2)
    assert m["n_crc_frames"] == 1
    assert m["total_samples"] == 4 * 1024
    assert m["duration_ms"] == 4 * 1024 * 1000 // 44100
    assert m["parsed_bytes"] == len(b) == 9 + 64 + 7 + 80 + 7 + 96
    # Truncated trailing frame: complete frames only.
    m2 = probe_adts(b[:-1])
    assert m2["n_frames"] == 2 and m2["parsed_bytes"] == 9 + 64 + 7 + 80
    # 7.1-style channel_config crossing the byte boundary (bit 2 in
    # byte 2, bits 1-0 in byte 3).
    assert probe_adts(encode_adts_frames([(10, 1)], 0, 7, 7))[
        "channels"] == 7


def test_adts_probe_rejects_bad_streams():
    from fluent_bit_spark.functions.adts import encode_adts_frames, probe_adts
    good = encode_adts_frames([(32, 1)], 1, 4, 2)
    with pytest.raises(ValueError, match="lost sync"):
        probe_adts(b"\x00" * 8)
    with pytest.raises(ValueError, match="layer"):
        probe_adts(bytes((good[0], good[1] | 0b010)) + good[2:])
    with pytest.raises(ValueError, match="reserved sampling"):
        probe_adts(bytes((good[0], good[1], (good[2] & 0xC3) | (15 << 2)))
                   + good[3:])
    with pytest.raises(ValueError, match="channel_config 0"):
        probe_adts(bytes((good[0], good[1], good[2] & ~1,
                          good[3] & 0x3F)) + good[4:])
    with pytest.raises(ValueError, match="no complete"):
        probe_adts(good[:-1])
    with pytest.raises(ValueError, match="changed mid-stream"):
        probe_adts(good + encode_adts_frames([(32, 1)], 2, 4, 2))
    with pytest.raises(ValueError, match="shorter than header"):
        bad = bytearray(good)
        bad[3] &= 0b11000000   # frame_length high bits -> 0
        bad[4] = 0
        bad[5] &= 0b00011111   # frame_length -> 0
        probe_adts(bytes(bad))


def test_aac_probe_spark_path(spark):
    from fluent_bit_spark.operators.multimodal import (
        encode_fixture_aacs, fixture_aac_stream, probe_adts_frames,
    )
    from fluent_bit_spark.functions.adts import probe_adts
    df = spark.range(24).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r.asDict()
           for r in probe_adts_frames(encode_fixture_aacs(df)).collect()}
    for i in range(24):
        m = probe_adts(fixture_aac_stream(i))
        for k, v in m.items():
            assert got[i][k] == v, (i, k)
        # Fixture-formula expectations, independent of the prober:
        n = 2 + i % 6
        assert got[i]["n_frames"] == n
        assert got[i]["profile"] == ("Main", "LC", "SSR", "LTP")[i % 4]
        assert got[i]["channels"] == 1 + i % 3
        assert got[i]["n_crc_frames"] == ((n + 2) // 3 if i % 2 == 0 else 0)
        assert got[i]["total_samples"] == 1024 * (n + (n + i % 2) // 2)


def test_mp4_probe_box_walk_versions_and_largesize():
    from fluent_bit_spark.functions.mp4 import encode_mp4, probe_mp4
    for ver, large in ((0, False), (1, True)):
        b = encode_mp4(b"isom", 90000, 90000 * 7 + 3, 1920, 1080,
                       b"avc1", b"mp4a", 4096,
                       mvhd_version=ver, largesize_mdat=large)
        m = probe_mp4(b)
        assert m["major_brand"] == "isom"
        assert m["timescale"] == 90000
        assert m["duration_ms"] == (90000 * 7 + 3) * 1000 // 90000
        assert (m["n_tracks"], m["width"], m["height"]) == (2, 1920, 1080)
        assert (m["video_codec"], m["audio_codec"]) == ("avc1", "mp4a")
        assert m["mdat_bytes"] == 4096
        assert m["n_boxes"] == 20
    # Video-only tree: audio fourcc stays NULL, box count shrinks.
    m = probe_mp4(encode_mp4(b"mp42", 600, 1200, 640, 360, b"hev1",
                             None, 10))
    assert m["audio_codec"] is None and m["n_tracks"] == 1
    assert m["n_boxes"] == 12


def test_mp4_probe_rejects_bad_trees():
    from fluent_bit_spark.functions.mp4 import encode_mp4, probe_mp4
    good = encode_mp4(b"isom", 1000, 5000, 320, 240, b"avc1", None, 50)
    with pytest.raises(ValueError, match="no ftyp"):
        probe_mp4(good[24:])          # strip the ftyp box
    with pytest.raises(ValueError, match="overruns"):
        bad = bytearray(good)
        bad[0:4] = b"\x7f\xff\xff\xff"  # ftyp size far past EOF
        probe_mp4(bytes(bad))
    with pytest.raises(ValueError, match="truncated box header"):
        probe_mp4(good + b"\x00\x00\x00")
    with pytest.raises(ValueError, match="no moov/mvhd"):
        probe_mp4(good[:24])          # ftyp alone
    with pytest.raises(ValueError, match="mvhd version"):
        bad = bytearray(good)
        i = bad.index(b"mvhd") + 4
        bad[i] = 9
        probe_mp4(bytes(bad))


def test_mp4_size_zero_to_eof():
    from fluent_bit_spark.functions.mp4 import encode_mp4, probe_mp4
    import struct
    b = bytearray(encode_mp4(b"isom", 1000, 2000, 64, 64, b"avc1",
                             None, 100))
    i = b.index(b"mdat") - 4
    assert struct.unpack_from(">I", b, i)[0] == 108
    b[i:i + 4] = b"\x00\x00\x00\x00"  # size 0 = to EOF (§4.2)
    assert probe_mp4(bytes(b))["mdat_bytes"] == 100


def test_mp4_probe_spark_path(spark):
    from fluent_bit_spark.operators.multimodal import (
        encode_fixture_mp4s, fixture_mp4_stream, probe_mp4_structure,
    )
    from fluent_bit_spark.functions.mp4 import probe_mp4
    df = spark.range(30).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r.asDict()
           for r in probe_mp4_structure(encode_fixture_mp4s(df)).collect()}
    for i in range(30):
        m = probe_mp4(fixture_mp4_stream(i))
        for k, v in m.items():
            assert got[i][k] == v, (i, k)
        # Fixture-formula expectations, independent of the prober:
        ts = (1000, 90000, 600, 30000, 12288)[i % 5]
        assert got[i]["duration_ms"] == (ts * (3 + i % 10) + i % 7) \
            * 1000 // ts
        assert got[i]["n_tracks"] == (1 if i % 3 == 0 else 2)
        assert got[i]["n_boxes"] == (12 if i % 3 == 0 else 20)
        assert got[i]["mdat_bytes"] == 1000 + (i * 37) % 5000
