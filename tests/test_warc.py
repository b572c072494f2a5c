"""WARC ingestion (sources/warc.py): record walk, gzip-member
transparency, malformed tolerance, 1:N Spark explode, file source."""

import gzip

import pytest

from fluent_bit_spark.sources.warc import (
    decode_warc,
    encode_fixture_warcs,
    encode_warc,
    fixture_warc_capture,
    parse_warc,
    py_encode_record,
    read_warc_files,
)


def _capture(gz: bool) -> bytes:
    body = "<html><body>hi</body></html>"
    payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
               f"{body}").encode()
    recs = [py_encode_record("warcinfo", b"software: x\r\n"),
            py_encode_record("response", payload,
                             target_uri="http://a.example/")]
    return encode_warc(recs, gzip_members=gz)


def test_parse_roundtrip_and_gzip_transparency():
    plain = parse_warc(_capture(False))
    gzipped = parse_warc(_capture(True))
    assert plain == gzipped
    assert [r["warc_type"] for r in plain] == ["warcinfo", "response"]
    info, resp = plain
    assert info["http_status"] is None and info["body"] is None
    assert info["content_length"] == len(b"software: x\r\n")
    assert resp["http_status"] == 200
    assert resp["body"] == "<html><body>hi</body></html>"
    assert resp["target_uri"] == "http://a.example/"
    assert all(r["rec_ok"] for r in plain)
    # Whole-archive gzip (single member over the concatenation) also
    # parses — member layout is a packaging convention, not framing.
    assert parse_warc(gzip.compress(_capture(False), mtime=0)) == plain


def test_parse_malformed_tolerance():
    cap = _capture(False)
    # Truncated mid-payload: warcinfo survives, the partial response
    # reports rec_ok=False with the recovered fields.
    recs = parse_warc(cap[:-40])
    assert recs[0]["rec_ok"] and not recs[-1]["rec_ok"]
    assert recs[-1]["warc_type"] == "response"
    assert recs[-1]["target_uri"] == "http://a.example/"
    # Garbage leader: single bad row, no exception.
    recs = parse_warc(b"NOT-A-WARC\r\n")
    assert recs == [recs[0]] and not recs[0]["rec_ok"]
    # Header line without a colon.
    bad = cap.replace(b"WARC-Type: warcinfo", b"WARC-Type warcinfo", 1)
    assert not parse_warc(bad)[0]["rec_ok"]
    # Content-Length missing.
    bad = cap.replace(b"Content-Length", b"X-Length", 1)
    assert not parse_warc(bad)[0]["rec_ok"]
    # Corrupt gzip stream raises (framing unrecoverable).
    with pytest.raises(Exception):
        parse_warc(b"\x1f\x8b" + b"\x00" * 30)


def test_fixture_formulas():
    for i in (0, 1, 5, 17, 23):
        recs = parse_warc(fixture_warc_capture(i))
        assert len(recs) == 3 + i % 4
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["content_length"] == 28
        for j, r in enumerate(recs[1:]):
            assert r["warc_type"] == "response"
            assert r["target_uri"] == f"http://h{i}.example/p{j}"
            assert r["http_status"] == (200, 404, 301)[(i + j) % 3]
            assert r["body"] == (f"<html><body>doc {i} rec {j} "
                                 + "x" * (i % 50) + "</body></html>")
            assert r["content_length"] == 38 + len(
                ("200 OK", "404 Not Found",
                 "301 Moved Permanently")[(i + j) % 3]) + len(r["body"])
        # gzip-member form on every 3rd id, plain otherwise.
        assert (fixture_warc_capture(i)[:2] == b"\x1f\x8b") == (i % 3 == 0)


def test_decode_warc_spark_explode(spark):
    df = spark.range(12).withColumnRenamed("id", "doc_id")
    rows = decode_warc(encode_fixture_warcs(df)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(12):
        expect = parse_warc(fixture_warc_capture(i))
        got = sorted(by_doc[i], key=lambda r: r["rec_idx"])
        assert len(got) == len(expect) == 3 + i % 4
        for g, e in zip(got, expect):
            for k, v in e.items():
                assert g[k] == v, (i, k)


def test_read_warc_files(spark, tmp_path):
    for i in range(4):
        ext = "warc.gz" if i % 3 == 0 else "warc"
        (tmp_path / f"cap{i}.{ext}").write_bytes(fixture_warc_capture(i))
    out = read_warc_files(spark, str(tmp_path)).collect()
    assert len(out) == sum(3 + i % 4 for i in range(4))
    # Every row carries its archive path; responses carry bodies.
    assert all(r["path"].startswith("file:") for r in out)
    n_resp = sum(1 for r in out if r["warc_type"] == "response")
    assert n_resp == sum(2 + i % 4 for i in range(4))
    assert all(r["body"] is not None
               for r in out if r["warc_type"] == "response")


def test_warc_stream_landing_dir(spark, tmp_path):
    """Streaming twin: archives dropped in a landing dir arrive as
    decoded records (availableNow drain) — identical rows to the
    batch file source over the same files."""
    from fluent_bit_spark.sources.warc import read_warc_files_stream

    land = tmp_path / "land"
    land.mkdir()
    for i in range(6):
        ext = "warc.gz" if i % 3 == 0 else "warc"
        (land / f"cap{i}.{ext}").write_bytes(fixture_warc_capture(i))
    q = (read_warc_files_stream(spark, str(land), max_files=2)
         .writeStream.format("memory").queryName("warc_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select * from warc_stream").collect()
    want = read_warc_files(spark, str(land)).collect()
    order = lambda t: (t[0], t[1] if t[1] is not None else -1)
    assert sorted(map(tuple, got), key=order) \
        == sorted(map(tuple, want), key=order)
