"""RFC 6587 octet-counted framing codec (sources/syslog_frames.py):
round trip, byte-length (not char-length) framing, and malformed
stream tolerance — the stream-payload subset of upstream
plugins/in_syslog TCP mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.sources.syslog_frames import (
    decode_octet_frames, encode_octet_frames, split_octet_stream,
)


def test_split_octet_stream_pure():
    enc = lambda msgs: b"".join(
        str(len(m.encode())).encode() + b" " + m.encode() for m in msgs)
    msgs = ["<13>hello", "", "body with 7 digits and spaces", "café"]
    assert split_octet_stream(enc(msgs)) == [(m, True) for m in msgs]
    # non-digit where a length is due → one trailing bad frame
    assert split_octet_stream(b"5 hello<garbage") == [
        ("hello", True), ("<garbage", False)]
    # truncated final frame keeps the evidence
    assert split_octet_stream(b"10 short") == [("10 short", False)]
    # absurd length is a framing error, not a swallow-the-stream
    assert split_octet_stream(b"9999999999 x") == [
        ("9999999999 x", False)]
    assert split_octet_stream(b"") == []


def test_octet_frames_roundtrip(spark):
    """decode(encode(x)) == x per group, frame order preserved, and a
    multi-byte message frames by its UTF-8 byte length."""
    rows = [("c1", 1, "<13>first"), ("c1", 2, "naïve café ✓"),
            ("c1", 3, ""), ("c2", 1, "only one 99 here")]
    df = spark.createDataFrame(
        rows, "conn string, seq int, msg string")
    streams = encode_octet_frames(df, "msg", group_col="conn",
                                  order_col="seq")
    enc = {r.group: r.stream for r in streams.collect()}
    # byte-length framing: '12 ' for a 12-byte UTF-8 message etc.
    assert enc["c1"].startswith("9 <13>first")
    assert f"{len('naïve café ✓'.encode())} naïve" in enc["c1"]
    got = {(r.group, r.frame_no): (r.msg, r.frame_ok)
           for r in decode_octet_frames(streams, "stream").collect()}
    assert got == {(c, s): (m, True) for c, s, m in rows}


def test_octet_frames_binary_and_bad_tail(spark):
    """BINARY stream columns decode identically, and a corrupt tail
    lands as one frame_ok=false row instead of poisoning the task."""
    df = spark.createDataFrame(
        [("k1", bytearray(b"2 ok5 hello:junk"))],
        "group string, stream binary")
    got = [(r.frame_no, r.msg, r.frame_ok)
           for r in decode_octet_frames(df, "stream").collect()]
    assert got == [(1, "ok", True), (2, "hello", True),
                   (3, ":junk", False)]
