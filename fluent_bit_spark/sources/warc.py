"""WARC (Web ARChive) ingestion — the file format every web-crawl
training-data pipeline reads first.

Training-data extension (upstream fluent-bit has no in_warc; this is
the crawl-corpus analogue of the file-subset sources — forward / OTLP
/ kafka / journal). The format is public and small (ISO 28500 /
WARC/1.0, the Common Crawl interchange format):

* a record is ``WARC/1.0\\r\\n`` + ``Name: value\\r\\n`` header lines +
  ``\\r\\n`` + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``;
* a ``response`` record's payload is an HTTP message (status line,
  headers, blank line, body);
* crawl archives are conventionally **gzip-compressed at record
  level** — each record its own gzip member, so a reader can split a
  ~1 GB ``.warc.gz`` at member boundaries; stdlib ``zlib`` walks the
  member chain (``decompressobj(wbits=31)`` + ``unused_data``).

:func:`decode_warc` is a 1:N Arrow kernel (``mapInPandas``): one
capture blob in, one row per WARC record out — gzip detected by
magic, HTTP status/body split out of response payloads,
tolerate-and-null on malformed records (``rec_ok=false``) in the
parser-family posture. Map-only: captures distribute one-per-task and
records never shuffle to be parsed, so the plan at 100 TB of
``.warc.gz`` is scan → explode → downstream (the html_text → C4 →
pack chain in operators/web.py / tokens.py takes the ``body`` column
from here). :func:`read_warc_files` is the file-source surface
(``binaryFile`` scan, one blob per archive, no driver-side I/O).

Two-sided posture (functions/msgpack.py precedent): the encoder
(:func:`py_encode_record` / :func:`encode_warc`) and the record walk
(:func:`parse_warc`) are written against the spec separately, and the
``warc_ingest`` oracle (queries.py) reconstructs every field — URIs,
status codes, Content-Length byte counts, bodies — arithmetically
from the fixture formulas.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_VERSION = b"WARC/1.0"
# Deterministic record date: WARC-Date is mandatory (ISO 28500 §5.4);
# fixtures pin it so captures are byte-reproducible.
FIXTURE_DATE = "2026-01-01T00:00:00Z"


def py_encode_record(warc_type: str, payload: bytes,
                     target_uri: str | None = None,
                     record_id: str = "urn:x-fixture:0") -> bytes:
    """One WARC/1.0 record (uncompressed bytes)."""
    lines = [WARC_VERSION,
             b"WARC-Type: " + warc_type.encode(),
             b"WARC-Record-ID: <" + record_id.encode() + b">",
             b"WARC-Date: " + FIXTURE_DATE.encode()]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def encode_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into an archive; ``gzip_members=True``
    compresses each record as its own gzip member (the Common Crawl
    record-level convention; mtime pinned for reproducibility)."""
    if not gzip_members:
        return b"".join(records)
    return b"".join(gzip.compress(r, mtime=0) for r in records)


def _gunzip_members(buf: bytes) -> bytes:
    out = bytearray()
    while buf:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(buf)
        out += d.flush()
        if d.unused_data == buf:
            raise ValueError("gzip member made no progress")
        buf = d.unused_data
    return bytes(out)


_HTTP_MAGIC = b"HTTP/1."


def parse_warc(buf: bytes) -> list[dict]:
    """Record walk over an archive blob (gzip-member or plain).

    Returns one dict per record: ``rec_idx, warc_type, target_uri,
    http_status, content_length, body, rec_ok``. A response payload
    is split at the HTTP head/body boundary; non-HTTP payloads carry
    ``body=None``. A malformed record yields ``rec_ok=False`` with
    the fields recovered so far and ends the walk (framing is
    byte-exact — after a bad Content-Length there is no resync point,
    exactly like a corrupt forward chunk).
    """
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    out: list[dict] = []
    pos, idx = 0, 0

    def bad(**partial) -> None:
        out.append({"rec_idx": idx, "warc_type": None,
                    "target_uri": None, "http_status": None,
                    "content_length": None, "body": None,
                    "rec_ok": False, **partial})

    while pos < len(buf):
        while buf[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(buf):
            break
        eol = buf.find(b"\r\n", pos)
        if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
            bad()
            return out
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(b"\r\n", pos)
            if eol < 0:
                bad()
                return out
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            key, sep, val = line.partition(b":")
            if not sep:
                bad()
                return out
            headers[key.strip().decode("latin1").lower()] = \
                val.strip().decode("latin1")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            bad(warc_type=headers.get("warc-type"))
            return out
        if pos + clen > len(buf):
            bad(warc_type=headers.get("warc-type"),
                target_uri=headers.get("warc-target-uri"),
                content_length=clen)
            return out
        payload = buf[pos:pos + clen]
        pos += clen
        status = body = None
        if payload.startswith(_HTTP_MAGIC):
            head_end = payload.find(b"\r\n\r\n")
            if head_end >= 0:
                status_line = payload[:payload.find(b"\r\n")]
                parts = status_line.split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = payload[head_end + 4:].decode("latin1")
        out.append({"rec_idx": idx,
                    "warc_type": headers.get("warc-type"),
                    "target_uri": headers.get("warc-target-uri"),
                    "http_status": status,
                    "content_length": clen,
                    "body": body,
                    "rec_ok": True})
        idx += 1
    return out


_REC_SCHEMA = (", rec_idx int, warc_type string, target_uri string"
               ", http_status int, content_length bigint, body string"
               ", rec_ok boolean")

_REC_KEYS = ("rec_idx", "warc_type", "target_uri", "http_status",
             "content_length", "body", "rec_ok")


def decode_warc(df: DataFrame, col: str = "payload") -> DataFrame:
    """1:N record explode: one input capture row → one output row per
    WARC record, carrying every input column except the blob."""
    keep = [f for f in df.schema.fields if f.name != col]
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in keep) + _REC_SCHEMA

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keep_names = [f.name for f in keep]
        for pdf in batches:
            rows = []
            # zip over column lists, not iterrows (a Series per row is
            # the expensive idiom; the walk itself dominates already)
            for vals in zip(*(pdf[n].tolist() for n in keep_names),
                            pdf[col].tolist()):
                base = dict(zip(keep_names, vals[:-1]))
                for rec in parse_warc(bytes(vals[-1])):
                    rows.append({**base,
                                 **{k: rec[k] for k in _REC_KEYS}})
            yield pd.DataFrame(rows,
                               columns=keep_names + list(_REC_KEYS))

    return df.mapInPandas(op, schema=schema_str)


def read_warc_files(spark, path: str) -> DataFrame:
    """File-source surface: ``binaryFile`` scan (one blob per archive,
    pushdown-pruned path listing, no driver I/O) → record explode.
    For 100 TB of ~1 GB ``.warc.gz``, one archive = one task; finer
    parallelism comes from the archive count, the crawl layout's own
    unit."""
    blobs = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    return decode_warc(blobs, col="content")


def read_warc_files_stream(spark, path: str,
                           max_files: int | None = None) -> DataFrame:
    """Streaming twin: a landing-directory tail of ``.warc``/
    ``.warc.gz`` archives — the continuous-arrival shape of a crawl
    feed, same posture as the forward / kafka / journal landing-dir
    twins. ``maxFilesPerTrigger`` bounds per-micro-batch work (one
    archive = one task)."""
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary"))
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    blobs = reader.load(path).select("path", "content")
    return decode_warc(blobs, col="content")


# ---------------------------------------------------------------------------
# Formula-keyed fixture captures (oracle-reconstructable)
# ---------------------------------------------------------------------------

_STATUS = ((200, "200 OK"), (404, "404 Not Found"),
           (301, "301 Moved Permanently"))
_INFO_BODY = b"software: fluent-bit-spark\r\n"


def fixture_warc_capture(doc_id: int) -> bytes:
    """One warcinfo record + 2..5 response records, every field a pure
    integer/string formula (the warc_ingest oracle recomputes all of
    them in SQL); every 3rd id gzip-member-compressed — parsed output
    must be identical (transparency)."""
    recs = [py_encode_record("warcinfo", _INFO_BODY,
                             record_id=f"urn:x-fixture:{doc_id}:info")]
    for i in range(2 + doc_id % 4):
        _, status_text = _STATUS[(doc_id + i) % 3]
        body = (f"<html><body>doc {doc_id} rec {i} "
                + "x" * (doc_id % 50) + "</body></html>")
        payload = (f"HTTP/1.1 {status_text}\r\n"
                   f"Content-Type: text/html\r\n\r\n{body}"
                   ).encode()
        recs.append(py_encode_record(
            "response", payload,
            target_uri=f"http://h{doc_id}.example/p{i}",
            record_id=f"urn:x-fixture:{doc_id}:{i}"))
    return encode_warc(recs, gzip_members=doc_id % 3 == 0)


def encode_fixture_warcs(df: DataFrame, id_col: str = "doc_id",
                         out_col: str = "payload") -> DataFrame:
    """mapInPandas producing a REAL WARC capture per row (spec-valid
    records; gzip members on every 3rd id)."""
    schema_str = ",".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    schema_str += f", {out_col} binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[id_col].map(
                lambda i: fixture_warc_capture(int(i)))
            yield pdf

    return df.mapInPandas(op, schema=schema_str)
