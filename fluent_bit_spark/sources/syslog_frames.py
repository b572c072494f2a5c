"""RFC 6587 octet-counted syslog framing — the stream-payload subset
of upstream:plugins/in_syslog (TCP mode) and out_syslog.

Reference semantics: syslog over TCP concatenates messages with
octet-counting framing — ``MSG-LEN SP MSG`` where MSG-LEN is the byte
length of MSG in decimal ASCII (RFC 6587 §3.4.1; upstream's tcp
conn handler splits the connection buffer exactly this way). The
listener socket itself is a connector and stays out, same posture as
forward/OTLP/http: what a capture/replay file holds per row is one
connection's byte stream, and the codec here makes those bytes real.

- :func:`encode_octet_frames` — Catalyst-only: per group (connection),
  records render to ``len SP msg`` frames and concatenate in order.
  Lengths count BYTES (``octet_length``), not characters — a UTF-8
  message with multi-byte characters frames by its encoded size.
- :func:`decode_octet_frames` — the inverse: an Arrow kernel walks
  each stream sequentially (framing is self-delimiting, inherently
  order-dependent — no regex/split can express it safely because
  message bodies may contain ``digits SP``). Python runs per stream
  buffer, not per message. Malformed framing (non-digit where a
  length is due, or a truncated final frame) yields one trailing row
  with ``frame_ok=false`` carrying the undecodable remainder —
  tolerate-and-null, parser-family posture; upstream closes the
  connection on a framing error and the partial buffer is lost, a
  replayable batch engine keeps the evidence instead.

Round-trip ``decode(encode(x)) == x`` is pinned by tests and by the
``syslog_octet_roundtrip`` oracle. Scale shape: encode is one hash
exchange keyed by the stream id with bounded frames per stream
(connection captures are chunk-bounded like forward chunks); decode
distributes one stream row per task and is map-only.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# framing sanity bound: RFC 5424 transports commonly cap messages at
# 8 KiB..64 KiB; a parsed length beyond this is treated as a framing
# error rather than an instruction to swallow the rest of the stream
MAX_FRAME_LEN = 1 << 20


def encode_octet_frames(df: DataFrame, msg_col: str, *,
                        group_col: str, order_col: str,
                        out: str = "stream") -> DataFrame:
    """Rows → one octet-framed stream per group:
    ``(group, n_frames, stream)``. Frame order is ``order_col`` within
    the group (a TCP sender writes in order; a reproducible rule is
    the batch analogue)."""
    frame = F.concat(F.octet_length(F.col(msg_col)).cast("string"),
                     F.lit(" "), F.col(msg_col))
    return (df.groupBy(F.col(group_col).alias("group"))
            .agg(F.count("*").alias("n_frames"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col(order_col).alias("o"),
                                      frame.alias("f")))),
                         lambda s: s["f"]),
                     "").alias(out)))


def split_octet_stream(buf: bytes,
                       max_len: int = MAX_FRAME_LEN
                       ) -> list[tuple[str | None, bool]]:
    """One stream buffer → ordered ``(msg, ok)`` list. Pure-Python
    core shared by the Arrow kernel and its unit tests; messages
    decode as UTF-8 (errors → replacement chars, never an abort)."""
    frames: list[tuple[str | None, bool]] = []
    pos, n = 0, len(buf)
    while pos < n:
        sp = buf.find(b" ", pos)
        head = buf[pos:sp] if sp != -1 else b""
        if sp == -1 or not head.isdigit() or len(head) > 9:
            frames.append(
                (buf[pos:].decode("utf-8", "replace"), False))
            break
        length = int(head)
        end = sp + 1 + length
        if length > max_len or end > n:
            frames.append(
                (buf[pos:].decode("utf-8", "replace"), False))
            break
        frames.append(
            (buf[sp + 1:end].decode("utf-8", "replace"), True))
        pos = end
    return frames


def decode_octet_frames(df: DataFrame, stream_col: str,
                        group_col: str = "group",
                        max_len: int = MAX_FRAME_LEN) -> DataFrame:
    """Octet-framed streams → ``(group, frame_no, msg, frame_ok)``,
    one row per message, ``frame_no`` 1-based in stream order. The
    stream column may be BINARY or STRING (capture files land both)."""
    import pyarrow as pa

    def gen(batches: Iterator[pa.RecordBatch]
            ) -> Iterator[pa.RecordBatch]:
        for b in batches:
            groups: list = []
            nos: list[int] = []
            msgs: list[str | None] = []
            oks: list[bool] = []
            for grp, buf in zip(b.column(0).to_pylist(),
                                b.column(1).to_pylist()):
                if buf is None:
                    continue
                raw = buf if isinstance(buf, bytes) \
                    else str(buf).encode("utf-8")
                for i, (msg, ok) in enumerate(
                        split_octet_stream(raw, max_len)):
                    groups.append(grp)
                    nos.append(i + 1)
                    msgs.append(msg)
                    oks.append(ok)
            yield pa.RecordBatch.from_arrays(
                [pa.array(groups, type=b.column(0).type),
                 pa.array(nos, type=pa.int32()),
                 pa.array(msgs, type=pa.string()),
                 pa.array(oks, type=pa.bool_())],
                names=["group", "frame_no", "msg", "frame_ok"])

    grp_type = df.schema[group_col].dataType.simpleString()
    return (df.select(F.col(group_col), F.col(stream_col))
            .mapInArrow(gen, f"group {grp_type}, frame_no int, "
                             "msg string, frame_ok boolean"))
