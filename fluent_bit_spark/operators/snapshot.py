"""Stream-processor snapshots: ring-buffered context replay on a
trigger (upstream:src/stream_processor/flb_sp_snapshot.c —
``CREATE SNAPSHOT s WITH(size=N)`` buffers the most recent records of
a stream per tag; ``FLUSH SNAPSHOT s WHEN <condition>`` re-emits the
buffered records when a matching record arrives; the canonical use is
"on an error record, dump the context that preceded it").

Two forms, same semantics:

- ``snapshot_context`` (here): the BATCH/verification form — for every
  trigger row, the ``limit_rows`` records of the same key immediately
  preceding it, via a bounded sliding window. SQL-expressible, so it is
  oracle-checked end to end (the ``snapshot_flush`` driver query).
- ``snapshot_stateful`` (streaming/stream_pipeline.py): the production
  streaming form — per-key GroupState ring buffer capped at
  ``limit_rows``, flushed when a trigger record arrives. Parity-tested
  against the batch form.

Scale notes: the batch window is ``rowsBetween(-N, -1)`` — Spark keeps
only N rows of frame state per task, so memory is O(N) regardless of
key cardinality or rows-per-key; the one wide op is the per-key sort
(the semantics are inherently per-stream ordered). The streaming form
carries O(N) state per key and is the 10^12-row posture: the buffer
never grows with stream age.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_context(df: DataFrame, key_col: str, order_col: str,
                     trigger: Column, limit_rows: int,
                     payload_cols: list[str]) -> DataFrame:
    """For every row where ``trigger`` holds, re-emit the
    ``limit_rows`` rows of the same ``key_col`` stream that immediately
    precede it (in ``order_col`` order), exploded one output row per
    buffered record with its position.

    Output: (key, flush_at = trigger row's order value, ctx_pos =
    0-based age rank oldest-first, <payload_cols> of the buffered row).
    A trigger with an empty buffer (first rows of a stream) emits
    nothing — same as the reference's empty-snapshot flush.
    """
    if "__o" in payload_cols:
        raise ValueError("payload column name '__o' is reserved for "
                         "the snapshot buffer's order field")
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(-limit_rows, -1))
    # the order value gets a RESERVED alias — a payload column literally
    # named 'o' must not collide with it inside the buffer struct
    buf = F.collect_list(
        F.struct(F.col(order_col).alias("__o"),
                 *[F.col(c).alias(c) for c in payload_cols])).over(w)
    trig = (df.withColumn("__buf", buf)
            .filter(trigger)
            .select(key_col, F.col(order_col).alias("flush_at"),
                    F.posexplode("__buf").alias("ctx_pos", "ctx")))
    return trig.select(
        key_col, "flush_at", "ctx_pos",
        *[F.col(f"ctx.{c}").alias(f"ctx_{c}") for c in payload_cols])
