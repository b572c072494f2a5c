"""Multiline joining in batch (SURVEY.md §2.2 "multiline core").

Reference semantics (upstream:src/multiline/flb_ml.c, flb_ml_parser.c,
flb_ml_rule.c; built-in parsers flb_ml_parser_docker/cri/java/python):
a state machine joins physical lines into one logical event — a line
matching the ``start_state`` rule opens a group, continuation-rule lines
append, and a line arriving before any start passes through unjoined.

Batch re-expression (the "hard in batch" case called out in SURVEY §7a —
it needs ordering): a running count of start-markers per stream is the
group id (``sum(is_start) over (partition by stream order by offset)``),
then one hash aggregation rebuilds each logical event with its lines in
offset order (``sort_array`` of (offset, line) structs — collect_list
alone does NOT guarantee order). Pre-start lines keep their own
singleton group via a row-unique group key.

Scale shape: one shuffle on the stream key for the window + one for the
groupBy (AQE coalesces; same key → Catalyst reuses the partitioning).
Groups never span streams, so skew follows stream size — cap logical
events with ``max_lines`` if a stream can be a single runaway group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_multiline(df: DataFrame, stream_col: str, order_col: str,
                   line_col: str, start_pred: Column,
                   sep: str = "\n",
                   out_col: str = "event") -> DataFrame:
    """Join physical lines into logical events.

    Returns one row per logical event with columns: ``stream_col``,
    ``first_<order_col>`` (the opening line's offset), ``n_lines``,
    ``out_col`` (the sep-joined text), ``joined`` (false for pre-start
    passthrough rows — flb_ml emits those unmodified)."""
    w = (Window.partitionBy(stream_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gid = F.sum(start_pred.cast("int")).over(w)
    # pre-start rows (gid=0) pass through as singleton groups
    gkey = F.when(gid > 0, F.concat(F.lit("g"), gid.cast("string"))) \
            .otherwise(F.concat(F.lit("r"), F.col(order_col).cast("string")))
    lines = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l"))))
    return (df.withColumn("_gid", gid).withColumn("_gkey", gkey)
            .groupBy(stream_col, "_gkey")
            .agg(F.min(order_col).alias(f"first_{order_col}"),
                 F.count("*").alias("n_lines"),
                 F.min("_gid").alias("_g"),
                 lines.alias("_lines"))
            .withColumn(out_col, F.array_join(
                F.transform("_lines", lambda s: s["l"]), sep))
            .withColumn("joined", F.col("_g") > 0)
            .drop("_lines", "_gkey", "_g"))
