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


# ---------------------------------------------------------------------------
# terminated-mode engine (docker / cri): a line's group ends at the next
# line whose completion predicate holds
# ---------------------------------------------------------------------------


def join_multiline_terminated(df: DataFrame, stream_col: str,
                              order_col: str, payload_col: str | Column,
                              complete_pred: Column, sep: str = "",
                              out_col: str = "event") -> DataFrame:
    """Join runtime-split line fragments: every line belongs to the group
    that ENDS at the next line marked complete (docker: ``log`` ends
    with a newline; CRI: the ``F`` tag). This is the inverse of the
    start-rule engine — the terminator, not the opener, is known.

    ``gid = sum(complete) over preceding rows``: fragments share the gid
    of their terminator. Fragments are runtime-split chunks of ONE
    logical line, so the default join separator is '' (the terminator's
    payload carries any trailing newline itself). A trailing unterminated
    run (stream cut mid-line) is emitted as-is with ``complete=false`` —
    the batch analogue of flb_ml's flush-timeout emit.

    Scale shape: identical to join_multiline — one window + one groupBy
    on the same stream key (Catalyst shares the partitioning)."""
    payload = F.col(payload_col) if isinstance(payload_col, str) \
        else payload_col
    w = (Window.partitionBy(stream_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    gid = F.coalesce(F.sum(complete_pred.cast("int")).over(w), F.lit(0))
    frags = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("o"), payload.alias("l"))))
    return (df.withColumn("_gid", gid)
            .withColumn("_complete", complete_pred)
            .groupBy(stream_col, "_gid")
            .agg(F.min(order_col).alias(f"first_{order_col}"),
                 F.count("*").alias("n_lines"),
                 F.max("_complete").alias("complete"),
                 frags.alias("_frags"))
            .withColumn(out_col, F.array_join(
                F.transform("_frags", lambda s: s["l"]), sep))
            .drop("_frags", "_gid"))


# ---------------------------------------------------------------------------
# continuation-run engine (java / python / go stack traces): any
# non-continuation line heads a group; following continuation lines attach
# ---------------------------------------------------------------------------


def join_multiline_runs(df: DataFrame, stream_col: str, order_col: str,
                        line_col: str, cont_pred: Column,
                        sep: str = "\n",
                        out_col: str = "event") -> DataFrame:
    """Group each run of continuation lines under the non-continuation
    line that precedes it. Divergence from flb_ml's state machine,
    documented: upstream attaches continuations only inside a group its
    start_state rule opened, so an ORPHANED continuation line (indented
    line after no opener) passes through alone; here it attaches to
    whatever line precedes it. For the built-in presets this differs
    only on malformed input — a stack-trace head is by construction a
    non-continuation line. Leading continuation lines (no head yet)
    pass through as singletons, as upstream does."""
    w = (Window.partitionBy(stream_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gid = F.sum((~cont_pred).cast("int").alias("h")).over(w)
    gkey = F.when(gid > 0, F.concat(F.lit("g"), gid.cast("string"))) \
            .otherwise(F.concat(F.lit("r"), F.col(order_col).cast("string")))
    lines = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l"))))
    return (df.withColumn("_gkey", gkey)
            .groupBy(stream_col, "_gkey")
            .agg(F.min(order_col).alias(f"first_{order_col}"),
                 F.count("*").alias("n_lines"),
                 lines.alias("_lines"))
            .withColumn(out_col, F.array_join(
                F.transform("_lines", lambda s: s["l"]), sep))
            .withColumn("joined", F.col("n_lines") > 1)
            .drop("_lines", "_gkey"))


# ---------------------------------------------------------------------------
# built-in presets (upstream:src/multiline/flb_ml_parser_docker.c,
# flb_ml_parser_cri.c, flb_ml_parser_java.c, flb_ml_parser_python.c,
# flb_ml_parser_go.c — rule sets re-expressed as column predicates)
# ---------------------------------------------------------------------------


# continuation regexes for the stack-trace presets; a line matching NONE
# of its preset's patterns heads a new group
MULTILINE_CONT_RULES: dict[str, str] = {
    # "at …", "Caused by:", "… N more", "Suppressed:", any indented line
    "java": r"^(\s+at\s|\s+\.\.\. \d+ more|Caused by: |\s+Suppressed: |\s+)",
    # indented File/code lines and the closing "SomeError: msg" line
    "python": (r"^(\s+|[A-Za-z_][A-Za-z0-9_.]*"
               r"(Error|Exception)\b)"),
    # goroutine headers, frame lines ("main.main()" + indented file:line),
    # signal/created-by/exit trailers, and the blank line after panic:
    "go": (r"^(\s|goroutine \d+ \[|\[signal |created by |exit status \d+"
           r"|\S+\(.*\)$|$)"),
}

# CRI log line: "<time> <stream> <P|F> <log>" (P = partial, F = full)
CRI_LINE_RE = r"^(\S+) (stdout|stderr) ([PF]) (.*)$"


def multiline_docker(df: DataFrame, stream_col: str, order_col: str,
                     line_col: str) -> DataFrame:
    """Docker json-log preset: each physical line is a JSON record whose
    ``log`` payload is a fragment; a fragment ending in a newline
    terminates the logical line (upstream:flb_ml_parser_docker.c)."""
    payload = F.get_json_object(F.col(line_col), "$.log")
    return join_multiline_terminated(
        df, stream_col, order_col, payload,
        complete_pred=payload.endswith("\n"), sep="")


def multiline_cri(df: DataFrame, stream_col: str, order_col: str,
                  line_col: str) -> DataFrame:
    """CRI-O / containerd preset: ``time stream P|F log``; P fragments
    concatenate (no separator) until the F line
    (upstream:flb_ml_parser_cri.c)."""
    payload = F.regexp_extract(F.col(line_col), CRI_LINE_RE, 4)
    tag = F.regexp_extract(F.col(line_col), CRI_LINE_RE, 3)
    return join_multiline_terminated(
        df, stream_col, order_col, payload,
        complete_pred=tag == "F", sep="")


def multiline_preset(df: DataFrame, preset: str, stream_col: str,
                     order_col: str, line_col: str) -> DataFrame:
    """Dispatch one of the five built-in multiline presets."""
    if preset == "docker":
        return multiline_docker(df, stream_col, order_col, line_col)
    if preset == "cri":
        return multiline_cri(df, stream_col, order_col, line_col)
    if preset in MULTILINE_CONT_RULES:
        return join_multiline_runs(
            df, stream_col, order_col, line_col,
            cont_pred=F.col(line_col).rlike(MULTILINE_CONT_RULES[preset]))
    raise ValueError(f"unknown multiline preset: {preset!r}")
