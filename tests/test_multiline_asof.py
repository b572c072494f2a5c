"""Unit goldens for multiline joining (upstream:src/multiline/flb_ml.c
semantics) and the as-of join (SURVEY.md §2.4 taxonomy note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.operators.asof import asof_join
from fluent_bit_spark.operators.multiline import join_multiline


def test_multiline_docker_style(spark):
    """Java-stacktrace-style joining: 'Exception' opens a group,
    indented lines continue it; pre-start lines pass through."""
    rows = [
        ("a", 1, "plain line"),                  # pre-start → passthrough
        ("a", 2, "Exception: boom"),             # start
        ("a", 3, "  at foo()"),
        ("a", 4, "  at bar()"),
        ("a", 5, "Exception: again"),            # new start
        ("a", 6, "  at baz()"),
        ("b", 1, "Exception: other-stream"),     # groups never span streams
        ("b", 2, "  at qux()"),
    ]
    df = spark.createDataFrame(rows, "stream string, off int, line string")
    out = join_multiline(df, "stream", "off", "line",
                         F.col("line").startswith("Exception"))
    got = {(r.stream, r.first_off): (r.n_lines, r.event, r.joined)
           for r in out.collect()}
    assert got == {
        ("a", 1): (1, "plain line", False),
        ("a", 2): (3, "Exception: boom\n  at foo()\n  at bar()", True),
        ("a", 5): (2, "Exception: again\n  at baz()", True),
        ("b", 1): (2, "Exception: other-stream\n  at qux()", True),
    }


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("e1", "u1", 10), ("e2", "u1", 25), ("e3", "u2", 5),
         ("e4", "u3", 50)],
        "event_id string, user string, ts long")
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 20, 2.0), ("u1", 30, 3.0),
         ("u2", 5, 9.0)],                      # tie: right.ts == left.ts
        "user string, ts long, value double")
    out = asof_join(left, right, on="user", ts="ts", value_cols=["value"])
    got = {r.event_id: r.value_asof for r in out.collect()}
    assert got == {
        "e1": 1.0,   # latest right ≤ 10 is ts=8
        "e2": 2.0,   # ts=20 (not 30)
        "e3": 9.0,   # inclusive tie ts=5
        "e4": None,  # u3 has no right rows → null
    }
    # left row count preserved (it's an enrichment, not a filter)
    assert out.count() == 4
