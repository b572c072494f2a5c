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


# ---------------------------------------------------------------------------
# built-in multiline presets (upstream:src/multiline/flb_ml_parser_*.c)
# ---------------------------------------------------------------------------


def _preset_events(spark, preset, lines):
    from fluent_bit_spark.operators.multiline import multiline_preset
    df = spark.createDataFrame(
        [("s1", i, ln) for i, ln in enumerate(lines)],
        "stream string, off long, line string")
    rows = multiline_preset(df, preset, "stream", "off", "line") \
        .orderBy("first_off").collect()
    return rows


def test_multiline_docker_preset(spark):
    lines = [
        '{"log":"part one ","stream":"stdout","time":"t0"}',
        '{"log":"part two\\n","stream":"stdout","time":"t1"}',
        '{"log":"whole\\n","stream":"stdout","time":"t2"}',
        '{"log":"trailing partial ","stream":"stdout","time":"t3"}',
    ]
    rows = _preset_events(spark, "docker", lines)
    assert [(r.event, r.n_lines, r.complete) for r in rows] == [
        ("part one part two\n", 2, True),
        ("whole\n", 1, True),
        ("trailing partial ", 1, False),   # flush-at-end, unterminated
    ]


def test_multiline_cri_preset(spark):
    lines = [
        "2026-01-01T00:00:00Z stdout P chunk-a ",
        "2026-01-01T00:00:01Z stdout P chunk-b ",
        "2026-01-01T00:00:02Z stdout F chunk-c",
        "2026-01-01T00:00:03Z stderr F alone",
    ]
    rows = _preset_events(spark, "cri", lines)
    assert [(r.event, r.n_lines, r.complete) for r in rows] == [
        ("chunk-a chunk-b chunk-c", 3, True),
        ("alone", 1, True),
    ]


def test_multiline_java_preset(spark):
    lines = [
        "2026-01-01 ERROR boom java.lang.IllegalStateException: nope",
        "\tat com.example.App.run(App.java:12)",
        "\tat com.example.Main.main(Main.java:3)",
        "Caused by: java.io.IOException: disk",
        "\tat com.example.IO.read(IO.java:9)",
        "\t... 2 more",
        "2026-01-01 INFO next line",
    ]
    rows = _preset_events(spark, "java", lines)
    assert len(rows) == 2
    assert rows[0].n_lines == 6 and rows[0].joined
    assert rows[0].event == "\n".join(lines[:6])
    assert rows[1].event == lines[6] and not rows[1].joined


def test_multiline_python_preset(spark):
    lines = [
        "Traceback (most recent call last):",
        '  File "app.py", line 3, in <module>',
        "    run()",
        '  File "app.py", line 1, in run',
        "    raise ValueError('boom')",
        "ValueError: boom",
        "plain log line",
    ]
    rows = _preset_events(spark, "python", lines)
    assert len(rows) == 2
    assert rows[0].n_lines == 6
    assert rows[0].event == "\n".join(lines[:6])
    assert rows[1].event == "plain log line"


def test_multiline_go_preset(spark):
    lines = [
        "panic: runtime error: index out of range [3]",
        "",
        "goroutine 1 [running]:",
        "main.main()",
        "\t/app/main.go:5 +0x1d",
        "created by main.init",
        "exit status 2",
        "next ordinary line",
    ]
    rows = _preset_events(spark, "go", lines)
    assert len(rows) == 2
    assert rows[0].n_lines == 7
    assert rows[0].event == "\n".join(lines[:7])
    assert rows[1].event == "next ordinary line"
