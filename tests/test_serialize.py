"""Serializer goldens (upstream:src/flb_pack.c json_lines,
src/flb_pack_gelf.c GELF mapping — pack fixture posture of
upstream:tests/internal/pack.c)."""

from __future__ import annotations

import json

from fluent_bit_spark.functions.serialize import to_gelf, to_json_lines


def test_json_lines_roundtrip(spark):
    df = spark.createDataFrame(
        [("d1", 3, "hello"), ("d2", None, 'quote"inside')],
        "doc string, n int, msg string")
    rows = to_json_lines(df).select("value").collect()
    got = [json.loads(r.value) for r in rows]
    # to_json drops null fields — fluent-bit's encoder keeps nil; our
    # schema-on-write contract documents null-dropping (map parity holds
    # for present keys)
    assert got == [{"doc": "d1", "n": 3, "msg": "hello"},
                   {"doc": "d2", "msg": 'quote"inside'}]


def test_gelf_mapping(spark):
    df = spark.createDataFrame(
        [("web1", "boom", "2026-01-01 00:00:42", "error", "pay"),
         ("web2", "fine", "2026-01-01 00:01:00", "info", "ads"),
         ("web3", "odd", "2026-01-01 00:02:00", "weird", "x")],
        "host string, msg string, ts string, level string, team string")
    out = to_gelf(df, "host", "msg", "ts", level_col="level",
                  extra_cols=["team"])
    got = {json.loads(r.value)["host"]: json.loads(r.value)
           for r in out.collect()}
    assert got["web1"]["version"] == "1.1"
    assert got["web1"]["short_message"] == "boom"
    assert got["web1"]["level"] == 3
    assert got["web2"]["level"] == 6
    assert got["web3"]["level"] == 1          # unknown string → default
    assert got["web1"]["_team"] == "pay"
    assert got["web1"]["timestamp"] == 1767225642.0


def test_gelf_level_fallbacks(spark):
    """Pin the documented fallback policy: numeric strings pass through
    as integers; unknown strings and NULL fall back to the GELF 1.1
    spec default of 1."""
    df = spark.createDataFrame(
        [("h1", "m", "2026-01-01 00:00:00", "5"),     # numeric string
         ("h2", "m", "2026-01-01 00:00:00", "0"),     # numeric 0 (emerg)
         ("h3", "m", "2026-01-01 00:00:00", "WARNING"),  # case-insensitive
         ("h4", "m", "2026-01-01 00:00:00", "nonsense"),
         ("h5", "m", "2026-01-01 00:00:00", None)],
        "host string, msg string, ts string, level string")
    out = to_gelf(df, "host", "msg", "ts", level_col="level")
    got = {json.loads(r.value)["host"]: json.loads(r.value)["level"]
           for r in out.collect()}
    assert got == {"h1": 5, "h2": 0, "h3": 4, "h4": 1, "h5": 1}


def test_prometheus_label_escaping_newline(spark):
    """Exposition-format label_value escaping: \\ , " and literal
    newlines must all be escaped or a log-derived label splits the
    scrape line (ADVICE r2)."""
    from fluent_bit_spark.functions.serialize import to_prometheus
    df = spark.createDataFrame(
        [("a\nb", 1.0), ('q"uo\\te', 2.0), ("crlf\r\nx", 3.0)],
        "svc string, v double")
    got = {r.svc: r.value for r in
           to_prometheus(df, "m", "v", ["svc"]).collect()}
    assert got["a\nb"] == 'm{svc="a\\nb"} 1.0'
    assert got['q"uo\\te'] == 'm{svc="q\\"uo\\\\te"} 2.0'
    assert got["crlf\r\nx"] == 'm{svc="crlf\\nx"} 3.0'
    for line in got.values():
        assert "\n" not in line and "\r" not in line
