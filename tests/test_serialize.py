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


def test_es_bulk_bodies(spark):
    """to_es_bulk: action+source NDJSON pairs, deterministic batching,
    trailing newline; Logstash_Format daily index + @timestamp
    injection; update/upsert doc wrapping; bad write_op raises."""
    import json

    from fluent_bit_spark.functions.serialize import to_es_bulk

    df = spark.createDataFrame(
        [(1, "a", "2024-03-01 10:00:00"),
         (2, "b", "2024-03-01 11:00:00"),
         (3, "c", "2024-03-02 09:00:00")],
        "id bigint, msg string, ts string")

    rows = to_es_bulk(df, ["id", "msg"], index="logs", id_col="id",
                      batch_records=2, order_col="id").collect()
    bodies = {r.batch_no: r for r in rows}
    assert {r["index"] for r in rows} == {"logs"}
    assert bodies[0].n_records == 2 and bodies[1].n_records == 1
    lines = bodies[0].body.split("\n")
    assert bodies[0].body.endswith("\n") and lines[-1] == ""
    assert json.loads(lines[0]) == {"create": {"_index": "logs",
                                               "_id": "1"}}
    assert json.loads(lines[1]) == {"id": 1, "msg": "a"}
    assert json.loads(lines[2])["create"]["_id"] == "2"

    # logstash daily indexes: one body per day, @timestamp injected
    ls = to_es_bulk(df, ["id", "msg", "ts"], logstash_format=True,
                    ts_col="ts", order_col="id").collect()
    assert {r["index"] for r in ls} == {"logstash-2024.03.01",
                                     "logstash-2024.03.02"}
    doc = json.loads([r for r in ls if r["index"].endswith("01")]
                     [0].body.split("\n")[1])
    assert set(doc) == {"@timestamp", "id", "msg"}
    assert doc["@timestamp"].startswith("2024-03-01T10:00:00.000")

    # update/upsert wrap the doc; create/index do not
    up = to_es_bulk(df.limit(1), ["id"], write_op="upsert",
                    order_col="id").collect()[0]
    a, d = up.body.split("\n")[:2]
    assert json.loads(a)["update"]["_index"] == "fluent-bit"
    assert json.loads(d) == {"doc": {"id": 1}, "doc_as_upsert": True}

    import pytest as _pt
    with _pt.raises(ValueError, match="write_op"):
        to_es_bulk(df, ["id"], write_op="delete")
    with _pt.raises(ValueError, match="needs ts_col"):
        to_es_bulk(df, ["id"], logstash_format=True)


def test_loki_push_streams(spark):
    """to_loki_push: per-label-set stream objects, ns timestamps,
    (ts, order) value ordering, Jackson escaping of the line, and
    loki_request_body assembly."""
    import json

    from fluent_bit_spark.functions.serialize import (
        loki_request_body, to_loki_push)

    df = spark.createDataFrame(
        [("app", "2024-03-01 10:00:01", 2, 'say "hi"\nok'),
         ("app", "2024-03-01 10:00:01", 1, "first"),
         ("db", "2024-03-01 10:00:02", 3, "later")],
        "job string, ts string, seq int, line string")
    rows = to_loki_push(df, ["job"], "line", "ts",
                        order_col="seq").collect()
    got = {r.job: r for r in rows}
    assert got["app"].n_values == 2 and got["db"].n_values == 1
    obj = json.loads(got["app"].stream_body)
    assert obj["stream"] == {"job": "app"}
    # same ts → seq breaks the tie; escaping survives json parse
    assert [v[1] for v in obj["values"]] == ["first", 'say "hi"\nok']
    assert obj["values"][0][0] == str(1709287201 * 1000000000)

    body = json.loads(loki_request_body(
        to_loki_push(df, ["job"], "line", "ts", order_col="seq")))
    assert {s["stream"]["job"] for s in body["streams"]} == {"app", "db"}
