"""HTTP JSON payload codec (sources/http.py — the in_http/out_http
payload subset; transports are SURVEY-scoped out)."""

import datetime

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.sources.http import (decode_http_json,
                                           encode_http_json)


@pytest.fixture(scope="module")
def decoded(spark):
    bodies = [
        ('{"log": "hello", "n": 1, "ok": true}',),
        ('[{"log": "a", "tag": "app.x"}, '
         '{"log": "b", "nested": {"k": 2}}]',),
        ("not json at all",),
        ("[1, 2]",),
    ]
    df = spark.createDataFrame(bodies, "body string")
    return decode_http_json(df, tag_key="tag").collect()


def test_decode_single_object_stringifies_scalars(decoded):
    [r] = [r for r in decoded if r.record and r.record.get("log") == "hello"]
    assert r.parse_ok and r.tag == "http.0"
    assert r.record["n"] == "1" and r.record["ok"] == "true"


def test_decode_array_batch_and_tag_key(decoded):
    [a] = [r for r in decoded if r.record and r.record.get("log") == "a"]
    [b] = [r for r in decoded if r.record and r.record.get("log") == "b"]
    assert a.tag == "app.x"          # lifted from the record
    assert b.tag == "http.0"         # fallback
    assert b.record["nested"] == '{"k":2}'   # nested renders as JSON


def test_decode_malformed_body_is_one_dlq_row(decoded):
    bad = [r for r in decoded if not r.parse_ok]
    # 1 malformed body + 2 non-object records
    assert len(bad) == 3
    assert all(r.tag == "http.0" for r in bad)


def test_encode_json_batches_deterministically(spark):
    rows = [(i, f"tag{i % 2}", f"m{i}",
             datetime.datetime(2026, 1, 1, 0, 0, i)) for i in range(7)]
    df = spark.createDataFrame(rows, "id long, tag string, msg string, "
                                     "ts timestamp")
    out = encode_http_json(df, ["id", "msg"], fmt="json",
                           batch_records=3, order_col="id",
                           tag_col="tag", ts_col="ts",
                           json_date_format="epoch")
    got = {(r.tag, r.batch_no): (r.n_records, r.body)
           for r in out.collect()}
    assert got[("tag0", 0)][0] == 3 and got[("tag0", 1)][0] == 1
    assert got[("tag1", 0)][0] == 3
    # date key injected, record order follows order_col
    assert got[("tag0", 1)][1] == \
        '[{"date":1767225606,"id":6,"msg":"m6"}]'


def test_encode_decode_roundtrip(spark):
    rows = [(i, f"m{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, msg string")
    for fmt in ("json", "json_lines"):
        enc = encode_http_json(df, ["id", "msg"], fmt=fmt,
                               batch_records=4, order_col="id")
        if fmt == "json_lines":
            # one record per line, the in_http capture-file shape
            bodies = enc.select(
                F.explode(F.split("body", "\n")).alias("body"))
        else:
            bodies = enc.select("body")
        dec = decode_http_json(bodies)
        assert dec.filter("parse_ok").count() == 10
        ids = sorted(int(r.record["id"]) for r in dec.collect())
        assert ids == list(range(10))


def test_encode_rejects_unknown_format(spark):
    df = spark.createDataFrame([(1, "x")], "id long, msg string")
    with pytest.raises(ValueError, match="json|format"):
        encode_http_json(df, ["msg"], fmt="msgpack").collect()


def test_http_pipeline_end_to_end(spark, fixture_paths, tmp_path):
    """[INPUT] http → pipeline → [OUTPUT] http: capture-file bodies
    decode to records that parse/route like the text path, malformed
    bodies hit the DLQ with the raw body preserved, and sink request
    bodies decode back to exactly the routed record count."""
    import json as _json

    from fluent_bit_spark import fixtures as fx
    from fluent_bit_spark.functions.parsers import fused_detok_parse
    from fluent_bit_spark.plans.config import (parse_classic,
                                               spec_from_tree)
    from fluent_bit_spark.plans.pipeline import run_pipeline

    tok = spark.read.parquet(fixture_paths["tokens"]).limit(300)
    lines = [r.decoded for r in
             fused_detok_parse(tok, spark, fx.vocab())
             .select("decoded").collect()]
    bodies = []
    for i in range(0, len(lines) - 1, 2):
        if i % 6 == 0:  # array batch, tag lifted from the record
            bodies.append(_json.dumps(
                [{"log": lines[i], "tag": "batch.a"},
                 {"log": lines[i + 1]}]))
        else:           # two single-record bodies
            bodies.append(_json.dumps({"log": lines[i]}))
            bodies.append(_json.dumps({"log": lines[i + 1]}))
    n_records = len(lines) - (len(lines) % 2)
    bodies += ["{broken", "[1, 2]"]   # 1 body DLQ + 2 record DLQs
    cap = tmp_path / "cap"
    cap.mkdir()
    (cap / "listener.log").write_text("\n".join(bodies) + "\n")

    conf = tmp_path / "h.conf"
    conf.write_text(
        "[INPUT]\n    Name http\n    Tag http.0\n    Tag_Key tag\n"
        "[OUTPUT]\n    Name http\n    Match http.*\n    Sink web\n"
        "    Format json\n    Batch_records 40\n"
        "[OUTPUT]\n    Name http\n    Match batch.*\n    Sink batch\n"
        "    Format json\n    Batch_records 40\n")
    spec, io = spec_from_tree(parse_classic(conf.read_text()))
    assert io["input_format"] == "http"
    assert spec.http_input == {"tag": "http.0", "tag_key": "tag"}
    assert spec.sink_format == "http"
    assert spec.http_output["batch_records"] == 40

    out = str(tmp_path / "out")
    stats = run_pipeline(spark, spec, str(cap), out,
                         input_format="http")
    # every record row lands somewhere: 3 malformed-record DLQs plus
    # any parse_fail lines; the rest route by the http-supplied tag
    assert stats["rows_in"] == n_records + 3

    from fluent_bit_spark.plans.pipeline import read_dlq
    dlq = read_dlq(spark, out)
    bad = dlq.filter(F.col("dlq_reason") == "parse_fail")
    # the raw body survives on the decode-failure DLQ rows
    kept = [r.decoded for r in bad.collect()]
    assert "{broken" in kept
    assert kept.count("[1, 2]") == 2  # one DLQ row per bad record

    # read the sink request bodies back through the DECODER: record
    # conservation through encode→decode
    n_sunk = 0
    for sink in ("web", "batch"):
        raw = (spark.read.text(f"{out}/sinks/{sink}")
               .withColumnRenamed("value", "body"))
        dec = decode_http_json(raw)
        assert dec.filter(~F.col("parse_ok")).count() == 0
        n_sunk += dec.count()
    n_dlq = dlq.count()
    assert n_sunk == stats["rows_in"] - n_dlq
    assert n_sunk > 0
