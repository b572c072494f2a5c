"""HTTP JSON payload source/sink (batch subset of in_http / out_http).

Reference semantics (upstream:plugins/in_http/http.c,
plugins/out_http/http.c — the TCP listener / client transports are
SURVEY-scoped out as connectors, same posture as forward/OTLP):

- **in_http**: clients POST JSON bodies; each body is either ONE map
  (one record) or an ARRAY of maps (a batch). The record map is
  schemaless. ``tag_key`` lifts the routing tag from a record field;
  otherwise every record gets the listener's configured tag.
- **out_http**: flushed chunks are rendered to request bodies in one
  of three formats (upstream:src/flb_pack.c
  ``flb_pack_msgpack_to_json_format``): ``json`` (one JSON array),
  ``json_lines`` (NDJSON), ``json_stream`` (concatenated objects);
  ``json_date_key`` injects the record timestamp under a configurable
  key (``double`` epoch / ``iso8601`` / ``epoch`` integer).

The batch-meaningful subset implemented here is the *payload codec*
over capture files: one request body per line (the shape an HTTP
capture/replay proxy or collector file sink writes), decoded to the
pipeline's (tag, ts, record map) rows; and the sink side packs rows
back into deterministic request bodies. Transport (listener sockets,
retries, TLS) is a connector concern and stays out, but the bytes are
real: decode(encode(x)) == x is pinned by tests.

Spark shape: pure Catalyst. Bodies parse with ``parse_json`` into
VARIANT (Spark 4's schemaless JSON type — no sampling inference pass,
which at 100 TB would be a second full scan), arrays normalize via
``cast(array<variant>)``, one generator explode per body, and the
record map is a variant→map<string,string> cast rendering scalar
values as their JSON text. No UDF, no shuffle — a map-only scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _body_records(body: Column) -> Column:
    """Request body (JSON text: object or array of objects) →
    ``array<variant>`` of records. Malformed JSON → null (the caller
    routes those to the DLQ — tolerate-and-null, parser-family
    posture)."""
    v = F.try_parse_json(body)
    # schema_of_variant is O(1) on the variant header; an ARRAY body
    # casts element-wise, an OBJECT body wraps as a 1-element batch
    is_arr = F.schema_of_variant(v).startswith("ARRAY")
    return (F.when(v.isNull(), F.lit(None))
             .when(is_arr, v.try_cast("array<variant>"))
             .otherwise(F.array(v)))


def decode_http_json(df: DataFrame, body_col: str = "body",
                     tag: str = "http.0", tag_key: str | None = None,
                     keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Body lines → one row per record: ``(tag, record
    map<string,string>, parse_ok)`` plus ``keep_cols`` passed through.

    Scalar record values render as JSON text (``1`` → ``"1"``,
    ``true`` → ``"true"``); nested values render as compact JSON —
    fluent-bit's record accessor applies the same lossy-but-total
    stringification to mixed-type metadata. ``tag_key`` (upstream
    in_http property) lifts the tag from the named record field when
    present, falling back to ``tag``."""
    recs = _body_records(F.col(body_col))
    out = (df.select(*keep_cols, recs.alias("__recs"))
             .withColumn("__body_ok", F.col("__recs").isNotNull())
             .withColumn("__r", F.explode(
                 F.coalesce(F.col("__recs"),
                            F.expr("array(parse_json('{}'))"))))
             .drop("__recs"))
    record = F.col("__r").try_cast("map<string,string>")
    tag_col = F.lit(tag)
    if tag_key:
        tag_col = F.coalesce(
            F.try_variant_get(F.col("__r"), f"$.{tag_key}", "string"),
            tag_col)
    # parse_ok covers BOTH failure modes: a malformed body (the whole
    # line DLQs as one empty-record row) and a non-object record
    # inside a well-formed array (upstream in_http answers 400 for
    # those; here the record DLQs individually)
    return (out.withColumn("record",
                           F.when(F.col("__body_ok"), record)
                            .otherwise(F.expr(
                                "CAST(map() AS map<string,string>)")))
               .withColumn("parse_ok",
                           F.col("__body_ok") & record.isNotNull())
               .withColumn("tag", tag_col)
               .drop("__r", "__body_ok"))


def read_http_json(spark: SparkSession, path: str, *,
                   tag: str = "http.0",
                   tag_key: str | None = None) -> DataFrame:
    """Read body-per-line capture files (``text`` source — one HTTP
    POST body per line) into decoded records. Blank lines are
    keep-alive noise and drop out before the parse."""
    raw = spark.read.text(path).withColumnRenamed("value", "body")
    return decode_http_json(raw.filter(F.length(F.trim("body")) > 0),
                            tag=tag, tag_key=tag_key)


def _date_col(ts_col: str, fmt: str) -> Column:
    ts = F.col(ts_col)
    if fmt == "double":
        return ts.cast("timestamp").cast("double")
    if fmt == "epoch":
        return ts.cast("timestamp").cast("long")
    if fmt == "iso8601":
        return F.date_format(
            ts.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    raise ValueError(
        f"json_date_format must be double|epoch|iso8601, got {fmt!r}")


def encode_http_json(df: DataFrame, cols: list[str] | None = None, *,
                     fmt: str = "json", batch_records: int = 100,
                     order_col: str | None = None,
                     tag_col: str | None = None,
                     ts_col: str | None = None,
                     json_date_key: str = "date",
                     json_date_format: str = "double",
                     out: str = "body") -> DataFrame:
    """Rows → request bodies: one output row per POST the sink would
    issue, ``(tag?, batch_no, n_records, body)``.

    ``fmt`` follows flb_pack_msgpack_to_json_format: ``json`` renders
    a body as one JSON array, ``json_lines`` newline-separates the
    records, ``json_stream`` concatenates them. ``json_date_key``
    injects the event time under that key (set it to None/"" to omit,
    upstream's ``json_date_key false``).

    Batching is DETERMINISTIC — records group per tag in ``order_col``
    order, ``batch_records`` per body (upstream batches by flushed
    chunk, which is scheduler-dependent; a reproducible rule is
    strictly better for a replayable batch engine). Scale shape: one
    hash exchange keyed by (tag, batch_no) — the map-side
    ``row_number`` window per tag is the only wide step, and bodies
    are bounded at ``batch_records`` records so no reduce task ever
    materializes an unbounded body string.
    """
    from pyspark.sql import Window

    cols = cols or [c for c in df.columns
                    if c not in {tag_col, order_col}]
    if ts_col is not None and json_date_key:
        fields = [_date_col(ts_col, json_date_format)
                  .alias(json_date_key)]
        fields += [F.col(c).alias(c) for c in cols if c != ts_col]
    else:
        fields = [F.col(c).alias(c) for c in cols]
    rec = F.to_json(F.struct(*fields))

    key = F.col(tag_col) if tag_col else F.lit("")
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(key).orderBy(order)
    numbered = (df.withColumn("__rec", rec)
                  .withColumn("__rn", F.row_number().over(w))
                  .withColumn("__batch",
                              ((F.col("__rn") - 1) / batch_records)
                              .cast("long")))
    sep = {"json": ",", "json_lines": "\n", "json_stream": ""}.get(fmt)
    if sep is None:
        raise ValueError(
            f"format must be json|json_lines|json_stream, got {fmt!r}")
    grouped = (numbered.groupBy(
        *( [F.col(tag_col).alias("tag")] if tag_col else [] ),
        F.col("__batch").alias("batch_no"))
        .agg(F.count("*").alias("n_records"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__rn").alias("o"),
                                  F.col("__rec").alias("r")))),
                     lambda s: s["r"]),
                 sep).alias("__joined")))
    body = (F.concat(F.lit("["), F.col("__joined"), F.lit("]"))
            if fmt == "json" else F.col("__joined"))
    return grouped.withColumn(out, body).drop("__joined")
