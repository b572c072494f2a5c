"""Output format serializers (SURVEY.md §2.1 sinks table).

Reference semantics (upstream:src/flb_pack.c
``flb_pack_msgpack_to_json_format``: json / json_lines / json_stream;
upstream:src/flb_pack_gelf.c): each flushed record is rendered to a
one-line JSON document; GELF is a fixed field mapping (version, host,
short_message, timestamp, level, custom ``_``-prefixed fields).

Spark re-expression: ``F.to_json(F.struct(...))`` — JVM-side, codegen,
no UDF. The "format" is just a column projection; sinks write the
rendered ``value`` column with ``text`` or keep it as a column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# syslog-ish severity → GELF numeric level (RFC 5424 subset used by
# upstream flb_pack_gelf)
_GELF_LEVELS = {"emerg": 0, "alert": 1, "crit": 2, "error": 3, "err": 3,
                "warn": 4, "warning": 4, "notice": 5, "info": 6,
                "debug": 7}


def to_json_lines(df: DataFrame, cols: list[str] | None = None,
                  out: str = "value") -> DataFrame:
    """json_lines format: one JSON object per record."""
    cols = cols or df.columns
    return df.withColumn(
        out, F.to_json(F.struct(*[F.col(c) for c in cols])))


def gelf_level(level_col: Column | str) -> Column:
    """Severity → GELF numeric level.

    Fallback policy (pinned by unit tests): syslog-style names map via
    ``_GELF_LEVELS``; a numeric string passes through as its integer
    value (upstream keeps numeric levels as-is); anything else — an
    unknown string, or NULL — falls back to **1**, the GELF 1.1 spec
    default for an omitted ``level`` field."""
    c = F.col(level_col) if isinstance(level_col, str) else level_col
    m = None
    for k, v in _GELF_LEVELS.items():
        cond = F.lower(c) == k
        m = F.when(cond, v) if m is None else m.when(cond, v)
    return m.otherwise(
        F.coalesce(c.try_cast("int"), F.lit(1).cast("int")))


def _stringify(df: DataFrame, c: str) -> Column:
    """Column → string for line serializers: atomic types cast;
    struct/array/map render as JSON (deterministic and parseable,
    rather than Spark's display-oriented cast rendering)."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    if isinstance(df.schema[c].dataType, (ArrayType, MapType, StructType)):
        return F.to_json(F.col(c))
    return F.col(c).cast("string")


def to_csv_line(df: DataFrame, cols: list[str],
                out: str = "value") -> DataFrame:
    """out_file ``Format csv`` (upstream:plugins/out_file/file.c): comma
    separation, RFC-4180-style quoting of fields containing a comma,
    quote, or newline — JVM-side, no UDF. Complex-typed columns render
    as JSON before quoting."""
    def render(c: str) -> Column:
        v = _stringify(df, c)
        needs = v.rlike('[",\n\r]')
        quoted = F.concat(F.lit('"'),
                          F.regexp_replace(v, '"', '""'), F.lit('"'))
        return F.when(v.isNull(), F.lit("")) \
                .when(needs, quoted).otherwise(v)
    return df.withColumn(out, F.concat_ws(",", *[render(c) for c in cols]))


def to_ltsv_line(df: DataFrame, cols: list[str],
                 out: str = "value") -> DataFrame:
    """out_file ``Format ltsv``: tab-separated ``key:value`` pairs.
    Complex-typed columns render as JSON values."""
    parts = [F.concat(F.lit(f"{c}:"),
                      F.coalesce(_stringify(df, c), F.lit("")))
             for c in cols]
    return df.withColumn(out, F.concat_ws("\t", *parts))


def to_prometheus(df: DataFrame, metric: str, value_col: str,
                  label_cols: list[str],
                  out: str = "value") -> DataFrame:
    """Prometheus text-exposition rendering of a metrics table — the
    cmetrics/prometheus-exporter analogue (upstream:lib/cmetrics
    prometheus encoder; plugins/out_prometheus_exporter): one
    ``metric{k="v",…} value`` line per row. Label values escape
    backslash, double-quote, and newline per the exposition format — a
    log-derived label with a literal newline would otherwise split the
    metric line and corrupt the scrape. JVM-side."""
    def esc(c: str) -> Column:
        v = F.col(c).cast("string")
        # Java replacement strings re-process backslashes: `\\` emits
        # one literal `\`, so producing backslash+X needs `\\X` here.
        v = F.regexp_replace(v, r"\\", r"\\\\")
        v = F.regexp_replace(v, '"', r'\\"')
        return F.regexp_replace(v, r"\r?\n|\r", r"\\n")
    labels = F.concat_ws(",", *[
        F.concat(F.lit(f'{c}="'), esc(c), F.lit('"')) for c in label_cols])
    return df.withColumn(
        out, F.concat(F.lit(metric + "{"), labels, F.lit("} "),
                      F.col(value_col).cast("string")))


def to_gelf(df: DataFrame, host_col: str, message_col: str,
            ts_col: str, level_col: str | None = None,
            extra_cols: list[str] | None = None,
            out: str = "value", millis: bool = False) -> DataFrame:
    """GELF 1.1 rendering: fixed keys + ``_``-prefixed extras.

    ``timestamp`` is epoch SECONDS as an integer by default (valid
    GELF — the spec allows whole seconds with optional decimals), which
    keeps the bytes engine-portable: float JSON rendering differs
    between Jackson and other engines (1.7672E9 vs 1767200000.0), an
    integer renders identically everywhere. ``millis=True`` opts into
    sub-second precision as a double (Jackson formatting)."""
    # try_to_timestamp: byte-identical to the strict cast on valid
    # input, null (field omitted) on junk instead of an ANSI abort —
    # the same tolerate-and-null posture as the parser family
    ts_parsed = F.try_to_timestamp(F.col(ts_col))
    ts = (ts_parsed.cast("double") if millis
          else ts_parsed.cast("long"))
    fields = [
        F.lit("1.1").alias("version"),
        F.col(host_col).alias("host"),
        F.col(message_col).alias("short_message"),
        ts.alias("timestamp"),
    ]
    if level_col is not None:
        fields.append(gelf_level(level_col).alias("level"))
    for c in (extra_cols or []):
        fields.append(F.col(c).alias(f"_{c.replace('.', '_')}"))
    return df.withColumn(out, F.to_json(F.struct(*fields)))


def to_key_value_line(df: DataFrame, cols: list[str],
                      out: str = "value") -> DataFrame:
    """``key="value"`` pairs, space-separated — out_loki's
    ``line_format key_value`` rendering (upstream:plugins/out_loki
    loki.c). Values always quote, escaping backslash and double-quote;
    nulls render as ``""`` (a dropped pair would shift the line shape
    per record). Complex-typed columns render as JSON first."""
    def render(c: str) -> Column:
        v = F.coalesce(_stringify(df, c), F.lit(""))
        v = F.regexp_replace(v, r"\\", r"\\\\")
        v = F.regexp_replace(v, '"', r'\\"')
        return F.concat(F.lit(f'{c}="'), v, F.lit('"'))
    return df.withColumn(out, F.concat_ws(" ", *[render(c)
                                                 for c in cols]))


def to_es_bulk(df: DataFrame, doc_cols: list[str], *,
               index: str = "fluent-bit",
               logstash_format: bool = False,
               logstash_prefix: str = "logstash",
               logstash_dateformat: str = "yyyy.MM.dd",
               ts_col: str | None = None,
               time_key: str = "@timestamp",
               id_col: str | None = None,
               write_op: str = "create",
               batch_records: int = 500,
               order_col: str | None = None,
               out: str = "body") -> DataFrame:
    """Elasticsearch ``_bulk`` request bodies — the payload subset of
    upstream:plugins/out_es (es.c config surface; es_bulk.c NDJSON
    builder). Transport (HTTP client, auth, retries-on-429) is a
    connector concern and stays out, same posture as forward/OTLP/http;
    the bytes are real:

    - each record renders as an action line + source line pair::

        {"create":{"_index":"idx"}}
        {"@timestamp":"...","k":"v",...}

    - ``write_op`` follows es.c ``Write_Operation``: ``create`` /
      ``index`` emit the document as-is; ``update`` wraps it as
      ``{"doc":{...}}``; ``upsert`` adds ``"doc_as_upsert":true``.
    - ``logstash_format`` (es.c ``Logstash_Format``): the index becomes
      ``<prefix>-<date>`` from the record time and ``time_key`` is
      injected as ISO-8601 — upstream's Kibana-compatible daily-index
      layout.
    - ``id_col`` is es.c ``Id_Key``: the ``_id`` lifts from a record
      column (``Generate_ID``'s content hash is just
      ``F.md5(F.to_json(...))`` in that column).

    Batching is DETERMINISTIC like :func:`~fluent_bit_spark.sources.
    http.encode_http_json`: records group per index in ``order_col``
    order, ``batch_records`` pairs per body, trailing newline included
    (the _bulk API requires it). Scale shape: the ordering window and
    the body agg both key on the index — with ``logstash_format`` the
    daily indexes parallelize naturally; a single static ``index``
    serializes the global ordering through one task (the price of any
    globally-ordered sink — shard upstream by adding a key to the
    index name if that matters at your volume). Bodies are bounded at
    ``batch_records`` records so no reduce task materializes an
    unbounded string; everything else is codegen'd concat.
    """
    from pyspark.sql import Window

    if logstash_format:
        if ts_col is None:
            raise ValueError("logstash_format needs ts_col")
        idx = F.concat(F.lit(logstash_prefix + "-"),
                       F.date_format(F.col(ts_col).cast("timestamp"),
                                     logstash_dateformat))
    else:
        idx = F.lit(index)

    action_key = {"create": "create", "index": "index",
                  "update": "update", "upsert": "update"}.get(write_op)
    if action_key is None:
        raise ValueError("write_op must be create|index|update|upsert,"
                         f" got {write_op!r}")
    action_parts = [F.lit('{"' + action_key + '":{"_index":"'), idx,
                    F.lit('"')]
    if id_col is not None:
        action_parts += [F.lit(',"_id":"'),
                         F.col(id_col).cast("string"), F.lit('"')]
    action = F.concat(*action_parts, F.lit("}}"))

    fields = []
    if logstash_format:
        fields.append(F.date_format(
            F.col(ts_col).cast("timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias(time_key))
    fields += [F.col(c).alias(c) for c in doc_cols if c != ts_col]
    doc = F.to_json(F.struct(*fields))
    if write_op in ("update", "upsert"):
        doc = F.concat(F.lit('{"doc":'), doc,
                       F.lit(',"doc_as_upsert":true}' if
                             write_op == "upsert" else "}"))
    pair = F.concat(action, F.lit("\n"), doc)

    order = (F.col(order_col) if order_col
             else F.monotonically_increasing_id())
    w = Window.partitionBy(idx).orderBy(order)
    numbered = (df.withColumn("__idx", idx)
                  .withColumn("__pair", pair)
                  .withColumn("__rn", F.row_number().over(w))
                  .withColumn("__batch", ((F.col("__rn") - 1)
                                          / batch_records).cast("long")))
    return (numbered.groupBy(F.col("__idx").alias("index"),
                             F.col("__batch").alias("batch_no"))
            .agg(F.count("*").alias("n_records"),
                 F.concat(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("__rn").alias("o"),
                                      F.col("__pair").alias("p")))),
                         lambda s: s["p"]),
                     "\n"), F.lit("\n")).alias(out)))


def to_loki_push(df: DataFrame, label_cols: list[str], line_col: str,
                 ts_col: str, *, order_col: str | None = None,
                 out: str = "stream_body") -> DataFrame:
    """Loki push-API stream objects — the payload subset of
    upstream:plugins/out_loki (loki.c: ``labels``/``label_keys`` pick
    the stream labels, records render into
    ``{"streams":[{"stream":{...},"values":[["<ns>","<line>"],...]}]}``
    bodies; transport + tenant header scoped out as connectors).

    One output row per STREAM (distinct label set):
    ``(labels…, n_values, stream_body)`` where ``stream_body`` is the
    complete ``{"stream":…,"values":…}`` object with values in
    (timestamp, order) order, timestamps as epoch-nanosecond strings —
    Loki rejects out-of-order appends within a stream, so the ordered
    build is part of the semantics, not cosmetics. Use
    :func:`loki_request_body` to assemble POST bodies.

    Scale shape: one hash exchange keyed by the label set. A stream's
    values concatenate in one reduce task — exactly the upstream
    constraint (a Loki stream is an ordered unit); cardinality guidance
    (bounded label sets) is the user contract as it is for Loki itself.
    JVM-side throughout; the line escapes via ``to_json`` (Jackson), no
    hand escaping."""
    ns = (F.col(ts_col).cast("timestamp").cast("long")
          * F.lit(1000000000)).cast("string")
    # ["<ns>","<line>"] with full JSON string escaping of the line
    value = F.to_json(F.array(ns, F.col(line_col).cast("string")))
    stream = F.to_json(F.struct(*[F.col(c).alias(c)
                                  for c in label_cols]))
    order = F.struct(
        F.col(ts_col).cast("timestamp").alias("t"),
        (F.col(order_col) if order_col
         else F.monotonically_increasing_id()).alias("o"),
    )
    agg = (df.withColumn("__v", value).withColumn("__stream", stream)
             .groupBy(*[F.col(c) for c in label_cols],
                      F.col("__stream"))
             .agg(F.count("*").alias("n_values"),
                  F.array_join(
                      F.transform(
                          F.array_sort(F.collect_list(
                              F.struct(order.alias("k"),
                                       F.col("__v").alias("v")))),
                          lambda s: s["v"]),
                      ",").alias("__joined")))
    return (agg.withColumn(
        out, F.concat(F.lit('{"stream":'), F.col("__stream"),
                      F.lit(',"values":['), F.col("__joined"),
                      F.lit("]}")))
        .drop("__stream", "__joined"))


def loki_request_body(streams: DataFrame,
                      body_col: str = "stream_body") -> str:
    """Assemble one push-API POST body from :func:`to_loki_push` rows
    (streams sorted by their label JSON for determinism). Driver-side
    by design — a POST body is a driver/connector artifact; bounded by
    the label-set cardinality, not the record count."""
    rows = (streams.select(F.col(body_col).alias("b"))
            .orderBy("b").collect())
    return '{"streams":[' + ",".join(r.b for r in rows) + "]}"


def to_template(df: DataFrame, template: str,
                out: str = "value") -> DataFrame:
    """out_file ``Format template`` (upstream:plugins/out_file/file.c
    template mode): render each record through a ``{key}``-placeholder
    line template, e.g. ``Template {time} used={mem.used}``. ``{key}``
    resolves a record key; dotted keys reach into struct columns
    (the msgpack nested-map analogue). Missing/null values render
    empty, matching a lossy printf-style template rather than failing
    the flush. Everything is one JVM-side ``concat`` — codegen'd,
    map-only."""
    import re
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\{([A-Za-z_][\w.]*)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.coalesce(F.col(m.group(1)).cast("string"),
                                F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        parts = [F.lit("")]
    return df.withColumn(out, F.concat(*parts))
