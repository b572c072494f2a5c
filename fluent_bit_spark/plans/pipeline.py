"""The end-to-end pipeline: parse → filter → enrich → tag → route →
fan-out → aggregate, with checkpointed resume and lineage metrics.

Reference lifecycle re-expressed (SURVEY.md §3.1): fluent-bit runs
filters synchronously per chunk with msgpack re-serialization between
every filter (upstream:src/flb_filter.c) and routes chunk-by-chunk
(upstream:src/flb_engine.c, flb_task.c). Here the whole chain is ONE
lazy Catalyst plan per slice — filters fuse into a single whole-stage
codegen span around one Arrow round-trip (detokenize+parse), the routed
DataFrame is persisted once, and the N sink writes + metrics reuse it
(manual common-subplan reuse; Catalyst does not dedupe across actions).

Checkpoint/resume (upstream:plugins/in_tail/tail_db.c offset DB →
per-slice manifest, BASELINE.json north_rule "resumable from
per-partition checkpoints with lineage + metrics"): input files are
grouped into slices; each slice's sink writes land under
``batch_id=<i>`` directories (idempotent overwrite), and a manifest
JSON marks the slice done only after all sinks + metrics commit. A
re-run skips completed slices and reproduces identical outputs.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import fsio
from ..operators.enrich import lookup_join
from ..operators.filters import GrepRule, grep_predicate
from ..operators.router import RewriteTagRule, Route, apply_rewrite_tag, \
    with_routes

TOKENS_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, "
                 "source string")


def tune_scan_partitions(spark: SparkSession, input_path: str,
                         waves: int = 3) -> None:
    """Size ``spark.sql.files.maxPartitionBytes`` for a parse-heavy scan.

    The 256 MB default assumes scan-bound work; this pipeline does
    ~10-100× more CPU per byte (Arrow round-trip + vectorized regex),
    so smaller splits keep every core busy and bound task duration.
    Target ≈ ``waves`` task waves per core; clamp to [8 MB, 256 MB].
    Measured on the 16M-row bench: 8 MB splits beat 256 MB by ~1.6×
    at 8 cores and ~1.7× at 32 (tools/bench_scaling.py).

    Sizing goes through the Hadoop FileSystem API (fsio), so ``s3a://``
    and ``hdfs://`` inputs size identically to local paths."""
    try:
        total = fsio.total_bytes(spark, input_path)
    except Exception:
        return
    if not total:
        return
    cores = spark.sparkContext.defaultParallelism
    target = max(8 << 20, min(256 << 20, total // max(1, cores * waves)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))


@dataclass
class PipelineSpec:
    """Declarative pipeline config — the analogue of a fluent-bit config
    file (inputs/filters/outputs), resolved to a DataFrame plan."""

    vocab: list[str]
    routes: list[Route]
    grep_rules: list[GrepRule] = field(default_factory=list)
    grep_op: str = "AND"
    rewrite_rules: list[RewriteTagRule] = field(default_factory=list)
    lookup_path: str | None = None          # enrichment dim parquet
    lookup_key: str = "source"
    # [FILTER] lookup Cache_TTL — resolve the dim through a TTL-cached
    # pinned snapshot (operators/enrich.DimCache, the
    # filter_kubernetes metadata-cache posture). None = plain read.
    lookup_ttl: float | None = None
    tag_expr: str | None = None             # SQL expr for the tag column
    sink_partition_by: list[str] = field(default_factory=lambda: ["source"])
    salt_buckets: int = 32
    fanout_mode: str = "persist"            # 'persist' | 'explode'
    # sink payload format: columnar parquet (default) or an out_file
    # text serializer (functions/serialize.py): newline-delimited JSON,
    # RFC-4180 csv, or tab-separated ltsv — complex columns as JSON
    # parquet|json_lines|csv|ltsv|template|msgpack (msgpack =
    # PackedForward chunk files, the out_forward byte format)
    sink_format: str = "parquet"
    # out_file Format template line pattern ({key} placeholders, dotted
    # keys reach into structs — upstream:plugins/out_file template mode)
    sink_template: str | None = None
    # Format gelf (out_gelf analogue): which record keys feed the GELF
    # fixed fields — upstream:plugins/out_gelf Gelf_*_Key properties.
    # {"host": col, "message": col, "ts": col, "level": col|None};
    # every other payload column rides as a _-prefixed extra.
    gelf_keys: dict | None = None
    # Decoded-line retention in sink output. 'always' (default) keeps the
    # decoded text on every row — fluent-bit's record body rides to the
    # sink, so dropping it silently would surprise any downstream reader.
    # 'dlq_only' is an explicit bandwidth opt-in (decoded is NULLed for
    # successfully-parsed rows); 'auto' infers dlq_only only when no
    # grep/rewrite rule or tag_expr references the raw line, and warns.
    keep_decoded: str = "always"            # 'always' | 'dlq_only' | 'auto'
    # Second-stage parsers (filter_parser analogue,
    # upstream:plugins/filter_parser): each entry re-parses one column
    # with a named-parser chain, adding a typed struct column. Applied
    # before grep so grep/tag rules can reference the extracted fields.
    parser_filters: list["ParserFilterSpec"] = field(default_factory=list)
    # filter_modify blocks (operators/modify.py ModifySpec), applied
    # after parser_filters / before grep in config order.
    modify_specs: list = field(default_factory=list)
    # filter_nest blocks: ("nest"|"lift", kwargs for operators/nest.py),
    # applied LAST (output shaping — after tag/route/DLQ, so internal
    # schema references survive any reshaping).
    nest_ops: list = field(default_factory=list)
    # filter_type_converter blocks: [(src, dst, type)] via
    # operators/filters.type_convert (try_cast: bad values → null, the
    # record survives — upstream drops just the conversion). Applied
    # after modify_specs.
    type_conversions: list = field(default_factory=list)
    # sampling: (key, rate) — keep 1-in-rate rows by key hash
    # (operators/filters.deterministic_sample; golden-safe, unlike
    # Bernoulli). Applied after grep, before enrichment.
    sample_spec: tuple | None = None
    # filter_throttle blocks: dicts {rate, keys, ts_key, interval} via
    # operators/throttle.throttle. Applied after tag/rewrite (throttle
    # keys default to the tag, like upstream's per-tag instances) and
    # before routing, so dropped rows never reach a sink.
    throttle_specs: list = field(default_factory=list)
    # multiline preset (docker/cri/java/python/go) for the TEXT path:
    # physical lines join into logical events before parsing
    # (operators/multiline.py; needs the ordered read — see
    # build_stages_text / read_text_ordered). Ignored on tokens input.
    multiline_parser: str | None = None
    # filter_expect blocks: (cond_sql, action) with action exit|warn|
    # result_key per upstream:plugins/filter_expect. All rules in one
    # block AND together into cond_sql. Applied after type conversion
    # (expect validates parser/converter output), before grep.
    expect_specs: list = field(default_factory=list)
    # filter_checklist blocks: dicts {path, format, lookup_key, mode,
    # sets} — value list broadcast against lookup_key. mode 'flag'
    # (upstream default: stamp matched + apply Record k v sets on hit),
    # 'keep' (semi join) or 'drop' (anti join) extensions. Applied with
    # the other enrichment joins, right after lookup.
    checklist_specs: list = field(default_factory=list)
    # [FILTER] gopher_quality — integer-exact composite quality gate
    # (functions/text.py gopher_filter): {key, action flag|drop,
    # thresholds}. Applied after type conversion, before grep, so a
    # grep/route can key on gq_keep / gq_reasons.
    gopher_spec: dict | None = None
    # [FILTER] stratified_split — deterministic per-group eval holdout
    # (operators/filters.stratified_split): {group_key, hash_key,
    # rates, default_permille}. Map-only stamp applied right before
    # tagging so the tag expression / routes can key on ``split``.
    split_spec: dict | None = None
    # [FILTER] log_to_metrics blocks
    # (upstream:plugins/filter_log_to_metrics): dicts {name, mode,
    # labels, value_field, buckets, gauge_mode, grep_rules,
    # description}. Side outputs — each slice writes the metric frame
    # under metrics_out/<name>/ (the batch analogue of re-emitting
    # metrics records under a new tag); records pass through untouched.
    metrics_specs: list = field(default_factory=list)
    # [FILTER] script / lua-equivalent blocks
    # (upstream:plugins/filter_lua surface over operators/script.py):
    # dicts {path, call} — ``call`` names a batch function
    # (pandas.DataFrame -> pandas.DataFrame, same schema) in the
    # Python file at ``path``; applied via mapInPandas after the
    # record-shaping filters (modify/type_converter), before expect.
    script_specs: list = field(default_factory=list)
    # [INPUT] http (sources/http.py decode side): {tag, tag_key} —
    # body-per-line capture files decode to records before the text
    # stages; None means the input is not http.
    http_input: dict | None = None
    # [OUTPUT] Format http (sources/http.py encode side): {format,
    # batch_records, order_key, json_date_key, json_date_format,
    # ts_key} — sinks land request-body text files.
    http_output: dict | None = None
    # [OUTPUT] Name es (functions/serialize.to_es_bulk): {index,
    # logstash_format, logstash_prefix, logstash_dateformat (Java
    # pattern), time_key, ts_key, id_key, generate_id,
    # write_operation, batch_records, order_key} — sinks land _bulk
    # body text files.
    es_output: dict | None = None
    # [OUTPUT] Name loki (functions/serialize.to_loki_push): {labels
    # (static k=v map), label_keys (record columns), line_format
    # json|key_value, ts_key, order_key} — sinks land one stream
    # object per line.
    loki_output: dict | None = None
    # [OUTPUT] Name kafka (sources/kafka_batches.py encode side):
    # {message_key_field, topic_key, ts_key} — sinks land RecordBatch
    # v2 segment files, topic = tag (or the Topic_Key record field),
    # records JSON-rendered like out_kafka's default Format json.
    kafka_output: dict | None = None


@dataclass
class ParserFilterSpec:
    """One ``[FILTER] Name parser`` block: re-parse column ``key`` with
    a first-match chain of named parsers into struct column ``out``.
    The source column is always preserved (Reserve_Data On posture —
    this engine adds columns, it never destroys the record body)."""

    key: str
    parsers: list                           # list[RegexParser]
    out: str = "parsed"


_SCRIPT_CACHE: dict = {}


def load_script_fn(path: str, call: str):
    """Load the batch function a ``[FILTER] script`` block names — the
    filter_lua ``script``/``call`` surface with a Python-batch runtime
    (upstream:plugins/filter_lua/lua.c receives one record per call;
    the vectorized contract here is pandas.DataFrame -> pandas.DataFrame
    over each Arrow batch, operators/script.py). Modules load once per
    driver and ship to executors by closure serialization."""
    key = (os.path.abspath(path), call)
    if key not in _SCRIPT_CACHE:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            f"_fbs_script_{abs(hash(key))}", path)
        if spec is None or spec.loader is None:
            raise ValueError(f"[FILTER] script: cannot load {path!r}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn = getattr(mod, call, None)
        if not callable(fn):
            raise ValueError(
                f"[FILTER] script: {path!r} defines no callable "
                f"{call!r} (the Call property must name a batch "
                f"function taking and returning a pandas.DataFrame)")
        _SCRIPT_CACHE[key] = fn
    return _SCRIPT_CACHE[key]


def default_tag_expr() -> str:
    """tag = app.<source>.<kind> (tag-from-path analogue of in_tail's
    tag_regex, upstream:plugins/in_tail)."""
    return "concat('app.', source, '.', coalesce(fields.kind, 'raw'))"


def build_stages(spark: SparkSession, df: DataFrame,
                 spec: PipelineSpec) -> DataFrame:
    """Compose the lazy plan: input → routed (with sinks + dlq_reason).

    ``tokens`` passes through untouched end-to-end (token-equality
    invariant) — every stage only adds columns or filters rows."""
    from ..functions.parsers import fused_detok_parse
    keep = spec.keep_decoded
    if keep == "auto":
        # any rule addressing the raw line forces full decode retention;
        # otherwise warn that sink rows will carry decoded=NULL
        refs_decoded = (
            any(r.key == "decoded" for r in spec.grep_rules)
            or any(r.key == "decoded" for r in spec.rewrite_rules)
            or "decoded" in (spec.tag_expr or ""))
        keep = "always" if refs_decoded else "dlq_only"
        if keep == "dlq_only":
            import warnings
            warnings.warn(
                "keep_decoded='auto' resolved to 'dlq_only': no pipeline "
                "rule references the decoded line, so sink output will "
                "carry decoded=NULL for parsed rows. Set "
                "keep_decoded='always' to retain it.", stacklevel=2)
    out = fused_detok_parse(df, spark, spec.vocab, keep_decoded=keep)
    return _post_parse_stages(spark, out, spec)


def _apply_checklist(spark: SparkSession, out: DataFrame,
                     ck: dict) -> DataFrame:
    """One [FILTER] checklist block (upstream:plugins/filter_checklist):
    the value list is a one-value-per-line text file (or parquet with a
    ``value`` / lookup-key column) broadcast against ``lookup_key``.
    mode 'flag' stamps ``matched`` and applies ``Record k v`` sets on
    hit (upstream behavior); 'keep'/'drop' are the semi/anti-join
    extensions."""
    from ..operators.enrich import checklist_flag, checklist_keep
    path, key = ck["path"], ck["lookup_key"]
    action = ck.get("action", "flag")
    if str(path).endswith(".parquet"):
        values = spark.read.parquet(path)
        list_key = ("value" if "value" in values.columns
                    else values.columns[0])
    else:  # upstream list format: one value per line
        values = spark.read.text(path)
        list_key = "value"
    join_key, tmp = key, False
    if ck.get("ignore_case"):
        values = values.select(
            F.lower(F.col(list_key).cast("string")).alias(list_key))
        out = out.withColumn("__ck_key",
                             F.lower(F.col(key).cast("string")))
        join_key, tmp = "__ck_key", True
    if action == "keep":
        out = checklist_keep(out, values, join_key, list_key=list_key)
    elif action == "drop":
        dim = values.select(
            F.col(list_key).cast("string").alias("__ck_val")).distinct()
        out = out.join(
            F.broadcast(dim),
            F.col(join_key).cast("string") == F.col("__ck_val"),
            "left_anti")
    else:
        out = checklist_flag(out, values, join_key, list_key=list_key)
        for k, v in ck.get("sets", []):
            out = out.withColumn(
                k, F.when(F.col("matched"), F.lit(v))
                    .otherwise(F.col(k) if k in out.columns
                               else F.lit(None).cast("string")))
    return out.drop("__ck_key") if tmp else out


def _post_parse_stages(spark: SparkSession, out: DataFrame,
                       spec: PipelineSpec) -> DataFrame:
    """[parser filters →] grep → enrich → tag → rewrite → route →
    dlq_reason — shared by the tokens path (fused detok+parse) and the
    raw-text path."""
    if spec.parser_filters:
        from ..functions.parsers import (apply_regex_parser,
                                         parse_first_match)
        for pf in spec.parser_filters:
            if len(pf.parsers) == 1:
                out = apply_regex_parser(out, pf.parsers[0],
                                         key=pf.key, out=pf.out)
            else:
                out = parse_first_match(out, pf.parsers,
                                        key=pf.key, out=pf.out)
    if spec.modify_specs:
        from ..operators.modify import apply_modify
        for ms in spec.modify_specs:
            out = apply_modify(out, ms)
    if spec.type_conversions:
        from ..operators.filters import type_convert
        out = type_convert(out, spec.type_conversions)
    if spec.script_specs:
        from ..operators.script import filter_map_batches
        for ss in spec.script_specs:
            out = filter_map_batches(out, load_script_fn(ss["path"],
                                                         ss["call"]))
    if spec.expect_specs:
        from ..operators.filters import expect
        for es in spec.expect_specs:
            out = expect(out, F.expr(es["cond"]),
                         action=es.get("action", "exit"),
                         result_key=es.get("result_key", "_expect_ok"))
    if spec.gopher_spec:
        from ..functions.text import gopher_filter
        g = spec.gopher_spec
        out = gopher_filter(out, col=g["key"], **g.get("thresholds", {}))
        if g.get("action") == "drop":
            out = out.filter(F.col("gq_keep")) \
                     .drop("gq_reasons", "gq_keep")
    if spec.grep_rules:
        # grep drops rows entirely in fluent-bit; we keep them for the DLQ
        # accounting instead when they fail parse, but a grep miss is a
        # real drop (matches reference: grep'd records vanish silently —
        # we still count them via metrics on the pre-grep frame if needed)
        out = out.filter(grep_predicate(spec.grep_rules, spec.grep_op))
    if spec.sample_spec:
        from ..operators.filters import deterministic_sample
        key, rate = spec.sample_spec
        out = deterministic_sample(out, key, rate)
    if spec.lookup_path:
        if spec.lookup_ttl is not None:
            from ..operators.enrich import dim_cache_for
            dim = dim_cache_for(spec.lookup_path,
                                spec.lookup_ttl).resolve(spark)
        else:
            dim = spark.read.parquet(spec.lookup_path)
        out = lookup_join(out, dim, spec.lookup_key)
    for ck in spec.checklist_specs:
        out = _apply_checklist(spark, out, ck)
    if spec.split_spec:
        from ..operators.filters import stratified_split
        sp = spec.split_spec
        out = stratified_split(out, sp["group_key"], sp["hash_key"],
                               sp.get("rates", {}),
                               sp.get("default_permille", 0))
    out = out.withColumn("tag", F.expr(spec.tag_expr or default_tag_expr()))
    if spec.rewrite_rules:
        out = apply_rewrite_tag(out, spec.rewrite_rules)
    if spec.throttle_specs:
        from ..operators.throttle import throttle
        for tsp in spec.throttle_specs:
            out = throttle(out, tsp["rate"], tsp["keys"],
                           ts_col=tsp.get("ts_key"),
                           interval=tsp.get("interval", "1 minute"),
                           tiebreak=tsp.get("tiebreak") or ["doc_id"])
    out = with_routes(out, spec.routes)
    out = out.withColumn(
        "dlq_reason",
        F.when(~F.col("parse_ok"), F.lit("parse_fail"))
         .when(F.size("sinks") == 0, F.lit("no_route")))
    if spec.nest_ops:
        # nest/lift are OUTPUT-SHAPING transforms (flb users nest/
        # flatten the record for the sink), so they run after tagging/
        # routing — internal stages (tag_expr, rewrite rules, DLQ) keep
        # their schema references regardless of reshaping.
        from ..operators.nest import lift, nest
        for op, kw in spec.nest_ops:
            out = (nest(out, **kw) if op == "nest" else lift(out, **kw))
    return out


def read_text_ordered(spark: SparkSession, path) -> DataFrame:
    """Text read with a DETERMINISTIC per-file order column —
    ``(value, line_no)`` — which the multiline joiners require (plain
    ``spark.read.text`` guarantees no row order). ``wholetext`` loads
    each FILE as one row (memory bounded by the rotated-log file size —
    the in_tail deployment shape), then split + posexplode numbers the
    physical lines. 100 TB shape: parallelism = one task per file,
    which matches how log corpora arrive (many rotated files)."""
    whole = spark.read.text(path, wholetext=True)
    lines = F.split(F.regexp_replace("value", r"\n$", ""), "\n")
    return whole.select(
        F.posexplode(lines).alias("line_no", "value"))


def build_stages_text(spark: SparkSession, df_text: DataFrame,
                      spec: PipelineSpec,
                      source_regex: str = r"([^/]+)\.log") -> DataFrame:
    """The RAW-TEXT ingestion path — what a fluent-bit user actually
    tails (`spark.read.text` over .log files), sharing every stage
    after the parse with the tokens path:

    - ``source`` extracted from the file path (in_tail tag-from-path,
      upstream:plugins/in_tail tag_regex) via ``source_regex``;
    - optional MULTILINE JOIN (``spec.multiline_parser`` one of the
      flb presets docker/cri/java/python/go): physical lines group into
      logical events BEFORE parsing — requires the ordered read
      (``read_text_ordered``), since joining needs line order;
    - ``doc_id`` content-derived (xxhash64 of file + line — stable
      across re-runs, duplicate identical lines share an id);
    - ``n_tok`` = whitespace token count of the line (the token-table
      path gets it from the input schema);
    - the SAME vectorized parser as the fused path (one Arrow-batched
      pandas UDF — no per-row Python).
    """
    from ..functions.parsers import with_parsed
    extra = [c for c in df_text.columns
             if c not in ("value", "line_no", "_input_file")]
    # a decoder that crossed the Python/Arrow boundary (syslog framing)
    # supplies _input_file itself — input_file_name() is empty there
    src_file = (F.col("_input_file")
                if "_input_file" in df_text.columns
                else F.input_file_name())
    out = df_text.select(
        F.col("value").alias("decoded"),
        src_file.alias("_input_file"),
        *(["line_no"] if "line_no" in df_text.columns else []),
        *extra)
    if spec.multiline_parser:
        if "line_no" not in out.columns:
            raise ValueError(
                "multiline joining needs an ordered text read — load the "
                "input with read_text_ordered(spark, path) so each line "
                "carries (file, line_no)")
        from ..operators.multiline import multiline_preset
        # extras (e.g. the _lineage struct) are constant per file, so a
        # tiny per-file first() table re-attaches them after the join
        extras_by_file = None
        if extra:
            extras_by_file = (out.groupBy("_input_file")
                              .agg(*[F.first(c).alias(c) for c in extra]))
        ml = multiline_preset(out, spec.multiline_parser,
                              "_input_file", "line_no", "decoded")
        out = ml.select("_input_file",
                        F.col("event").alias("decoded"))
        if extras_by_file is not None:
            out = out.join(F.broadcast(extras_by_file), "_input_file")
    out = (out
           .withColumn("source",
                       F.regexp_extract("_input_file", source_regex, 1))
           .withColumn("doc_id",
                       F.concat(F.lit("t"),
                                F.abs(F.xxhash64("_input_file", "decoded"))
                                .cast("string")))
           .withColumn("n_tok", F.size(F.split("decoded", " ")))
           .drop("_input_file", *(["line_no"] if "line_no" in out.columns
                                  else [])))
    out = with_parsed(out, "decoded")
    return _post_parse_stages(spark, out, spec)


def sink_names(spec: PipelineSpec) -> list[str]:
    seen: list[str] = []
    for r in spec.routes:
        if r.sink not in seen:
            seen.append(r.sink)
    return seen


def slice_metrics(routed: DataFrame, salt_buckets: int) -> DataFrame:
    """Per-tag lineage metrics for one slice: records, token sums, distinct
    sources, parse failures — the cmetrics/flb_metrics analogue
    (upstream:src/flb_metrics.c), derived from the persisted routed DF so
    it costs no extra scan of the input."""
    from ..operators.aggregate import salted_sink_aggregates
    per_tag = salted_sink_aggregates(
        routed, ["tag"], salt_buckets=salt_buckets)
    dlq = (routed.groupBy("tag")
                 .agg(F.sum(F.when(F.col("dlq_reason") == "parse_fail", 1)
                            .otherwise(0)).alias("parse_fail"),
                      F.sum(F.when(F.col("dlq_reason") == "no_route", 1)
                            .otherwise(0)).alias("no_route")))
    return per_tag.join(dlq, "tag", "left")


# ---------------------------------------------------------------------------
# Checkpointed runner
# ---------------------------------------------------------------------------


def _manifest_dir(output_dir: str, run_id: str) -> str:
    # plain '/' join, NOT os.path.join — output_dir may be a URI
    # (s3a://bucket/out); the separator is '/' on every Hadoop FS
    return f"{output_dir}/_checkpoints/{run_id}"


def completed_slices(spark: SparkSession, output_dir: str,
                     run_id: str) -> set[int]:
    """Slice ids with a committed manifest — via the Hadoop FS API, so
    resume works against s3a://, hdfs:// and file: alike."""
    out = set()
    for f in fsio.list_names(spark, _manifest_dir(output_dir, run_id)):
        if f.startswith("slice_") and f.endswith(".json"):
            out.add(int(f[6:-5]))
    return out


def _commit_slice(spark: SparkSession, output_dir: str, run_id: str,
                  i: int, payload: dict) -> None:
    d = _manifest_dir(output_dir, run_id)
    # dot-temp + rename through the path's own filesystem (fsio docstring
    # covers the per-FS atomicity contract)
    fsio.write_json_atomic(spark, f"{d}/slice_{i}.json", payload)


def run_pipeline(spark: SparkSession, spec: PipelineSpec, input_path: str,
                 output_dir: str, run_id: str = "run0",
                 n_slices: int = 1,
                 fail_after_slice: int | None = None,
                 input_format: str = "tokens") -> dict:
    """Execute the pipeline with per-slice checkpointing.

    Returns run stats. ``fail_after_slice`` injects a crash for the
    resume property test (kill after k slices → re-run → identical sinks).

    Scale shape: each slice is an independent bounded job whose sink
    writes are partition-local (no shuffle — routing is a map-side
    expression); the only shuffle per slice is the metrics aggregation,
    which is salted two-phase. On a 1000-executor cluster slices become
    much larger file groups; the manifest bounds re-work on failure to
    one slice.
    """
    t0 = time.time()
    tune_scan_partitions(spark, input_path)
    if input_format in ("text", "http"):
        all_files = sorted(spark.read.text(input_path).inputFiles())
    elif input_format in ("forward", "syslog", "kafka", "systemd"):
        all_files = sorted(spark.read.format("binaryFile")
                           .load(input_path).inputFiles())
    else:
        all_files = sorted(spark.read.schema(TOKENS_SCHEMA)
                           .parquet(input_path).inputFiles())
    slices = [all_files[i::n_slices] for i in range(n_slices)]
    slices = [s for s in slices if s]
    done = completed_slices(spark, output_dir, run_id)
    sinks = sink_names(spec)
    stats = {"slices_total": len(slices), "slices_skipped": len(done),
             "rows_in": 0, "rows_dlq": 0}

    for i, files in enumerate(slices):
        if i in done:
            continue
        # lineage must be stamped on the RAW scan: input_file_name()
        # cannot be evaluated above the rewrite-tag re-injection union
        # (MULTI_SOURCES_UNSUPPORTED_FOR_EXPRESSION)
        lineage = F.struct(F.lit(i).alias("batch_id"),
                           F.input_file_name().alias("input_file"))
        if input_format == "text":
            reader = (read_text_ordered(spark, files)
                      if spec.multiline_parser
                      else spark.read.text(files))
            df = reader.withColumn("_lineage", lineage)
            routed = build_stages_text(spark, df, spec)
        elif input_format == "http":
            # in_http file subset (sources/http.py): each line is one
            # POST body; records explode out, the conventional "log"
            # field (or the whole record, re-rendered) becomes the raw
            # line for the shared text stages, and the body-supplied
            # tag wins unless the config sets an explicit tag_expr
            # (the in_forward precedent). Malformed bodies keep the raw
            # body as the line and are FORCED to the DLQ below —
            # upstream answers 400 and never ingests them; a batch
            # replay keeps the bytes for the dead-letter audit.
            import dataclasses

            from ..sources.http import decode_http_json
            hp = spec.http_input or {}
            raw = (spark.read.text(files)
                   .filter(F.length(F.trim("value")) > 0)
                   .withColumnRenamed("value", "body")
                   .withColumn("_lineage", lineage))
            dec = decode_http_json(raw, tag=hp.get("tag", "http.0"),
                                   tag_key=hp.get("tag_key"),
                                   keep_cols=("body", "_lineage"))
            df = dec.select(
                F.when(F.col("parse_ok"),
                       F.coalesce(F.col("record")["log"],
                                  F.to_json("record")))
                 .otherwise(F.col("body")).alias("value"),
                F.col("tag").alias("http_tag"),
                F.col("parse_ok").alias("__http_ok"),
                "_lineage")
            hspec = (spec if spec.tag_expr
                     else dataclasses.replace(spec, tag_expr="http_tag"))
            routed = (build_stages_text(spark, df, hspec)
                      .withColumn("parse_ok",
                                  F.col("parse_ok") & F.col("__http_ok"))
                      .withColumn("dlq_reason",
                                  F.when(~F.col("__http_ok"),
                                         F.lit("parse_fail"))
                                   .otherwise(F.col("dlq_reason")))
                      .drop("__http_ok", "http_tag"))
        elif input_format == "syslog":
            # in_syslog TCP file subset (sources/syslog_frames.py):
            # each capture file is one connection's octet-framed byte
            # stream (RFC 6587); frames walk out sequentially in the
            # Arrow kernel and each message rides the shared text
            # stages (the configured [FILTER] parser applies the
            # syslog preset, upstream in_syslog's Parser property).
            # Framing errors are FORCED to the DLQ as parse_fail
            # (the reason class the metrics contract counts — same
            # posture as malformed http bodies); upstream drops the
            # connection, a batch replay keeps the bytes for the
            # dead-letter audit.
            from ..sources.syslog_frames import decode_octet_frames
            raw = (spark.read.format("binaryFile").load(files)
                   .select("path", "content"))
            dec = decode_octet_frames(raw, "content", group_col="path")
            df = dec.select(
                F.col("msg").alias("value"),
                F.col("group").alias("_input_file"),
                F.col("frame_ok").alias("__frame_ok"),
                F.struct(F.lit(i).alias("batch_id"),
                         F.col("group").alias("input_file"))
                 .alias("_lineage"))
            routed = (build_stages_text(spark, df, spec)
                      .withColumn("parse_ok",
                                  F.col("parse_ok") & F.col("__frame_ok"))
                      .withColumn("dlq_reason",
                                  F.when(~F.col("__frame_ok"),
                                         F.lit("parse_fail"))
                                   .otherwise(F.col("dlq_reason")))
                      .drop("__frame_ok"))
        elif input_format == "kafka":
            # in_kafka file subset (sources/kafka_batches.py): each
            # capture file is a concatenation of RecordBatch v2
            # batches; record values ride the shared text stages and
            # the topic becomes the tag by default (upstream in_kafka
            # tags by topic) — an explicit tag_expr overrides. A
            # CRC-failed batch decodes to one sentinel row that is
            # FORCED to the DLQ as parse_fail (upstream's consumer
            # aborts the fetch; a batch replay keeps the evidence).
            import dataclasses

            from ..sources.kafka_batches import read_kafka_segments
            kdf = read_kafka_segments(spark, files, with_path=True)
            df = kdf.select(
                F.coalesce(F.col("value").cast("string"), F.lit(""))
                 .alias("value"),
                F.col("topic").alias("kafka_tag"),
                F.col("crc_ok").alias("__crc_ok"),
                F.col("_input_file"),
                F.struct(F.lit(i).alias("batch_id"),
                         F.col("_input_file").alias("input_file"))
                 .alias("_lineage"))
            kspec = (spec if spec.tag_expr
                     else dataclasses.replace(spec,
                                              tag_expr="kafka_tag"))
            routed = (build_stages_text(spark, df, kspec)
                      .withColumn("parse_ok",
                                  F.col("parse_ok") & F.col("__crc_ok"))
                      .withColumn("dlq_reason",
                                  F.when(~F.col("__crc_ok"),
                                         F.lit("parse_fail"))
                                   .otherwise(F.col("dlq_reason")))
                      .drop("__crc_ok", "kafka_tag"))
        elif input_format == "systemd":
            # in_systemd file subset (sources/journal_export.py):
            # each capture file is a Journal Export Format stream
            # (journalctl -o export / systemd-journal-remote). The
            # MESSAGE field rides the shared text stages; the tag
            # derives from _SYSTEMD_UNIT (systemd.<unit>) unless the
            # config sets tag_expr. Malformed entries are FORCED to
            # the DLQ as parse_fail with their partial fields kept.
            import dataclasses

            from ..sources.journal_export import (decode_export,
                                                  with_journal_tag)
            raw = (spark.read.format("binaryFile").load(files)
                   .select("path", "content"))
            dec = with_journal_tag(
                decode_export(raw, "content", passthrough=["path"]))
            df = dec.select(
                F.coalesce(F.element_at("fields", "MESSAGE"),
                           F.lit("")).alias("value"),
                F.col("tag").alias("journal_tag"),
                F.col("entry_ok").alias("__entry_ok"),
                F.col("path").alias("_input_file"),
                F.struct(F.lit(i).alias("batch_id"),
                         F.col("path").alias("input_file"))
                 .alias("_lineage"))
            jspec = (spec if spec.tag_expr
                     else dataclasses.replace(spec,
                                              tag_expr="journal_tag"))
            routed = (build_stages_text(spark, df, jspec)
                      .withColumn("parse_ok",
                                  F.col("parse_ok")
                                  & F.col("__entry_ok"))
                      .withColumn("dlq_reason",
                                  F.when(~F.col("__entry_ok"),
                                         F.lit("parse_fail"))
                                   .otherwise(F.col("dlq_reason")))
                      .drop("__entry_ok", "journal_tag"))
        elif input_format == "forward":
            # in_forward file subset: decode another pipeline's (or
            # fluent-bit sender's) chunk files; the transmitted tag is
            # PRESERVED by default (in_forward keeps the sender's tag,
            # unlike tail's tag-from-path) — an explicit tag_expr still
            # overrides. Lineage rides the decoder's path passthrough
            # (input_file_name() dies at the Python boundary).
            import dataclasses

            from ..sources.forward import TOKEN_FIELDS, read_forward_files
            fdf = read_forward_files(spark, files, TOKEN_FIELDS,
                                     with_path=True)
            df = (fdf.withColumnRenamed("tag", "fwd_tag")
                  .withColumn("_lineage", F.struct(
                      F.lit(i).alias("batch_id"),
                      F.col("_input_file").alias("input_file")))
                  .drop("_input_file", "sec", "nsec"))
            fspec = (spec if spec.tag_expr
                     else dataclasses.replace(spec, tag_expr="fwd_tag"))
            routed = build_stages(spark, df, fspec).drop("fwd_tag")
        else:
            df = (spark.read.schema(TOKENS_SCHEMA).parquet(*files)
                  .withColumn("_lineage", lineage))
            routed = build_stages(spark, df, spec)
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            good = routed.filter(F.col("dlq_reason").isNull())
            if spec.fanout_mode == "explode":
                # single-pass fast path: duplicates multi-routed rows under
                # each sink dir — exactly fluent-bit's per-output flush
                (good.withColumn("sink", F.explode("sinks"))
                     .write.mode("overwrite")
                     .partitionBy("sink", *spec.sink_partition_by)
                     .parquet(f"{output_dir}/sinks_by_dir/"
                              f"batch_id={i}"))
            elif spec.sink_format in ("json_lines", "csv", "ltsv",
                                      "template", "gelf"):
                # out_file text formats: sinks are newline-delimited
                # text files (the serializer rides the same fan-out)
                from ..functions.serialize import (to_csv_line, to_gelf,
                                                   to_json_lines,
                                                   to_ltsv_line,
                                                   to_template)
                if spec.sink_format == "template":
                    def ser(d, cols, _t=spec.sink_template or ""):
                        return to_template(d, _t)
                elif spec.sink_format == "gelf":
                    # out_gelf posture: fixed keys from gelf_keys,
                    # every other payload column as a _-prefixed extra
                    gk = spec.gelf_keys or {}
                    host = gk.get("host", "host")
                    msg = gk.get("message", "short_message")
                    tsc = gk.get("ts", "timestamp")
                    lvl = gk.get("level")

                    def ser(d, cols, _h=host, _m=msg, _t=tsc, _l=lvl):
                        named = {_h, _m, _t} | ({_l} if _l else set())
                        return to_gelf(
                            d, _h, _m, _t, level_col=_l,
                            extra_cols=[c for c in cols
                                        if c not in named])
                else:
                    ser = {"json_lines": to_json_lines,
                           "csv": to_csv_line,
                           "ltsv": to_ltsv_line}[spec.sink_format]
                payload_cols = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage")]
                for s in sinks:
                    (ser(good.filter(F.array_contains("sinks", s)),
                         payload_cols)
                     .select("value", *spec.sink_partition_by)
                     .write.mode("overwrite")
                     .partitionBy(*spec.sink_partition_by)
                     .text(f"{output_dir}/sinks/{s}/batch_id={i}"))
            elif spec.sink_format == "http":
                # out_http payload subset (sources/http.py): each sink
                # dir lands request-body lines — deterministic
                # (tag, order_key) batches of batch_records records per
                # POST body, flb_pack json/json_lines/json_stream
                # rendering. One exchange keyed by (tag, batch_no).
                from ..sources.http import encode_http_json
                ho = spec.http_output or {}
                payload_cols = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage",
                                             "tag")]
                order_key = ho.get("order_key") or (
                    "doc_id" if "doc_id" in good.columns else None)
                for s in sinks:
                    bodies = encode_http_json(
                        good.filter(F.array_contains("sinks", s)),
                        payload_cols, fmt=ho.get("format", "json"),
                        batch_records=int(ho.get("batch_records", 100)),
                        order_col=order_key, tag_col="tag",
                        ts_col=ho.get("ts_key"),
                        json_date_key=ho.get("json_date_key", "date"),
                        json_date_format=ho.get("json_date_format",
                                                "double"))
                    (bodies.select(F.col("body").alias("value"))
                           .write.mode("overwrite")
                           .text(f"{output_dir}/sinks/{s}/batch_id={i}"))
            elif spec.sink_format == "es":
                # out_es payload subset (functions/serialize.py
                # to_es_bulk): each sink dir lands _bulk request
                # bodies — action+source NDJSON pairs in deterministic
                # (index, order_key) batches. Transport (HTTP client,
                # auth, 429 retry) is a connector concern.
                from ..functions.serialize import to_es_bulk
                eo = spec.es_output or {}
                payload_cols = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage",
                                             "tag")]
                order_key = eo.get("order_key") or (
                    "doc_id" if "doc_id" in good.columns else None)
                for s in sinks:
                    sel = good.filter(F.array_contains("sinks", s))
                    if eo.get("generate_id"):
                        # upstream Generate_ID: content-hash _id —
                        # idempotent re-delivery dedupes server-side
                        sel = sel.withColumn("__gen_id", F.md5(
                            F.to_json(F.struct(*[F.col(c) for c
                                                 in payload_cols]))))
                        id_col = "__gen_id"
                    else:
                        id_col = eo.get("id_key")
                    bodies = to_es_bulk(
                        sel, payload_cols,
                        index=eo.get("index", "fluent-bit"),
                        logstash_format=bool(eo.get("logstash_format")),
                        logstash_prefix=eo.get("logstash_prefix",
                                               "logstash"),
                        logstash_dateformat=eo.get("logstash_dateformat",
                                                   "yyyy.MM.dd"),
                        ts_col=eo.get("ts_key"),
                        time_key=eo.get("time_key", "@timestamp"),
                        id_col=id_col,
                        write_op=eo.get("write_operation", "create"),
                        batch_records=int(eo.get("batch_records", 500)),
                        order_col=order_key)
                    (bodies.select(F.col("body").alias("value"))
                           .write.mode("overwrite")
                           .text(f"{output_dir}/sinks/{s}/batch_id={i}"))
            elif spec.sink_format == "loki":
                # out_loki payload subset (functions/serialize.py
                # to_loki_push): each sink dir lands one stream object
                # per line (labels + ordered ["<ns>","<line>"] values);
                # a push connector wraps lines into {"streams":[...]}.
                # Without Ts_Key the batch id stands in for flush time
                # (deterministic replay beats wall clock).
                from ..functions.serialize import (to_key_value_line,
                                                   to_loki_push)
                lo = spec.loki_output or {}
                base_payload = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage",
                                             "tag")]
                for s in sinks:
                    sel = good.filter(F.array_contains("sinks", s))
                    label_cols: list[str] = []
                    for k, v in (lo.get("labels")
                                 or {"job": "fluent-bit"}).items():
                        sel = sel.withColumn(k, F.lit(v))
                        label_cols.append(k)
                    for k in lo.get("label_keys") or []:
                        if k not in label_cols:
                            label_cols.append(k)
                    line_cols = [c for c in base_payload
                                 if c not in label_cols]
                    if lo.get("line_format", "json") == "key_value":
                        sel = to_key_value_line(sel, line_cols,
                                                out="__line")
                    else:
                        sel = sel.withColumn("__line", F.to_json(
                            F.struct(*[F.col(c) for c in line_cols])))
                    ts_key = lo.get("ts_key")
                    if ts_key is None:
                        sel = sel.withColumn(
                            "__ts", F.timestamp_seconds(F.lit(i)))
                        ts_key = "__ts"
                    order_key = lo.get("order_key") or (
                        "doc_id" if "doc_id" in sel.columns else None)
                    streams = to_loki_push(sel, label_cols, "__line",
                                           ts_key, order_col=order_key)
                    (streams.select(F.col("stream_body").alias("value"))
                            .write.mode("overwrite")
                            .text(f"{output_dir}/sinks/{s}/batch_id={i}"))
            elif spec.sink_format == "kafka":
                # out_kafka posture (upstream:plugins/out_kafka with
                # the librdkafka transport scoped out): records render
                # to JSON (the default Format json), fold into
                # RecordBatch v2 segments per topic per task, and land
                # as .log files a real consumer (or in_kafka here)
                # can replay. Topic = tag, or Topic_Key lifts it from
                # a record column; Message_Key_Field sets the record
                # key; Timestamp_Key stamps CreateTime from a record
                # timestamp column.
                from ..sources.kafka_batches import (
                    pack_record_batches, write_kafka_segments)
                ko = spec.kafka_output or {}
                payload_cols = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage",
                                             "tag")]
                topic = (F.col(ko["topic_key"]).cast("string")
                         if ko.get("topic_key") else F.col("tag"))
                kcols = [F.to_json(F.struct(*[F.col(c)
                                              for c in payload_cols]))
                         .alias("__body"),
                         topic.alias("__topic"), F.col("sinks")]
                kf = ko.get("message_key_field")
                if kf:
                    kcols.append(F.col(kf).cast("string")
                                 .alias("__key"))
                ts_key = ko.get("ts_key")
                if ts_key:
                    kcols.append(F.col(ts_key).alias("__ts"))
                body_all = good.select(*kcols)
                for s in sinks:
                    sel = body_all.filter(
                        F.array_contains("sinks", s))
                    chunks = pack_record_batches(
                        sel, topic_col="__topic",
                        ts_col="__ts" if ts_key else None,
                        key_col="__key" if kf else None,
                        value_col="__body")
                    write_kafka_segments(
                        chunks, f"{output_dir}/sinks/{s}/batch_id={i}")
            elif spec.sink_format == "msgpack":
                # out_forward posture: per-task PackedForward chunk
                # files — the bytes fluent-bit's forward consumers and
                # buffer chunks carry (sources/forward.py). The tag
                # column frames each chunk; the record map is walked
                # off the frame's own schema (token arrays ride as
                # msgpack int arrays — the per-row invariant survives
                # the sink bytes, tests/test_forward.py).
                from ..sources.forward import (pack_chunks,
                                               pack_chunks_arrow,
                                               record_entries,
                                               write_forward_chunks)
                payload_cols = [c for c in good.columns
                                if c not in ("sinks", "routes_mask",
                                             "dlq_reason", "_lineage",
                                             "tag")]
                try:
                    # vectorized fast path (byte-identical; 3-6×) for
                    # string/int/int-array payloads — probe types once
                    pack_chunks_arrow(good.limit(0), "tag", payload_cols)
                    fast = True
                except ValueError:
                    fast = False
                    ent_all = record_entries(good, payload_cols)
                for s in sinks:
                    sel = good.filter(F.array_contains("sinks", s))
                    if fast:
                        chunks = pack_chunks_arrow(sel, "tag",
                                                   payload_cols)
                    else:
                        chunks = pack_chunks(
                            ent_all.filter(
                                F.array_contains("sinks", s)),
                            "tag", "entry")
                    write_forward_chunks(
                        chunks, f"{output_dir}/sinks/{s}/batch_id={i}")
            else:
                for s in sinks:
                    (good.filter(F.array_contains("sinks", s))
                         .write.mode("overwrite")
                         .partitionBy(*spec.sink_partition_by)
                         .parquet(f"{output_dir}/sinks/{s}/"
                                  f"batch_id={i}"))
            # [FILTER] log_to_metrics side outputs: the batch analogue
            # of re-emitting metric records under a new tag — each
            # slice writes the metric frame per block
            # (upstream:plugins/filter_log_to_metrics). Derived from
            # the routed GOOD frame (the filter sits after parsing),
            # optionally pre-filtered by the block's regex/exclude.
            for ms in spec.metrics_specs:
                from ..operators.aggregate import log_to_metrics
                src = good
                if ms.get("grep_rules"):
                    src = src.filter(grep_predicate(
                        ms["grep_rules"], ms.get("grep_op", "AND")))
                mdf = log_to_metrics(
                    src, ms["mode"], ms.get("labels", []),
                    value_field=ms.get("value_field"),
                    buckets=ms.get("buckets"),
                    gauge_mode=ms.get("gauge_mode", "avg"))
                mdf.write.mode("overwrite").parquet(
                    f"{output_dir}/metrics_out/{ms['name']}/"
                    f"batch_id={i}")
            dlq_cols = [c for c in ("doc_id", "tokens", "n_tok", "source",
                                    "decoded", "tag", "dlq_reason",
                                    "_lineage") if c in routed.columns]
            (routed.filter(F.col("dlq_reason").isNotNull())
                   .select(*dlq_cols)
                   .write.mode("overwrite")
                   .parquet(f"{output_dir}/dlq/batch_id={i}"))
            m = slice_metrics(routed, spec.salt_buckets) \
                .withColumn("batch_id", F.lit(i))
            m.write.mode("overwrite").parquet(
                f"{output_dir}/_metrics/b{i}")
            # derive run totals from the already-computed metrics rows —
            # no extra scan of the routed frame
            tot = (m.agg(F.sum("records").alias("r"),
                         F.sum(F.col("parse_fail") + F.col("no_route"))
                          .alias("d")).collect()[0])
            rows_in, rows_dlq = int(tot["r"] or 0), int(tot["d"] or 0)
            stats["rows_in"] += rows_in
            stats["rows_dlq"] += rows_dlq
            _commit_slice(spark, output_dir, run_id, i, {
                "files": files, "rows_in": rows_in, "rows_dlq": rows_dlq,
                "sinks": sinks, "ts": time.time()})
        finally:
            routed.unpersist()
        if fail_after_slice is not None and i >= fail_after_slice:
            raise RuntimeError(f"injected failure after slice {i}")
    stats["wall_sec"] = time.time() - t0
    return stats


def read_sink(spark: SparkSession, output_dir: str, sink: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/sinks/{sink}")


def read_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{output_dir}/_metrics"))


def read_dlq(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/dlq")
