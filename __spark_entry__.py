"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``fluent_bit_spark.queries``; see SURVEY.md §2
for the operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: parse→tag→route→per-sink
    aggregates (records, char sums, distinct sources)."""
    from fluent_bit_spark.queries import route_agg
    return route_agg(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order.  Registration order in fluent_bit_spark.queries follows
# module structure, which (round 3) silently left the newest 19 entries
# outside the window.  This explicit order puts never-driver-checked
# entries first, then the thinnest-history veterans; the tail holds
# long-green trivial filters that have passed in every round since r1.
# tools/check_oracles.py still value-checks ALL entries at three SFs.
_DRIVER_CHECK_FIRST = [
    # -- never driver-checked before round 4 (the r3 token suite etc.) --
    "pack_sequences", "corpus_clean_pack", "line_dedup_c4",
    "decontaminate_ngrams", "mixture_sample_budget", "repetition_stats",
    "snapshot_flush", "parse_syslog", "serialize_gelf",
    "multimodal_png_roundtrip", "multimodal_jpeg_roundtrip",
    # -- new in round 4: real audio/video codecs --
    "multimodal_wav_features", "multimodal_video_frames", "redact_pii",
    "ann_recall_at_k",
    "dedup_minhash_portable", "dedup_simhash_portable",
    "dedup_lsh_verified", "dedup_resolve_groups",
    "dedup_tokens_exact", "dedup_tokens_minhash",
    "deterministic_sample", "record_accessor_template",
    "ann_pq", "parse_otlp_logs",
    # -- new in round 4 (late): quality suite, codecs, forward protocol --
    "unigram_surprisal", "stratified_split", "gopher_quality",
    "tfidf_topk", "serialize_template", "corpus_quality_pack",
    "script_filter_map", "second_stage_parse", "time_parse_strptime",
    "expect_stamp", "checklist_flag_record", "log_latency_quantiles",
    "forward_roundtrip", "substring_dedup",
    "kmeans_embeddings", "semdedup_drop",
    # -- new in round 4 (final): grok, web curation, incremental dedup --
    "grok_parse", "nb_quality", "dedup_vs_corpus", "normalize_nfc",
    "url_host_cap", "html_text", "bigram_surprisal", "bpe_encode",
    # -- veterans with the thinnest driver history (first green r2/r3) --
    "ann_lsh_multiprobe",
    # (all multi-round-green veterans — route_agg, agg_pushdown_q1,
    #  parse_json_props, embedding_neardup, the ANN quartet, text
    #  functions, multiline_join, asof_enrich, sp_sql_stream_agg,
    #  decoder_json_chain, geoip_range_lookup, serialize_prometheus,
    #  skew_salted_join, multimodal_resize, multiline_cri —
    #  moved past the window to make room for the 47 never-driver-
    #  checked entries; each has 2-3 rounds of driver greens on record,
    #  stays covered by tools/check_oracles.py, and route_agg is
    #  additionally exercised every round through entry()'s flagship.)
]


def _ordered(mapping):
    out = {n: mapping[n] for n in _DRIVER_CHECK_FIRST if n in mapping}
    out.update((n, v) for n, v in mapping.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fluent_bit_spark.queries import QUERIES
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fluent_bit_spark.queries import ORACLE_SQL
    return _ordered(ORACLE_SQL)
