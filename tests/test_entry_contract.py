"""Driver-contract invariants for __spark_entry__.

The driver value-checks the FIRST 50 entries of ``queries()`` in dict
order (CORRECTNESS_r{N}.json).  Round 3 shipped 19 queries that never
entered that window; these tests freeze the round-4 fix so a future
registration can't silently starve the check again.
"""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry = importlib.import_module("__spark_entry__")

# Entries that had never produced a driver-file green row before round 4.
NEVER_DRIVER_CHECKED_BEFORE_R4 = {
    "pack_sequences", "corpus_clean_pack", "line_dedup_c4",
    "decontaminate_ngrams", "mixture_sample_budget", "repetition_stats",
    "snapshot_flush", "parse_syslog", "serialize_gelf",
    "multimodal_png_roundtrip", "ann_recall_at_k",
    "dedup_minhash_portable", "dedup_simhash_portable",
    "dedup_lsh_verified", "dedup_resolve_groups",
    "dedup_tokens_exact", "dedup_tokens_minhash",
    "deterministic_sample", "record_accessor_template",
}

# Round-4 additions: also never driver-checked (r4's CORRECTNESS file is
# produced at round end from the window below).
NEVER_DRIVER_CHECKED_BEFORE_R4 |= {
    "multimodal_jpeg_roundtrip", "multimodal_wav_features",
    "multimodal_video_frames", "redact_pii", "ann_pq", "parse_otlp_logs",
    "unigram_surprisal", "stratified_split", "gopher_quality",
    "tfidf_topk", "serialize_template", "corpus_quality_pack",
    "script_filter_map", "second_stage_parse", "time_parse_strptime",
    "expect_stamp", "checklist_flag_record", "log_latency_quantiles",
    "forward_roundtrip", "substring_dedup",
    "kmeans_embeddings", "semdedup_drop",
    "grok_parse", "nb_quality", "dedup_vs_corpus", "normalize_nfc",
    "url_host_cap", "html_text", "bigram_surprisal", "bpe_encode",
}


def test_priority_entries_inside_driver_window():
    names = list(entry.queries())
    window = set(names[:50])
    missing = NEVER_DRIVER_CHECKED_BEFORE_R4 - window
    assert not missing, f"outside the driver's first-50 window: {missing}"


def test_every_query_has_matching_oracle_keyset():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o)
    # dict order must match too: the driver zips positionally in places.
    assert list(q) == list(o)


def test_driver_check_first_names_all_exist():
    q = entry.queries()
    unknown = [n for n in entry._DRIVER_CHECK_FIRST if n not in q]
    assert not unknown, f"_DRIVER_CHECK_FIRST names not registered: {unknown}"
    assert len(entry._DRIVER_CHECK_FIRST) == len(set(entry._DRIVER_CHECK_FIRST))


def test_new_registrations_must_be_placed_deliberately():
    # If a future round adds queries, they land AFTER the explicit window
    # unless added to _DRIVER_CHECK_FIRST — this assertion forces the
    # author to look at the window when the registry grows.
    q = entry.queries()
    tail = set(list(q)[50:])
    assert not (tail & NEVER_DRIVER_CHECKED_BEFORE_R4)
