"""Detokenization round-trip + token-equality invariant
(BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark import fixtures as fx
from fluent_bit_spark.functions.detok import tokens_fingerprint, with_decoded
from fluent_bit_spark.functions.parsers import with_parsed


def test_detok_matches_independent_decode(spark, tokens_df, fixture_paths):
    from tests.oracle_pandas import decode_row
    v = fx.vocab()
    sample = tokens_df.limit(200)
    got = {r.doc_id: r.decoded
           for r in with_decoded(sample, spark, v).collect()}
    for r in sample.collect():
        assert got[r.doc_id] == decode_row(r.tokens, v)


def test_tokens_invariant_through_pipeline(spark, tokens_df):
    """tokens must be byte-identical after decode+parse (transforms only
    add columns)."""
    v = fx.vocab()
    before = tokens_df.select("doc_id",
                              tokens_fingerprint().alias("h_before"))
    after = with_parsed(with_decoded(tokens_df, spark, v)) \
        .select("doc_id", tokens_fingerprint().alias("h_after"))
    diff = (before.join(after, "doc_id")
            .filter(F.col("h_before") != F.col("h_after")).count())
    assert diff == 0
    # and the arrays themselves, not just hashes, on a sample
    rows = with_parsed(with_decoded(tokens_df.limit(50), spark, v)) \
        .select("tokens", "n_tok").collect()
    for r in rows:
        assert len(r.tokens) == r.n_tok
