"""BPE tokenizer (functions/bpe.py): deterministic trainer over the
bounded word table, and the two apply paths — pure-Catalyst replace
chain vs the Arrow word-cache kernel — token-for-token against the
pure-Python reference."""

from __future__ import annotations

import pytest

from fluent_bit_spark.functions.bpe import (
    END, bpe_apply_expr, bpe_encode_arrow, bpe_encode_word, train_bpe,
    word_counts,
)


def test_train_bpe_hand_example():
    # classic Sennrich-style fixture: 'low' x5, 'lower' x2, 'newest' x6,
    # 'widest' x3. (e,s) and (s,t</w>) tie at 9 occurrences; the
    # documented deterministic tie-break (lexicographically larger
    # pair) picks (s,t</w>), then (e,st</w>) at 9.
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(words, 4)
    assert merges[0] == ("s", "t" + END)
    assert merges[1] == ("e", "st" + END)
    assert len(merges) == 4
    # deterministic: same input → same merges
    assert merges == train_bpe(words, 4)


def test_encode_word_reference():
    words = [("abab", 10), ("abc", 5)]
    merges = train_bpe(words, 3)
    assert merges[0] == ("a", "b")
    # the second pair carries the end marker, so it is a DIFFERENT
    # symbol ('a','b</w>') — merge rank 1 only merges the first pair
    assert bpe_encode_word("abab", merges[:1]) == ["ab", "a", "b" + END]


def test_apply_paths_match_reference(spark):
    corpus = [
        "the cat sat on the mat",
        "the thin cat ate the fish",
        "a fat cat and a thin rat",
    ]
    wc = [(r.word, r.c) for r in word_counts(
        spark.createDataFrame([(t,) for t in corpus], "text string")
    ).collect()]
    merges = train_bpe(sorted(wc), 12)
    merges = [(a, b) for a, b in merges if a != b]   # expr-path contract

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "id long, text string")
    got_expr = {r.id: r.tokens for r in df.select(
        "id", bpe_apply_expr("text", merges).alias("tokens")).collect()}
    got_arrow = {r.id: r.tokens for r in
                 bpe_encode_arrow(df, merges).collect()}
    # python reference, token ids via the same md5-mod derivation
    import hashlib

    def ref(text):
        out = []
        for w in text.split():
            for t in bpe_encode_word(w, merges):
                out.append(int(hashlib.md5(t.encode())
                               .hexdigest()[:7], 16) % 50000)
        return out

    want = {i: ref(t) for i, t in enumerate(corpus)}
    assert got_expr == want
    assert got_arrow == want


def test_apply_expr_rejects_self_merge():
    with pytest.raises(ValueError, match="self-merge"):
        bpe_apply_expr("text", [("a", "a")])


def test_arrow_path_handles_self_merge(spark):
    # 'aaaa' = [a, a, a, a</w>]; merge (a,a) strict left-to-right pairs
    # the first two, the third 'a' cannot pair with the marked 'a</w>'
    # → [aa, a, a</w>]
    df = spark.createDataFrame([(0, "aaaa")], "id long, text string")
    out = bpe_encode_arrow(df, [("a", "a")]).collect()[0].tokens
    import hashlib

    def tid(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % 50000

    assert out == [tid("aa"), tid("a"), tid("a" + END)]


def test_word_counts_bounded_and_null_safe(spark):
    df = spark.createDataFrame(
        [("x y x",), ("  ",), (None,), ("y",)], "text string")
    got = {(r.word, r.c) for r in word_counts(df).collect()}
    assert got == {("x", 2), ("y", 2)}


def test_encode_detok_roundtrip(spark):
    """Token STRINGS of a word concatenate back to word + END — the
    boundary-preservation invariant packing/detok relies on."""
    words = [("hello", 3), ("help", 2), ("held", 1)]
    merges = train_bpe(words, 6)
    for w, _ in words:
        toks = bpe_encode_word(w, merges)
        assert "".join(toks) == w + END


def test_run_bpe_train_then_encode_cli(spark, tmp_path, monkeypatch):
    """jobs/run_bpe.py end to end in-suite: train writes a ranked merge
    table; encode applies it and the output tokens match the Catalyst
    apply path with the same merges (the two-path parity at the job
    surface)."""
    import importlib
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs"))
    run_bpe = importlib.import_module("run_bpe")

    docs_p = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "bpe")
    spark.createDataFrame(
        [("d1", "the cat sat on the mat"),
         ("d2", "the thin cat ate the fish"),
         ("d3", "a fat cat and a thin rat")],
        "doc_id string, text string").write.parquet(docs_p)

    def run(argv):
        printed = []
        monkeypatch.setattr(sys, "argv", ["run_bpe.py"] + argv)
        monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
        rc = run_bpe.main()
        return rc, _json.loads(printed[-1])

    rc, rep = run(["--mode", "train", "--input", docs_p,
                   "--output", out, "--n-merges", "10"])
    assert rc == 0 and rep["merges"] == 10
    assert rep["distinct_words"] == len(
        set("the cat sat on the mat the thin cat ate the fish "
            "a fat cat and a thin rat".split()))

    rc, rep = run(["--mode", "encode", "--input", docs_p,
                   "--merges", f"{out}/merges", "--output", out])
    assert rc == 0 and rep["under_tokenized_docs"] == 0
    got = {r.doc_id: r.tokens for r in
           spark.read.parquet(f"{out}/tokens")
           .select("doc_id", "tokens").collect()}
    merges = [(r.a, r.b) for r in
              spark.read.parquet(f"{out}/merges").orderBy("rank")
              .collect()]
    expr_ok = [(a, b) for a, b in merges if a != b]
    if expr_ok == merges:          # Catalyst path applicable → parity
        want = {r.doc_id: r.tokens for r in spark.read.parquet(docs_p)
                .select("doc_id",
                        bpe_apply_expr("text", merges).alias("tokens"))
                .collect()}
        assert got == want


def test_tokenize_verb_matches_kernel(spark):
    """TOKENIZE STREAM:docs USING STREAM:merges == bpe_encode_arrow."""
    from fluent_bit_spark.plans.sql_shim import StreamProcessor
    sp = StreamProcessor(spark)
    docs = spark.createDataFrame(
        [("d1", "aba bab"), ("d2", "abc")], "doc_id string, text string")
    merges_df = spark.createDataFrame(
        [("a", "b", 0), ("ab", "a</w>", 1)], "a string, b string, rank int")
    sp.register_stream("bdocs", docs)
    sp.register_stream("bmerges", merges_df)
    got = {r.doc_id: r.tokens for r in
           sp.sql("TOKENIZE STREAM:bdocs USING STREAM:bmerges;").collect()}
    want = {r.doc_id: r.tokens for r in bpe_encode_arrow(
        docs, [("a", "b"), ("ab", "a</w>")]).collect()}
    assert got == want and set(got) == {"d1", "d2"}

    import pytest as _pytest
    sp.register_stream("empty_m", merges_df.filter("rank < 0"))
    with _pytest.raises(ValueError, match="empty merge table"):
        sp.sql("TOKENIZE STREAM:bdocs USING STREAM:empty_m;")


def test_bpe_encode_streams_stateless(spark, tmp_path):
    """bpe_encode_arrow is a stateless mapInPandas — it runs UNCHANGED
    on a streaming frame (the tokenize step drops into the streaming
    pipeline with zero adaptation); per-batch outputs equal the batch
    encode of the union."""
    d = str(tmp_path / "landing_bpe")
    schema = "doc_id string, text string"
    rows0 = [("a", "aba bab")]
    rows1 = [("b", "abc abc")]
    spark.createDataFrame(rows0, schema).coalesce(1) \
        .write.parquet(f"{d}/f0.parquet")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.parquet(f"{d}/f1.parquet")
    merges = [("a", "b"), ("ab", "a</w>")]
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*"))
    q = (bpe_encode_arrow(stream, merges).writeStream
         .format("memory").queryName("bpe_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id: r.tokens for r in
           spark.sql("SELECT doc_id, tokens FROM bpe_stream").collect()}
    want = {r.doc_id: r.tokens for r in bpe_encode_arrow(
        spark.createDataFrame(rows0 + rows1, schema), merges).collect()}
    assert got == want and set(got) == {"a", "b"}


# ---------------------------------------------------------------------------
# property tests (pure python — no Spark per example)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.text(alphabet="abcdef", min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(_word, st.integers(1, 9), min_size=1, max_size=12),
       st.integers(0, 10))
def test_bpe_roundtrip_and_determinism_property(word_counts, n_merges):
    """For ANY corpus and merge budget: (a) training is deterministic;
    (b) every encoded word's token strings concatenate back to
    word + END (the lossless-segmentation invariant — BPE only ever
    merges adjacent symbols, it cannot drop or reorder bytes);
    (c) token count never exceeds symbol count (merges only shrink)."""
    words = sorted(word_counts.items())
    merges = train_bpe(words, n_merges)
    assert merges == train_bpe(words, n_merges)
    for w, _ in words:
        toks = bpe_encode_word(w, merges)
        assert "".join(toks) == w + END
        assert 1 <= len(toks) <= len(w)
