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
