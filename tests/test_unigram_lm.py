"""Unigram-LM tokenizer (functions/unigram_lm.py): hand-computed
Viterbi segmentations, trainer determinism + segmentability, kernel
vs reference parity."""

from __future__ import annotations

import pytest

from fluent_bit_spark.functions.unigram_lm import (
    MAX_WORD_LEN, UNK_COST, train_unigram_lm, unigram_encode_pandas,
    viterbi_word,
)


def test_viterbi_hand_computed():
    costs = {"a": 100, "b": 100, "ab": 150, "abc": 400, "c": 100}
    # "ab" (150,1) beats "a"+"b" (200,2)
    assert viterbi_word("ab", costs) == (["ab"], 150, 1)
    # "abc": piece (400,1) vs "ab"+"c" (250,2) -> cheaper cost wins
    assert viterbi_word("abc", costs) == (["ab", "c"], 250, 2)
    # equal cost, fewer pieces wins: make "abc"=200
    costs2 = {"a": 100, "b": 100, "c": 100, "ab": 100, "abc": 200}
    assert viterbi_word("abc", costs2) == (["abc"], 200, 1)
    # unknown char falls back to UNK_COST
    p, c, n = viterbi_word("ax", {"a": 100})
    assert p == ["a", "x"] and c == 100 + UNK_COST and n == 2
    # overlong word collapses to one piece
    w = "z" * (MAX_WORD_LEN + 1)
    assert viterbi_word(w, {"z": 1}) == ([w],
                                         len(w) * UNK_COST, 1)
    assert viterbi_word("", {"a": 1}) == ([], 0, 0)


def test_trainer_deterministic_and_segments_everything():
    freqs = {"hashing": 40, "hash": 30, "join": 25, "joining": 10,
             "scan": 20, "scans": 8, "filter": 15}
    v1 = train_unigram_lm(freqs, vocab_size=24, max_piece_len=4)
    v2 = train_unigram_lm(freqs, vocab_size=24, max_piece_len=4)
    assert v1 == v2 and len(v1) <= 24
    costs = dict(v1)
    chars = {ch for w in freqs for ch in w}
    assert chars <= set(p for p in costs if len(p) == 1)
    for w in freqs:
        pieces, _, _ = viterbi_word(w, costs)
        assert "".join(pieces) == w
    # frequent substrings should surface as multi-char pieces
    assert any(len(p) > 1 for p in costs)


def test_encode_kernel_matches_reference(spark):
    vocab = [("ab", 150), ("a", 100), ("b", 100), ("c", 100)]
    df = spark.createDataFrame(
        [("d0", "s", "ab c abc"), ("d1", "s", "zz a"),
         ("d2", "s", "")],
        "doc_id string, source string, text string")
    out = {r["doc_id"]: (r["cost_millinats"], r["n_pieces"])
           for r in unigram_encode_pandas(df, vocab).collect()}
    costs = dict(vocab)

    def ref(text):
        tc = tn = 0
        for w in text.split(" "):
            if w:
                _, c, n = viterbi_word(w, costs)
                tc, tn = tc + c, tn + n
        return tc, tn

    assert out["d0"] == ref("ab c abc")
    assert out["d1"] == ref("zz a")
    assert out["d2"] == (0, 0)
    # detok invariant: concatenating pieces reproduces each word
    for w in ("ab", "abc", "zz"):
        pieces, _, _ = viterbi_word(w, costs)
        assert "".join(pieces) == w


def test_run_bpe_unigram_train_encode_loop(spark, fixture_paths,
                                           tmp_path, monkeypatch):
    """jobs/run_bpe.py --algo unigram: train writes vocab/, encode
    reads it and writes a north-star tokens table with piece totals
    covering every word."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs"))
    import run_bpe

    docs = spark.createDataFrame(
        [("d%d" % i, "s", "hash join scan filter hash join")
         for i in range(30)],
        "doc_id string, source string, text string")
    inp = str(tmp_path / "docs.parquet")
    docs.write.parquet(inp)
    out = str(tmp_path / "ulm")
    printed = []
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    monkeypatch.setattr(sys, "argv", [
        "run_bpe.py", "--mode", "train", "--algo", "unigram",
        "--input", inp, "--output", out, "--vocab-size", "24"])
    assert run_bpe.main() == 0
    rep = json.loads(printed[-1])
    assert rep["algo"] == "unigram" and rep["pieces"] <= 24

    monkeypatch.setattr(sys, "argv", [
        "run_bpe.py", "--mode", "encode", "--algo", "unigram",
        "--input", inp, "--output", out, "--vocab", f"{out}/vocab"])
    assert run_bpe.main() == 0
    rep2 = json.loads(printed[-1])
    assert rep2["docs_out"] == 30 and rep2["tokens_out"] > 0
    toks = spark.read.parquet(f"{out}/tokens")
    assert {"doc_id", "source", "tokens", "n_tok",
            "n_pieces"} <= set(toks.columns)
    r0 = toks.first()
    assert r0["n_tok"] == r0["n_pieces"] == len(r0["tokens"])


def test_encode_decode_roundtrip(spark):
    """Whole-word roundtrip: decoding the piece ids of a
    space-joined-word doc reproduces its text without spaces word for
    word (encode is word-wise, decode concatenates)."""
    from fluent_bit_spark.functions.unigram_lm import unigram_decode
    vocab = [("ab", 150), ("a", 100), ("b", 100), ("c", 100)]
    df = spark.createDataFrame(
        [("d0", "s", "ab c abab"), ("d1", "s", "ccc")],
        "doc_id string, source string, text string")
    enc = unigram_encode_pandas(df, vocab)
    dec = {r["doc_id"]: (r["text_decoded"], r["n_unk_pieces"])
           for r in unigram_decode(enc, vocab).collect()}
    assert dec["d0"] == ("abcabab", 0)
    assert dec["d1"] == ("ccc", 0)
    # UNK pieces decode empty and are counted
    enc2 = unigram_encode_pandas(
        spark.createDataFrame([("d2", "s", "axb")],
                              "doc_id string, source string, "
                              "text string"), vocab)
    d2 = unigram_decode(enc2, vocab).first()
    assert d2["n_unk_pieces"] == 1 and d2["text_decoded"] == "ab"
