"""Property tests (SURVEY.md §5.2 item 4) for the token-sequence ops:
hypothesis-generated corpora checked against independent pure-Python
reference implementations (concat-and-chunk for packing; global line
counting + in-order reassembly for line dedup)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_spark.operators.tokens import line_dedup, pack_sequences

CTX = 7


def ref_pack(rows):
    """Pure-python concat-and-chunk with doc_starts (oldest chunk
    first), per source in id order — the independent oracle."""
    by_src: dict[str, list[tuple[int, list[int]]]] = {}
    for i, (src, toks) in enumerate(rows):
        if toks:
            by_src.setdefault(src, []).append((i, toks))
    out = {}
    for src, docs in by_src.items():
        stream: list[int] = []
        starts: list[int] = []
        for _, toks in sorted(docs):
            starts.append(len(stream))
            stream.extend(toks)
        for c in range(0, (len(stream) + CTX - 1) // CTX):
            lo, hi = c * CTX, min(len(stream), (c + 1) * CTX)
            out[(src, c)] = (stream[lo:hi],
                             [s - lo for s in starts if lo <= s < hi])
    return out


@st.composite
def corpora(draw):
    n = draw(st.integers(1, 14))
    return [
        (draw(st.sampled_from(["a", "b"])),
         draw(st.lists(st.integers(0, 9), min_size=0, max_size=17)))
        for _ in range(n)
    ]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_pack_matches_python_reference(spark, corpus):
    df = (spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(corpus)],
        "doc_id long, source string, tokens array<int>")
        .withColumn("n_tok", F.size("tokens")))
    got = {(r["source"], r["chunk_id"]):
           (list(r["tokens"]), list(r["doc_starts"]))
           for r in pack_sequences(df, ctx_len=CTX,
                                   group_size=3).collect()}
    assert got == ref_pack(corpus)


def ref_line_dedup(texts, line_words=2, max_occ=1):
    def lines(t):
        w = t.split(" ")
        return [" ".join(w[i:i + line_words])
                for i in range(0, len(w), line_words)]
    counts = Counter(ln for t in texts for ln in lines(t))
    out = []
    for t in texts:
        kept = [ln for ln in lines(t) if counts[ln] <= max_occ]
        dropped = len(lines(t)) - len(kept)
        out.append((" ".join(kept), len(kept), dropped))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from("xyqz"), min_size=1,
                         max_size=9).map(" ".join),
                min_size=1, max_size=10))
def test_line_dedup_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
           for r in line_dedup(df, line_words=2, max_occ=1).collect()}
    want = {i: ref for i, ref in enumerate(ref_line_dedup(texts))}
    assert got == want
