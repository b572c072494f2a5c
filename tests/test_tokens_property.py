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


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.text(alphabet="ab c{}x._", min_size=0, max_size=12),
              st.integers(-5, 5),
              st.one_of(st.none(),
                        st.text(alphabet="hij", max_size=4))),
    min_size=1, max_size=8))
def test_to_template_matches_python_rendering(spark, rows):
    """to_template over arbitrary records equals a pure-python
    renderer: placeholders resolve columns, nulls render empty,
    non-placeholder braces in VALUES pass through untouched."""
    from fluent_bit_spark.functions.serialize import to_template
    tpl = "a=[{a}] b#{b}|{c}!"
    df = spark.createDataFrame(rows, "a string, b int, c string")
    got = [r.value for r in to_template(df, tpl).collect()]
    want = [f"a=[{a}] b#{b}|{'' if c is None else c}!"
            for a, b, c in rows]
    assert sorted(got) == sorted(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.dictionaries(st.sampled_from(["g0", "g1", "g2"]),
                       st.integers(0, 1000), min_size=1),
       st.integers(0, 1000))
def test_stratified_split_respects_rates(spark, rates, default):
    """Observed per-group holdout fractions stay within binomial
    bounds of the configured permille; groups absent from the dict use
    the default; the 0 and 1000 edges are exact."""
    from fluent_bit_spark.operators.filters import stratified_split
    n_per = 400
    df = spark.range(0, 3 * n_per).selectExpr(
        "cast(id as string) as doc_id",
        "concat('g', id % 3) as source")
    out = stratified_split(df, "source", "doc_id", rates, default)
    frac = {r.source: r.f for r in
            out.groupBy("source")
            .agg(F.avg(F.when(F.col("split") == "holdout", 1)
                       .otherwise(0)).alias("f")).collect()}
    for g in ("g0", "g1", "g2"):
        p = rates.get(g, default) / 1000
        if p in (0.0, 1.0):
            assert frac[g] == p, (g, rates, default)
        else:  # 4-sigma binomial bound at n=400
            sigma = (p * (1 - p) / n_per) ** 0.5
            assert abs(frac[g] - p) <= 4 * sigma + 1e-9, (g, rates,
                                                          default)


# ---------------------------------------------------------------------------
# denoising-objective reconstruction properties
# ---------------------------------------------------------------------------


@st.composite
def token_docs(draw):
    n = draw(st.integers(1, 10))
    return [(f"d{i}", draw(st.lists(st.integers(0, 9999),
                                    min_size=0, max_size=60)))
            for i in range(n)]


def _splice(inp, tgt, sent_lo=50100):
    segs, cur = {}, None
    for t in tgt:
        if t >= sent_lo:
            cur = t
            segs[cur] = []
        else:
            segs[cur].append(t)
    out = []
    for t in inp:
        out.extend(segs.get(t, [t]) if t >= sent_lo else [t])
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=token_docs(), seed=st.integers(0, 3),
       rate=st.integers(0, 1000))
def test_fim_reconstruction_property(spark, docs, seed, rate):
    """For ANY corpus/seed/rate: un-rotating a FIM row reproduces the
    original array exactly, and untransformed rows pass through."""
    from fluent_bit_spark.operators.tokens import fim_transform
    df = spark.createDataFrame(
        [(d, "s", t, len(t)) for d, t in docs],
        "doc_id string, source string, tokens array<int>, n_tok int")
    orig = dict(docs)
    for r in fim_transform(df, rate_permille=rate, seed=seed).collect():
        want, toks = orig[r["doc_id"]], r["tokens"]
        if r["fim_mode"] == "none":
            assert toks == want
            continue
        lo, hi = r["split_lo"], r["split_hi"]
        n_suf = len(want) - hi
        if r["fim_mode"] == "psm":
            prefix = toks[1:1 + lo]
            suffix = toks[2 + lo:2 + lo + n_suf]
            middle = toks[3 + lo + n_suf:]
        else:
            suffix = toks[2:2 + n_suf]
            prefix = toks[3 + n_suf:3 + n_suf + lo]
            middle = toks[3 + n_suf + lo:]
        assert prefix + middle + suffix == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=token_docs(), seed=st.integers(0, 3),
       grid=st.integers(6, 25))
def test_span_corrupt_reconstruction_property(spark, docs, seed, grid):
    """For ANY corpus/seed/grid: splicing targets over sentinels in
    inputs reproduces the original array exactly, sentinels number
    consecutively, and the final sentinel closes targets."""
    from fluent_bit_spark.operators.tokens import span_corrupt
    df = spark.createDataFrame(
        [(d, "s", t, len(t)) for d, t in docs],
        "doc_id string, source string, tokens array<int>, n_tok int")
    orig = dict(docs)
    out = span_corrupt(df, grid=grid, span_min=2,
                       span_max=min(5, grid), seed=seed).collect()
    for r in out:
        assert r["targets"][-1] == 50100 + r["n_spans"]
        assert _splice(r["inputs"], r["targets"][:-1]) \
            == orig[r["doc_id"]]
