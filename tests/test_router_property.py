"""Property tests (SURVEY.md §5.2 item 4) — hypothesis-driven checks
of the router glob compiler against an independent reference
implementation (fnmatch-style '*' semantics, matching
upstream:src/flb_router.c flb_router_match: '*' = any run of chars,
any position, multiple allowed, case-sensitive, no other metachars)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from fluent_bit_spark.operators.router import Route, glob_to_like

TAG_CHARS = "abc._%\\*Z0"


def ref_match(tag: str, pattern: str) -> bool:
    """Independent oracle: compile the fb glob to an anchored regex."""
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pattern)
    return re.fullmatch(rx, tag) is not None


@st.composite
def tags_and_patterns(draw):
    tag = draw(st.text(TAG_CHARS, min_size=0, max_size=12))
    pattern = draw(st.text(TAG_CHARS, min_size=0, max_size=8))
    return tag, pattern


@pytest.fixture(scope="module")
def matcher(spark):
    """One reusable single-row evaluator to keep hypothesis fast: the
    predicate is evaluated via Spark SQL expression on a literal."""
    from fluent_bit_spark.operators.router import match_predicate
    from pyspark.sql import functions as F

    def check(tag: str, pattern: str) -> bool:
        df = spark.range(1).select(F.lit(tag).alias("tag"))
        got = df.select(
            match_predicate("tag", Route("s", pattern)).alias("m")
        ).head().m
        return bool(got)

    return check


@settings(max_examples=60, deadline=None)
@given(tp=tags_and_patterns())
def test_glob_matches_reference(matcher, tp):
    tag, pattern = tp
    assert matcher(tag, pattern) == ref_match(tag, pattern), (tag, pattern)


def test_like_escaping_unit():
    assert glob_to_like("a.%b") == "a.\\%b"
    assert glob_to_like("a_b*") == "a\\_b%"
    assert glob_to_like("a\\b") == "a\\\\b"
