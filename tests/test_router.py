"""Router semantics (upstream:src/flb_router.c flb_router_match wildcard
cases + plugins/filter_rewrite_tag splice cases, re-expressed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.router import (
    RewriteTagRule, Route, apply_rewrite_tag, glob_to_like, match_predicate,
    routes_mask, with_routes,
)

# (tag, pattern, expected) — ports the upstream wildcard-match semantics
ROUTER_CASES = [
    ("app.src0", "app.src0", True),        # exact
    ("app.src0", "app.src1", False),
    ("app.src1.err", "app.src1*", True),   # prefix glob
    ("app.src10", "app.src1*", True),      # prefix glob matches deeper
    ("app.src0", "app.src1*", False),
    ("x.parsed", "*.parsed", True),        # suffix glob
    ("x.y.parsed", "*.parsed", True),
    ("x.parsed.y", "*.parsed", False),
    ("app.web.err", "app.*.err", True),    # middle glob
    ("app.a.b.err", "app.*.err", True),    # '*' crosses '.' boundaries
    ("app.err", "app.*.err", False),       # but needs the literal dots
    ("anything.at.all", "*", True),        # match-all
    ("", "*", True),
    ("App.src0", "app.src0", False),       # case-sensitive
    ("a_b", "a_b", True),                  # '_' is literal, not LIKE wildcard
    ("axb", "a_b", False),
    ("a%b", "a%b", True),                  # '%' is literal too
]


@pytest.mark.parametrize("tag,pattern,expected", ROUTER_CASES)
def test_router_match(spark, tag, pattern, expected):
    df = spark.createDataFrame([(tag,)], ["tag"])
    got = df.select(
        match_predicate("tag", Route("s", pattern)).alias("m")
    ).collect()[0].m
    assert got == expected, (tag, pattern)


def test_match_regex_route(spark):
    df = spark.createDataFrame([("app.src7.json",), ("db.x",)], ["tag"])
    r = Route("s", r"^app\.src\d+\.json$", "regex")
    got = {x.tag: x.m for x in
           df.select("tag", match_predicate("tag", r).alias("m")).collect()}
    assert got == {"app.src7.json": True, "db.x": False}


def test_glob_to_like_escapes():
    assert glob_to_like("a*b") == "a%b"
    assert glob_to_like("a_b%c") == r"a\_b\%c"


def test_routes_mask_multi_sink_and_order(spark):
    routes = [Route("all", "*"), Route("web", "app.*.apache"),
              Route("web", "web.*"),  # second rule, same sink → dedupe
              Route("err", "err.*")]
    df = spark.createDataFrame(
        [("app.x.apache",), ("err.y",), ("web.z",)], ["tag"])
    got = {r.tag: r.sinks for r in with_routes(df, routes).collect()}
    assert got["app.x.apache"] == ["all", "web"]
    assert got["err.y"] == ["all", "err"]
    assert got["web.z"] == ["all", "web"]


def test_routes_mask_empty_means_dlq(spark):
    df = spark.createDataFrame([("nomatch",)], ["tag"])
    got = df.select(routes_mask(
        "tag", [Route("a", "app.*")]).alias("s")).collect()[0].s
    assert got == []


def test_rewrite_tag_replace_and_splice(spark):
    """NEW_TAG splices: $TAG, $TAG[n], $key, regex capture $1."""
    df = spark.createDataFrame(
        [("app.web.x", "error", "usr7"), ("app.db.y", "info", "usr9")],
        ["tag", "level", "user"])
    rules = [RewriteTagRule("level", "^(err)or$",
                            "alerts.$TAG[1].$1.$user", keep=False)]
    got = {r.user: r.tag for r in apply_rewrite_tag(df, rules).collect()}
    assert got["usr7"] == "alerts.web.err.usr7"
    assert got["usr9"] == "app.db.y"  # untouched


def test_rewrite_tag_keep_true_emits_copy(spark):
    df = spark.createDataFrame([("t.a", "error"), ("t.b", "ok")],
                               ["tag", "level"])
    rules = [RewriteTagRule("level", "^error$", "err.$TAG", keep=True)]
    tags = sorted(r.tag for r in apply_rewrite_tag(df, rules).collect())
    assert tags == ["err.t.a", "t.a", "t.b"]


def test_rewrite_tag_first_rule_wins(spark):
    df = spark.createDataFrame([("t", "error")], ["tag", "level"])
    rules = [RewriteTagRule("level", "err", "first.$TAG"),
             RewriteTagRule("level", "error", "second.$TAG")]
    assert apply_rewrite_tag(df, rules).collect()[0].tag == "first.t"
