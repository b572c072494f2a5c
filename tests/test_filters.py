"""filter_grep / filter_modify / record_modifier / nest / type_converter /
throttle / sampling goldens (upstream:tests/runtime/filter_*.c semantics)."""

from __future__ import annotations

import datetime as dt

from fluent_bit_spark.operators.filters import (
    GrepRule, deterministic_sample, grep, sample_head, type_convert,
)
from fluent_bit_spark.operators.modify import (
    Condition, ModifyRule, ModifySpec, apply_modify,
)
from fluent_bit_spark.operators.nest import lift, nest
from fluent_bit_spark.operators.throttle import throttle


def _logs(spark):
    return spark.createDataFrame(
        [("error", "web", "500"), ("info", "web", "200"),
         ("error", "db", "503"), ("debug", None, "200")],
        ["level", "svc", "code"])


def test_grep_regex_keep(spark):
    out = grep(_logs(spark), [GrepRule("level", "^err")]).collect()
    assert sorted(r.svc for r in out) == ["db", "web"]


def test_grep_exclude(spark):
    out = grep(_logs(spark), [GrepRule("level", "err", exclude=True)])
    assert out.count() == 2


def test_grep_and_or(spark):
    rules = [GrepRule("level", "^error$"), GrepRule("code", "^503$")]
    assert grep(_logs(spark), rules, "AND").count() == 1
    assert grep(_logs(spark), rules, "OR").count() == 2


def test_grep_null_key_never_matches(spark):
    # svc null row must not match Regex and must survive Exclude
    assert grep(_logs(spark), [GrepRule("svc", ".*")]).count() == 3
    assert grep(_logs(spark), [GrepRule("svc", "web", exclude=True)]) \
        .count() == 2


def test_modify_set_add_rename_copy(spark):
    df = spark.createDataFrame([("a", "1")], ["k1", "k2"])
    spec = ModifySpec(rules=[
        ModifyRule("set", "k1", "B"),
        ModifyRule("add", "k2", "ignored"),     # exists → no-op
        ModifyRule("add", "k3", "new"),
        ModifyRule("rename", "k2", "k2r"),
        ModifyRule("copy", "k3", "k3c"),
        ModifyRule("hard_rename", "k3c", "k1"),  # overwrites k1
    ])
    row = apply_modify(df, spec).collect()[0]
    assert row.asDict() == {"k2r": "1", "k3": "new", "k1": "new"}


def test_modify_remove_wildcard_regex(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["aa_x", "aa_y", "b", "c1"])
    out = apply_modify(df, ModifySpec(rules=[
        ModifyRule("remove_wildcard", "aa_"),
        ModifyRule("remove_regex", r"^c\d$")]))
    assert out.columns == ["b"]


def test_modify_conditions_gate_value_rules(spark):
    df = spark.createDataFrame([("error", "x"), ("info", "y")],
                               ["level", "v"])
    spec = ModifySpec(
        conditions=[Condition("key_value_equals", "level", "error")],
        rules=[ModifyRule("set", "v", "ALERT")])
    got = {r.level: r.v for r in apply_modify(df, spec).collect()}
    assert got == {"error": "ALERT", "info": "y"}


def test_modify_key_value_matches_condition(spark):
    df = spark.createDataFrame([("err123",), ("ok",)], ["s"])
    spec = ModifySpec(conditions=[Condition("key_value_matches", "s",
                                            r"^err\d+$")],
                      rules=[ModifyRule("set", "flag", "1")])
    got = {r.s: r.flag for r in apply_modify(df, spec).collect()}
    assert got == {"err123": "1", "ok": None}


def test_nest_and_lift_roundtrip(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["m_a", "m_b", "other"])
    nested = nest(df, "m_*", "meta", remove_prefix="m_")
    assert set(nested.columns) == {"other", "meta"}
    row = nested.collect()[0]
    assert row.meta.a == 1 and row.meta.b == 2
    flat = lift(nested, "meta", add_prefix="m_")
    assert set(flat.columns) == {"other", "m_a", "m_b"}
    assert flat.collect()[0].m_a == 1


def test_type_converter(spark):
    df = spark.createDataFrame([("42", "3.5", "oops")], ["a", "b", "c"])
    row = type_convert(df, [("a", "a_int", "int"),
                            ("b", "b_f", "float"),
                            ("c", "c_int", "int")]).collect()[0]
    assert row.a_int == 42 and row.b_f == 3.5 and row.c_int is None


def test_throttle_rate_limit(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("a", base + dt.timedelta(seconds=i), i) for i in range(10)] + \
           [("b", base + dt.timedelta(seconds=i), i) for i in range(3)]
    df = spark.createDataFrame(rows, ["key", "ts", "i"])
    out = throttle(df, rate=5, keys=["key"], ts_col="ts",
                   interval="1 minute", tiebreak=["i"])
    got = {r[0]: r[1] for r in
           out.groupBy("key").count().collect()}
    assert got == {"a": 5, "b": 3}
    # deterministic: keeps the FIRST 5 by ts
    kept = sorted(r.i for r in out.filter("key='a'").collect())
    assert kept == [0, 1, 2, 3, 4]


def test_sampling(spark):
    from pyspark.sql import functions as F
    df = spark.range(1000).withColumn("k", F.col("id").cast("string"))
    assert sample_head(df, 10).count() == 10
    s = deterministic_sample(df, "k", 10)
    n1, n2 = s.count(), s.count()
    assert n1 == n2  # deterministic
    assert 50 < n1 < 200  # ~1/10


def test_expect_exit_and_warn(spark):
    import pytest
    from pyspark.sql import functions as F
    from fluent_bit_spark.operators.filters import expect

    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    # holding invariant: no-op, rows flow through
    assert expect(df, F.col("v") > 0).count() == 3
    # violated + exit: the job aborts at execution time
    with pytest.raises(Exception, match="expect failed"):
        expect(df, F.col("v") > 1).collect()
    # warn mode stamps the flag instead
    got = {r.v: r._expect_ok
           for r in expect(df, F.col("v") > 1, action="warn").collect()}
    assert got == {1: False, 2: True, 3: True}


def test_modify_condition_full_matrix(spark):
    """All 10 upstream filter_modify conditions
    (upstream:plugins/filter_modify/modify.c condition table)."""
    from pyspark.sql import functions as F
    from fluent_bit_spark.operators.modify import (
        Condition, condition_predicate)

    df = spark.createDataFrame(
        [("error", 500, "web", None)],
        "level string, code int, svc string, extra string")

    def holds(c):
        return bool(df.select(
            F.coalesce(condition_predicate(df, c), F.lit(False))
            .alias("p")).head().p)

    assert holds(Condition("key_exists", "level"))
    assert not holds(Condition("key_exists", "extra"))       # null value
    assert not holds(Condition("key_exists", "missing"))
    assert holds(Condition("key_does_not_exist", "missing"))
    assert holds(Condition("key_does_not_exist", "extra"))
    assert holds(Condition("key_value_equals", "level", "error"))
    assert not holds(Condition("key_value_equals", "level", "info"))
    assert holds(Condition("key_value_does_not_equal", "level", "info"))
    assert holds(Condition("key_value_matches", "level", "^err"))
    assert not holds(Condition("key_value_matches", "missing", "x"))
    assert holds(Condition("key_value_does_not_match", "level", "^info"))
    assert holds(Condition("a_key_matches", "^(level|nothing)$"))
    assert not holds(Condition("no_key_matches", "^level$"))
    assert holds(Condition("no_key_matches", "^nothing$"))
    # all keys matching ^(level|svc)$ have string values → values rlike \w
    assert holds(Condition("matching_keys_have_matching_values",
                           "^(level|svc)$", r"^\w+$"))
    assert not holds(Condition("matching_keys_have_matching_values",
                               "^(level|svc)$", r"^\d+$"))
    assert holds(Condition("matching_keys_do_not_have_matching_values",
                           "^(level|svc)$", r"^\d+$"))
    # vacuous truth when no key matches
    assert holds(Condition("matching_keys_have_matching_values",
                           "^nothing$", "x"))
