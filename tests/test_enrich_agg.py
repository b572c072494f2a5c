"""Enrichment joins + aggregation operators (SURVEY.md §2.4, §2.6)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.aggregate import (
    hopping, log_counter, log_histogram, salted_sink_aggregates,
    sp_aggregate, timeseries_forecast, tumbling,
)
from fluent_bit_spark.operators.enrich import (
    checklist_flag, checklist_keep, lookup_join,
)


def test_lookup_join_hit_and_miss(spark, fixture_paths):
    dim = spark.read.parquet(fixture_paths["lookup"])
    fact = spark.createDataFrame(
        [("a", "src0"), ("b", "src18")], ["doc_id", "source"])
    got = {r.doc_id: r for r in
           lookup_join(fact, dim, "source").collect()}
    assert got["a"].team is not None and got["a"].env is not None
    assert got["b"].team is None  # src18 absent → miss → null, row kept


def test_lookup_join_is_broadcast(spark, fixture_paths):
    dim = spark.read.parquet(fixture_paths["lookup"])
    fact = spark.createDataFrame([("a", "src0")], ["doc_id", "source"])
    plan = lookup_join(fact, dim, "source") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lookup_ignore_case(spark):
    dim = spark.createDataFrame([("SRC0", "t1")], ["source", "team"])
    fact = spark.createDataFrame([("src0",)], ["source"])
    assert lookup_join(fact, dim, "source",
                       ignore_case=True).collect()[0].team == "t1"


def test_checklist(spark):
    vals = spark.createDataFrame([("bad1",), ("bad2",)], ["ip"])
    fact = spark.createDataFrame([("bad1",), ("ok",)], ["ip"])
    got = {r.ip: r.matched for r in
           checklist_flag(fact, vals, "ip").collect()}
    assert got == {"bad1": True, "ok": False}
    assert checklist_keep(fact, vals, "ip").count() == 1


def test_salted_agg_equals_plain(spark, tokens_df):
    df = tokens_df.withColumn("tag", F.concat(F.lit("app."), "source"))
    plain = {r.tag: (r.c, r.s, r.d) for r in
             df.groupBy("tag").agg(
                 F.count("*").alias("c"), F.sum("n_tok").alias("s"),
                 F.count_distinct("source").alias("d")).collect()}
    for buckets in (1, 7, 32):
        salted = {r.tag: (r.records, r.sum_n_tok, r.distinct_sources)
                  for r in salted_sink_aggregates(
                      df, ["tag"], salt_buckets=buckets).collect()}
        assert salted == plain, buckets


def test_salted_agg_approx_mode(spark, tokens_df):
    df = tokens_df.withColumn("tag", F.lit("t"))
    row = salted_sink_aggregates(df, ["tag"],
                                 approx_distinct=True).collect()[0]
    assert row.records == tokens_df.count()
    assert 15 <= row.distinct_sources <= 25  # HLL approx of 20


def test_sp_aggregate_surface(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["k", "v"])
    row = {r.k: r for r in sp_aggregate(
        df, ["k"], {"n": ("count", "*"), "avg_v": ("avg", "v"),
                    "mx": ("max", "v"), "mn": ("min", "v"),
                    "sm": ("sum", "v")}).collect()}
    assert row["a"].n == 2 and row["a"].avg_v == 2.0 \
        and row["a"].mx == 3.0 and row["a"].sm == 4.0
    assert row["b"].mn == 10.0


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=m), "a", float(m))
            for m in range(0, 120, 10)]
    return spark.createDataFrame(rows, ["ts", "k", "v"])


def test_tumbling_window(spark):
    out = tumbling(_events(spark), "ts", "1 hour", ["k"]) \
        .agg(F.count("*").alias("n")).collect()
    got = {r.win.start: r.n for r in out}
    assert got == {dt.datetime(2024, 1, 1, 0): 6,
                   dt.datetime(2024, 1, 1, 1): 6}


def test_hopping_window(spark):
    out = hopping(_events(spark), "ts", "2 hours", "1 hour", ["k"]) \
        .agg(F.count("*").alias("n")).collect()
    got = {r.win.start: r.n for r in out}
    # windows [-1,1), [0,2), [1,3) containing events
    assert got[dt.datetime(2024, 1, 1, 0)] == 12
    assert got[dt.datetime(2023, 12, 31, 23)] == 6
    assert got[dt.datetime(2024, 1, 1, 1)] == 6


def test_timeseries_forecast_linear(spark):
    """y = 2x + 5 exactly → forecast is exact (matches upstream's
    least-squares TIMESERIES_FORECAST on clean data)."""
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(seconds=s), "a", 2.0 * s + 5.0)
            for s in range(0, 100, 10)]
    df = spark.createDataFrame(rows, ["ts", "k", "v"])
    row = timeseries_forecast(df, ["k"], "ts", "v", 60).collect()[0]
    # value at t = 90 + 60 = 150s → 2*150+5 relative to epoch offset
    x0 = base.replace(tzinfo=dt.timezone.utc).timestamp()
    expected = 2.0 * (x0 + 150) + (5.0 - 2.0 * x0)
    assert abs(row.forecast - expected) < 1e-3
    assert abs(row.slope - 2.0) < 1e-9


def test_log_counter_and_histogram(spark):
    df = spark.createDataFrame(
        [("a", 0.5), ("a", 5.0), ("a", 99.0), ("a", -3.0), ("a", 1000.0)],
        ["k", "v"])
    assert log_counter(df, ["k"]).collect()[0].value == 5
    got = {r.bucket: r.n for r in
           log_histogram(df, ["k"], "v", 0.0, 100.0, 10).collect()}
    assert got == {0: 2, 9: 1, -1: 1, 10: 1}  # under/overflow buckets


def test_salted_join_rejects_dim_duplicating_how(spark):
    """right/full outer would emit each unmatched dim row salt_buckets
    times (the dim side is replicated per bucket) — must raise."""
    import pytest as _pytest
    from fluent_bit_spark.operators.enrich import salted_join
    fact = spark.createDataFrame([("a", 1)], "k string, v int")
    dim = spark.createDataFrame([("a", 10), ("b", 20)], "k string, w int")
    for bad in ("right", "full", "outer", "full_outer", "right_outer"):
        with _pytest.raises(ValueError):
            salted_join(fact, dim, "k", how=bad)
    # left outer is fact-preserving and allowed
    assert salted_join(fact, dim, "k", how="left").count() == 1
