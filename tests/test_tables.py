"""TableIO format selection + the Iceberg branch's wiring
(sources/tables.py). The sandbox ships no Iceberg runtime jar (SURVEY
§1.2) — the resolve() fallback is the contract under test here; the
real-Iceberg round-trip runs wherever the runtime is on the classpath
(see the skipif marker for the production conf)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.sources.tables import (
    TableIO, iceberg_available, read_tokens,
)


def test_resolve_degrades_to_parquet_without_runtime(spark):
    io = TableIO.resolve(spark, prefer="iceberg")
    if iceberg_available(spark):           # cluster with the jar
        assert io.fmt == "iceberg"
    else:                                  # sandbox contract
        assert io.fmt == "parquet"


def test_parquet_roundtrip_through_tableio(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", [1, 2], 2, "s1"), ("d2", [3], 1, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    path = str(tmp_path / "tok")
    TableIO.resolve(spark).write(df, path, partition_by=["source"])
    back = read_tokens(spark, path)
    assert back.count() == 2
    assert {r.doc_id for r in back.collect()} == {"d1", "d2"}


@pytest.mark.integration
def test_iceberg_roundtrip_when_runtime_present(spark):
    """Runs only where the Iceberg runtime is on the classpath. Enable
    with spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-
    4.0_2.13:<ver> plus spark.sql.catalog.lake=org.apache.iceberg.spark
    .SparkCatalog and a catalog type (glue|hive|hadoop); TableIO.resolve
    then picks iceberg and this round-trips saveAsTable/load."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar absent (sandbox, SURVEY §1.2)")
    io = TableIO.resolve(spark, prefer="iceberg")
    assert io.fmt == "iceberg"
    df = spark.createDataFrame([("d1", [1], 1, "s1")],
                               "doc_id string, tokens array<int>, "
                               "n_tok int, source string")
    io.write(df, "lake.db.tokens_test", partition_by=["source"])
    assert io.read(spark, "lake.db.tokens_test").count() == 1


def test_compact_dir_shrinks_files_keeps_rows(spark, tmp_path):
    from fluent_bit_spark.sources.tables import compact_dir
    path = str(tmp_path / "many")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 5).alias("k")) \
        .repartition(32).write.parquet(path)
    stats = compact_dir(spark, path, target_mb=256)
    assert stats["files_before"] == 32
    assert stats["files_after"] <= 2
    back = spark.read.parquet(path)
    assert back.count() == 10_000 and stats["rows"] == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_overwrite_partitions_parquet_replaces_only_present(spark, tmp_path):
    io = TableIO()
    path = str(tmp_path / "part")
    base = spark.createDataFrame(
        [("d1", "s1"), ("d2", "s1"), ("d3", "s2")],
        "doc_id string, source string")
    io.write(base, path, partition_by=["source"])
    io.overwrite_partitions(
        spark.createDataFrame([("dX", "s2")], "doc_id string, source string"),
        path, partition_by=["source"])
    got = {(r.doc_id, r.source) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", "s1"), ("d2", "s1"), ("dX", "s2")}


def test_upsert_parquet_updates_and_inserts(spark, tmp_path):
    io = TableIO()
    path = str(tmp_path / "ups")
    io.write(spark.createDataFrame(
        [("d1", 3), ("d2", 5)], "doc_id string, n_tok int"), path)
    io.upsert(spark.createDataFrame(
        [("d2", 99), ("d4", 1)], "doc_id string, n_tok int"), path, "doc_id")
    got = {r.doc_id: r.n_tok for r in spark.read.parquet(path).collect()}
    assert got == {"d1": 3, "d2": 99, "d4": 1}
