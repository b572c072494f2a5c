"""Record-accessor compiler goldens — upstream:tests/internal/
record_accessor.c cases re-expressed over typed DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.record_accessor import (
    compile_path, compile_template,
)


@pytest.fixture(scope="module")
def rec(spark):
    df = spark.createDataFrame(
        [("app.web.apache", "2026-01-01 00:00:01", "err",
          {"level": "error", "svc": "pay"}, ["a", "b", "c"])],
        "tag string, ts string, msg string, "
        "log map<string,string>, items array<string>")
    return df


def test_plain_key(rec):
    assert rec.select(compile_path("$msg").alias("v")).head().v == "err"


def test_map_subkey(rec):
    got = rec.select(compile_path("$log['level']").alias("v")).head().v
    assert got == "error"


def test_array_index(rec):
    assert rec.select(compile_path("$items[1]").alias("v")).head().v == "b"


def test_tag_and_parts(rec):
    assert rec.select(compile_path("$TAG").alias("v")).head().v \
        == "app.web.apache"
    assert rec.select(compile_path("$TAG[1]").alias("v")).head().v == "web"


def test_time(rec):
    got = rec.select(compile_path("$TIME").alias("v")).head().v
    assert got == "2026-01-01 00:00:01"


def test_struct_nested(spark):
    df = spark.createDataFrame(
        [(("pay", ("eu",)),)],
        "kubernetes struct<svc:string, labels:struct<region:string>>")
    got = df.select(
        compile_path("$kubernetes['labels']['region']").alias("v")).head().v
    assert got == "eu"


def test_template_mixed(rec):
    """out_s3-style key template: text + accessors, missing key → ''."""
    got = rec.select(compile_template(
        "logs/$TAG[0]/$log['svc']/x=$log['nope']/$msg").alias("v")).head().v
    assert got == "logs/app/pay/x=/err"


def test_invalid_path_raises():
    with pytest.raises(ValueError):
        compile_path("no_dollar")
    with pytest.raises(ValueError):
        compile_path("$TAG['a']")
