"""filter_lua-analogue tests (operators/script.py): batch-vectorized
modify / drop / split, mirroring upstream:tests/runtime/filter_lua.c
scenarios (callback-captured outputs → DataFrame asserts)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.operators.script import filter_map_batches, \
    split_records


def test_filter_map_modify_and_drop(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", -2), ("c", 3), ("d", -4)], "k string, v int")

    def script(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.v > 0].copy()          # ret -1 (drop) for negatives
        b["v"] = b.v * 10              # ret 1 (modified) for the rest
        return b

    got = {(r.k, r.v) for r in filter_map_batches(df, script).collect()}
    assert got == {("a", 10), ("c", 30)}


def test_split_records_one_to_n(spark):
    """Lua table-of-tables return: one record → N sub-records."""
    df = spark.createDataFrame(
        [("d1", "x y"), ("d2", "z")], "doc string, words string")
    elem = T.StructType([T.StructField("w", T.StringType()),
                         T.StructField("i", T.IntegerType())])

    def splitter(b: pd.DataFrame) -> pd.Series:
        return b["words"].map(
            lambda s: [{"w": w, "i": i} for i, w in enumerate(s.split())])

    out = split_records(df, splitter, elem, keep_cols=["doc"])
    got = {(r.doc, r.record.w, r.record.i) for r in out.collect()}
    assert got == {("d1", "x", 0), ("d1", "y", 1), ("d2", "z", 0)}
