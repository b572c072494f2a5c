"""Scriptable per-record transforms — the filter_lua / filter_wasm
surface (SURVEY.md §2.9).

Reference semantics (upstream:plugins/filter_lua/lua.c): a user script
receives (tag, timestamp, record) and returns a code selecting one of
  -1 drop · 0 keep unmodified · 1 keep modified · 2 split into N records
(table-of-tables return). upstream:plugins/filter_wasm and in_exec are
the same hook with different runtimes.

Spark re-expression, honouring the BASELINE.json "vectorized only, no
per-row Python UDFs" constraint: the user writes a **batch function**
over ``pandas.DataFrame`` instead of a per-record function —

- 1:1 + drop → ``filter_map_batches`` via ``mapInPandas`` (the function
  returns a subset/modified frame per Arrow batch);
- 1:N split → ``split_records``: a ``pandas_udf`` returning
  ``array<struct>`` followed by ``explode`` — the UDTF analog that
  stays on the vectorized Arrow path (SURVEY §2.9: "plain explode is
  cheaper" than Python UDTFs).

Scale shape: both are pure map stages — no shuffle, pipelined with
adjacent narrow ops; cost is one Arrow round-trip, so compose all
scripted logic into ONE call per pipeline (the reference re-serializes
msgpack per filter — the fused batch function is the Spark win).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def filter_map_batches(df: DataFrame,
                       fn: Callable[[pd.DataFrame], pd.DataFrame],
                       schema: T.StructType | str | None = None) -> DataFrame:
    """filter_lua 1:1/drop path: ``fn`` maps each Arrow batch to a
    (possibly smaller, possibly rewritten) batch. ``schema`` defaults to
    the input schema (modify-in-place scripts)."""
    out_schema = schema or df.schema

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = fn(b)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(runner, out_schema)


def split_records(df: DataFrame, col_fn: Callable[[pd.DataFrame], pd.Series],
                  element_type: T.StructType,
                  out_col: str = "record",
                  keep_cols: list[str] | None = None) -> DataFrame:
    """filter_lua split path (one record in, N out): ``col_fn`` returns,
    per input batch, a Series of lists of dicts matching
    ``element_type``; each element becomes one output row via explode."""
    udf = F.pandas_udf(
        lambda b: col_fn(b), T.ArrayType(element_type))

    struct_in = F.struct(*[F.col(c) for c in df.columns])
    out = df.withColumn("__recs", udf(struct_in))
    keep = keep_cols if keep_cols is not None else df.columns
    return (out.select(*keep, F.explode("__recs").alias(out_col)))
