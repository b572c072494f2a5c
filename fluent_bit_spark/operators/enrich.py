"""Enrichment joins (SURVEY.md §2.4).

Reference semantics:

- filter_lookup (upstream:plugins/filter_lookup/lookup.c): CSV → in-memory
  hash table; record key → result value, miss → record unchanged.
- filter_kubernetes / filter_geoip2: same hash-lookup shape with an API/DB
  source — a connector concern; the join shape is identical.
- filter_checklist (upstream:plugins/filter_checklist/checklist.c):
  membership test against a value list → set a flag.

Spark shift: every one of these is a **broadcast left-outer (or semi)
equi-join** — the dim side is small by construction (a lookup file), so we
force ``F.broadcast`` and the 10^12-row fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(fact: DataFrame, dim: DataFrame, lookup_key: str,
                dim_key: str | None = None,
                result_keys: list[str] | None = None,
                ignore_case: bool = False) -> DataFrame:
    """filter_lookup: left-outer broadcast join; miss → nulls (record kept).

    ``result_keys`` restricts which dim columns are attached (the reference
    attaches exactly one ``result_key``; we allow several)."""
    dim_key = dim_key or lookup_key
    cols = result_keys or [c for c in dim.columns if c != dim_key]
    dim_sel = dim.select(F.col(dim_key).alias("__dk"), *cols)
    fk = F.col(lookup_key).cast("string")
    dk = F.col("__dk").cast("string")
    if ignore_case:
        fk, dk = F.lower(fk), F.lower(dk)
    out = fact.join(F.broadcast(dim_sel), fk == dk, "left")
    return out.drop("__dk")


def checklist_flag(fact: DataFrame, values: DataFrame, key: str,
                   list_key: str | None = None,
                   flag_col: str = "matched") -> DataFrame:
    """filter_checklist: set a boolean flag when key ∈ list (broadcast)."""
    list_key = list_key or key
    dim = values.select(F.col(list_key).alias("__ck")).distinct() \
                .withColumn("__hit", F.lit(True))
    out = fact.join(F.broadcast(dim),
                    F.col(key).cast("string") == F.col("__ck").cast("string"),
                    "left")
    return (out.withColumn(flag_col, F.coalesce(F.col("__hit"), F.lit(False)))
               .drop("__ck", "__hit"))


def checklist_keep(fact: DataFrame, values: DataFrame, key: str,
                   list_key: str | None = None) -> DataFrame:
    """Semi-join variant: keep only rows whose key is on the list."""
    list_key = list_key or key
    dim = values.select(F.col(list_key).alias(key)).distinct()
    return fact.join(F.broadcast(dim), key, "left_semi")
