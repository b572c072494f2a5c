"""filter_nest: nest / lift (upstream:plugins/filter_nest/nest.c).

``Operation nest``: wrap columns matching a wildcard under one struct key.
``Operation lift``: flatten a struct column's fields to top level, with
optional ``Add_prefix`` / ``Remove_prefix``. Static schema → wildcard key
sets resolve at plan time.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nest(df: DataFrame, wildcard: str | list[str], nest_under: str,
         remove_prefix: str = "", add_prefix: str = "") -> DataFrame:
    # upstream accepts repeated Wildcard lines per [FILTER] nest block —
    # a column nests when ANY pattern matches it
    pats = [wildcard] if isinstance(wildcard, str) else list(wildcard)
    keys = [k for k in df.columns
            if any(fnmatch.fnmatchcase(k, p) for p in pats)]
    if not keys:
        return df
    fields = []
    for k in keys:
        name = k
        if remove_prefix and name.startswith(remove_prefix):
            name = name[len(remove_prefix):]
        fields.append(F.col(k).alias(add_prefix + name))
    keep = [c for c in df.columns if c not in set(keys)]
    return df.select(*keep, F.struct(*fields).alias(nest_under))


def lift(df: DataFrame, nested_under: str,
         add_prefix: str = "") -> DataFrame:
    sub = df.schema[nested_under].dataType
    cols = [c for c in df.columns if c != nested_under]
    lifted = [F.col(f"{nested_under}.{f.name}").alias(add_prefix + f.name)
              for f in sub.fields]
    return df.select(*cols, *lifted)
