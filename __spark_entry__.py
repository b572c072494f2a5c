"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``fluent_bit_spark.queries``; see SURVEY.md §2
for the operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: parse→tag→route→per-sink
    aggregates (records, char sums, distinct sources)."""
    from fluent_bit_spark.queries import route_agg
    return route_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fluent_bit_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fluent_bit_spark.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
