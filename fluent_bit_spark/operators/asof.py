"""As-of join (SURVEY.md §2.4 join-taxonomy note).

Absent upstream — fluent-bit's only join is the broadcast hash-lookup
enrich (upstream:plugins/filter_lookup) — but a training-data /
telemetry pipeline wants "most recent dimension state at event time"
(slowly-changing enrichment, e.g. join each record to the last config
push or model version before its timestamp).

Spark-first implementation: NOT a pandas merge_asof per group (that
ships both sides through Arrow) but the sort-based union trick, all
JVM-side and shuffle-minimal:

    union(left tagged, right tagged)
      → last(right_value, ignorenulls) over (partition by key
              order by ts, side)          -- right sorts before left on ties
      → filter side = left

One shuffle on the key, whole-stage codegen throughout; skew follows the
key's row distribution exactly like any window. Ties (right.ts ==
left.ts) count as "already visible" (inclusive as-of, matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str],
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right
    row with ``right.ts <= left.ts`` and the same ``on`` key (null when
    no such row). Output schema = left columns + ``<col><suffix>``."""
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols])
    r = right.select(
        *[(F.col(c) if c in (on, ts)
           else F.lit(None).cast(left.schema[c].dataType)).alias(c)
          for c in lcols],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols])
    u = l.unionByName(r)
    w = (Window.partitionBy(on).orderBy(F.col(ts), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}",
                         F.last(f"_rv_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1)
            .drop("_side", *[f"_rv_{c}" for c in value_cols]))
