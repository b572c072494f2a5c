"""filter_throttle: rate limiting (upstream:plugins/filter_throttle/throttle.c).

The reference keeps a sliding pane-bucketed counter per window and drops
records past ``Rate`` per ``Window × Interval``. The deterministic batch
analogue: at most N rows per (keys, time-bucket), chosen by stable order —
a ranking window, which Catalyst executes as one shuffle + running count.

At 10^12-row scale the window shuffle partitions by (keys, bucket); skewed
key+bucket pairs are bounded because each group is truncated at ``rate``
(a TopK-per-group; Spark applies rank-limit pushdown in recent versions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle(df: DataFrame, rate: int, keys: list[str],
             ts_col: str = "ts", interval: str = "1 minute",
             tiebreak: list[str] | None = None) -> DataFrame:
    bucket = F.window(F.col(ts_col), interval).getField("start")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = (Window.partitionBy(*[F.col(k) for k in keys], bucket)
         .orderBy(*order))
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= rate)
              .drop("__rn"))
