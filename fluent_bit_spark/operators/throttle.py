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
             ts_col: str | None = "ts", interval: str = "1 minute",
             tiebreak: list[str] | None = None) -> DataFrame:
    """At most ``rate`` rows per (keys, interval-bucket of ``ts_col``),
    kept in stable (ts, tiebreak) order.

    ``ts_col=None`` drops the time bucketing: at most ``rate`` rows per
    key over the whole frame (the batch-slice analogue when records
    carry no event time — a pipeline slice IS the window). ``tiebreak``
    is then required, since determinism has no timestamp to lean on."""
    if ts_col is None:
        if not tiebreak:
            raise ValueError("throttle(ts_col=None) needs tiebreak "
                             "columns for a deterministic keep order")
        parts = [F.col(k) for k in keys]
        order = [F.col(c) for c in tiebreak]
    else:
        bucket = F.window(F.col(ts_col), interval).getField("start")
        parts = [*[F.col(k) for k in keys], bucket]
        order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*parts).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= rate)
              .drop("__rn"))
