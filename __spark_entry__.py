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


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order.  A static priority list (rounds 3-4) rotted between
# rounds — late registrations never entered the window and displaced
# veterans went stale.  The order is now computed from the driver's own
# CORRECTNESS_r*.json history at import time: never-driver-checked
# entries first, then fewest green rows, then stalest last-checked
# round, with registration order as the deterministic tiebreak.  No
# entry can stay unchecked for long: once checked and green it sinks
# behind everything with a thinner record.
# tools/check_oracles.py still value-checks ALL entries at three SFs.
def _driver_history() -> dict[str, tuple[int, int]]:
    """name -> (green driver rows across rounds, last round checked).

    A row is green when its value hash matched; for rows-only checks
    (no oracle) the weaker rows_match counts.  Unreadable files are
    skipped — an empty history degrades to registration order.
    """
    import glob
    import json
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    hist: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            hm = row.get("hash_match")
            green = bool(hm) if hm is not None else bool(row.get("rows_match"))
            g, last, _ = hist.get(name, (0, 0, False))
            # last_red tracks the MOST RECENT round's verdict: a red
            # that was later re-checked green stops being urgent
            hist[name] = (g + int(green), max(last, rnd),
                          (not green) if rnd >= last else _)
    return hist


def _ordered(mapping):
    # Priority tiers (the registry outgrew the 50-entry window, so the
    # order now expresses what a driver check is WORTH):
    #   0. entries whose latest driver row was RED — clearing a
    #      recorded mismatch outranks everything (the r4 verdict's
    #      explicit done-criterion);
    #   1. never-driver-checked, in registration order;
    #   2. the checked-green backlog, fewest greens then stalest.
    hist = _driver_history()
    idx = {n: i for i, n in enumerate(mapping)}

    def key(n):
        g, last, red = hist.get(n, (0, 0, False))
        return (0 if red else 1, g, last, idx[n])

    names = sorted(mapping, key=key)
    return {n: mapping[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fluent_bit_spark.queries import QUERIES
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fluent_bit_spark.queries import ORACLE_SQL
    return _ordered(ORACLE_SQL)
