"""Scoped-persist bookkeeping for twice-consumed subtrees.

Several operators persist an intermediate frame because their result
consumes it through two plan branches (Catalyst does not dedupe the
subtree; see NOTES.md #20).  The operator cannot unpersist before the
caller's action runs, so the persist outlives the function — and in a
long-lived driver (incremental ingest loop, repeated sql_shim verbs)
batch-sized cached frames accumulate (ADVICE r4).

Contract: an operator that persists an intermediate attaches it to the
RESULT frame with :func:`carry`; a caller that runs exactly one action
over the result calls :func:`release` afterwards.  Callers that ignore
the handle keep today's behavior (cache eviction / clearCache), so the
contract is opt-in and backward-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_fbs_persisted"


def carry(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``result`` (composing with any
    handles the intermediates already carry, so chained operators
    accumulate one flat list)."""
    held = list(getattr(result, _ATTR, ()))
    for p in persisted:
        held.extend(getattr(p, _ATTR, ()))
        held.append(p)
    setattr(result, _ATTR, held)
    return result


def release(result: DataFrame) -> int:
    """Unpersist every intermediate ``result`` carries; returns the
    count.  Safe to call on frames that carry nothing, and idempotent."""
    held = getattr(result, _ATTR, ())
    n = 0
    for df in held:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    if held:
        setattr(result, _ATTR, [])
    return n
