"""Round-over-round bench regression gate (VERDICT r1 item 9).

Usage::

    python bench.py | tail -1 > /tmp/bench_new.json
    python tools/bench_compare.py /tmp/bench_new.json

Compares the new bench line against the LATEST ``BENCH_r*.json`` in the
repo root (driver schema: ``{"parsed": {...}}``), prints a per-query
markdown table, and exits **1** if any query regresses more than
``THRESHOLD``× at the same scale factor — so a de-optimization cannot
ride silently into the next round. New queries (no baseline entry) are
reported as ``new`` and never fail the gate.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = 1.5
# Absolute anchor: the flagship pipeline_rows_per_sec (min-of-3
# fresh-JVM in bench.py, so already noise-robust) must stay within
# ANCHOR_FRACTION of the best ever recorded at the same sf. The share
# gate alone is blind to UNIFORM slowdowns (every query 1.6x slower →
# shares unchanged); this anchor catches exactly that case (VERDICT r2
# "what's wrong" #1).
ANCHOR_FRACTION = 0.9
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_round() -> tuple[str, dict] | None:
    best = None
    for f in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if not m:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, f)
    if best is None:
        return None
    with open(best[1]) as fh:
        data = json.load(fh)
    return best[1], data.get("parsed", data)


def best_pipeline_rate(sf) -> tuple[float, str] | None:
    """Best pipeline_rows_per_sec recorded at this sf across all prior
    BENCH_r*.json (driver artifacts are the durable record)."""
    best = None
    for f in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        with open(f) as fh:
            data = json.load(fh)
        parsed = data.get("parsed", data)
        rate = parsed.get("pipeline_rows_per_sec")
        if rate is None or parsed.get("sf") != sf:
            continue
        if best is None or rate > best[0]:
            best = (rate, os.path.basename(f))
    return best


def median_baseline(sf) -> dict[str, float]:
    """Per-query baseline = MEDIAN wall across ALL recorded rounds at
    this sf. A single round's value is a min-of-N that can be a lucky
    co-tenant-quiet low; comparing today's run against one lucky low
    flags phantom "regressions" on a different query set every run
    (observed three disjoint sets in one afternoon, identical code).
    The median across rounds is the typical wall."""
    import statistics
    walls: dict[str, list[float]] = {}
    for f in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        with open(f) as fh:
            data = json.load(fh)
        parsed = data.get("parsed", data)
        if parsed.get("sf") != sf:
            continue
        for q, w in (parsed.get("queries") or {}).items():
            walls.setdefault(q, []).append(w)
    return {q: statistics.median(ws) for q, ws in walls.items()}


def main() -> int:
    with open(sys.argv[1]) as fh:
        new = json.loads(fh.read().strip().splitlines()[-1])
    prior = latest_round()
    if prior is None:
        print("no prior BENCH_r*.json — nothing to compare")
        return 0
    pfile, old = prior
    if old.get("sf") != new.get("sf"):
        print(f"sf mismatch (old {old.get('sf')} vs new {new.get('sf')}) "
              "— comparison skipped")
        return 0
    newq = new.get("queries", {})
    oldq = median_baseline(new.get("sf")) or old.get("queries", {})
    pfile = f"median({pfile},…)" if oldq else pfile
    # Wall times on this shared guest swing ±20-40% with co-tenant load
    # (BENCH/BASELINE.md variance note) — a raw per-query ratio would
    # flag pure noise. Normalize each query by the run's total over the
    # SHARED query set: uniform machine slowdown cancels, a query that
    # de-optimized relative to its peers still trips the gate.
    shared = sorted(set(oldq) & set(newq))
    old_tot = sum(oldq[n] for n in shared) or 1.0
    new_tot = sum(newq[n] for n in shared) or 1.0
    rows, failures = [], []
    for name, t in sorted(newq.items()):
        if name not in oldq:
            rows.append((name, None, t, "new"))
            continue
        ratio = ((t / new_tot) / (oldq[name] / old_tot)
                 if oldq[name] else float("inf"))
        raw = t / oldq[name] if oldq[name] else float("inf")
        # A query REGRESSED only if slower in share AND raw terms:
        # share-only flags fire when OTHER queries genuinely improve
        # (the total shrinks, everyone's share rises); raw-only flags
        # fire on uniform co-tenant noise (covered by the pipeline
        # anchor gate below, which is min-of-3 and noise-robust).
        # Sub-second queries additionally need an ABSOLUTE delta above
        # the scheduler-noise floor: a 0.5s -> 0.8s single-run swing is
        # routine jitter on this guest (observed same-day 0.48/0.53/
        # 0.77s for an unchanged plan), while any real de-optimization
        # of a big query clears half a second easily.
        status = ("REGRESSED" if (ratio > THRESHOLD and raw > 1.3
                                  and t - oldq[name] > 0.5)
                  else "improved" if ratio < 1 / THRESHOLD else "ok")
        if status == "REGRESSED":
            failures.append(name)
        rows.append((name, oldq[name], t,
                     f"{ratio:.2f}x-share/{raw:.2f}x-raw {status}"))
    print(f"| query | {os.path.basename(pfile)} (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    for name, o, t, st in rows:
        print(f"| {name} | {o if o is not None else '—'} | {t} | {st} |")
    print(f"\ntotal: {old.get('value')} -> {new.get('value')} s; "
          f"pipeline {old.get('pipeline_rows_per_sec')} -> "
          f"{new.get('pipeline_rows_per_sec')} rows/s")
    # absolute anchor gate (uniform-slowdown detector)
    new_rate = new.get("pipeline_rows_per_sec")
    anchor = best_pipeline_rate(new.get("sf"))
    if new_rate is not None and anchor is not None:
        best_rate, src = anchor
        ok = new_rate >= ANCHOR_FRACTION * best_rate
        print(f"anchor: pipeline {new_rate} rows/s vs best recorded "
              f"{best_rate} ({src}) — "
              f"{'ok' if ok else 'BELOW ' + str(ANCHOR_FRACTION) + 'x'}")
        if not ok:
            failures.append("pipeline_rows_per_sec[anchor]")
    if failures:
        print(f"\nFAIL: regression in: {', '.join(failures)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
