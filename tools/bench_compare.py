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
    oldq, newq = old.get("queries", {}), new.get("queries", {})
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
        status = "REGRESSED" if ratio > THRESHOLD else (
            "improved" if ratio < 1 / THRESHOLD else "ok")
        if status == "REGRESSED":
            failures.append(name)
        rows.append((name, oldq[name], t,
                     f"{ratio:.2f}x-share {status}"))
    print(f"| query | {os.path.basename(pfile)} (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    for name, o, t, st in rows:
        print(f"| {name} | {o if o is not None else '—'} | {t} | {st} |")
    print(f"\ntotal: {old.get('value')} -> {new.get('value')} s; "
          f"pipeline {old.get('pipeline_rows_per_sec')} -> "
          f"{new.get('pipeline_rows_per_sec')} rows/s")
    if failures:
        print(f"\nFAIL: >{THRESHOLD}x regression in: {', '.join(failures)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
