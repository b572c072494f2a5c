"""Scaling-efficiency evidence (BASELINE.json north_rule: throughput
scaling efficiency ≥0.8 from N to 4N executors).

No real cluster exists in the sandbox, so per the driver protocol we run
the SAME end-to-end pipeline job on the SAME input at two parallelism
levels — ``local[8]`` and ``local[32]`` — each in a fresh JVM
(subprocess), medians of ``--runs`` timed runs after one discarded
warm-up, and report efficiency = (T8 / T32) / 4. Results are written to
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--rows 2000000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, tokens: str, out_dir: str, run_id: str,
             slices: int) -> dict:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--input", tokens, "--output", out_dir, "--run-id", run_id,
         "--slices", str(slices)],
        env=env, capture_output=True, text=True, cwd=REPO)
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        raise RuntimeError(f"run failed (cores={cores}):\n{p.stderr[-3000:]}")
    stats = json.loads(p.stdout.strip().splitlines()[-1])
    stats["proc_wall_sec"] = wall  # includes JVM startup — reported separately
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--slices", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/bench_scaling")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    tokens = os.path.join(args.workdir, f"tokens_{args.rows}_f{args.files}")
    if not os.path.exists(tokens):
        sys.path.insert(0, REPO)
        from fluent_bit_spark import fixtures as fx
        print(f"generating {args.rows} rows → {tokens}", file=sys.stderr)
        fx.generate_tokens_table(tokens, args.rows, n_files=args.files)

    results: dict[int, dict] = {}
    for cores in (8, 32):
        out = os.path.join(args.workdir, f"out_{cores}")
        print(f"warm-up local[{cores}] …", file=sys.stderr)
        run_once(cores, tokens, out, "warm", args.slices)
        walls, rates = [], []
        for r in range(args.runs):
            s = run_once(cores, tokens, out, f"r{r}", args.slices)
            walls.append(s["wall_sec"])
            rates.append(s["rows_in"] / s["wall_sec"])
            print(f"local[{cores}] run {r}: {s['wall_sec']:.1f}s "
                  f"{rates[-1]:,.0f} rows/s", file=sys.stderr)
        results[cores] = {
            "wall_sec_median": statistics.median(walls),
            "rows_per_sec_median": statistics.median(rates),
            "walls": walls,
            "rows": args.rows,
        }

    t8 = results[8]["wall_sec_median"]
    t32 = results[32]["wall_sec_median"]
    eff = (t8 / t32) / 4.0
    summary = {
        "rows": args.rows, "runs": args.runs, "slices": args.slices,
        "local8": results[8], "local32": results[32],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    md = os.path.join(bench_dir, "BASELINE.md")
    with open(md, "w") as fh:
        fh.write(f"""# BENCH — scaling-efficiency evidence

North rule criterion: ≥0.8 throughput scaling efficiency between N and
4N executors (`BASELINE.json`). Sandbox protocol (no real cluster): the
same end-to-end pipeline job (parse → enrich → route → multi-sink
partitioned parquet fan-out → salted per-tag aggregates + DLQ + metrics,
`jobs/run_pipeline.py`) on the identical {args.rows:,}-row synthetic
tokens table (input_hint schema, seed-deterministic) at `local[8]` and
`local[32]`, fresh JVM per run, {args.runs} timed runs each after one
discarded warm-up; medians reported. Timing is the in-job wall
(`wall_sec`, excludes JVM/SparkSession startup).

| config | median wall (s) | median throughput (rows/s) | runs (s) |
|---|---|---|---|
| local[8]  | {t8:.1f} | {results[8]['rows_per_sec_median']:,.0f} | {', '.join(f'{w:.1f}' for w in results[8]['walls'])} |
| local[32] | {t32:.1f} | {results[32]['rows_per_sec_median']:,.0f} | {', '.join(f'{w:.1f}' for w in results[32]['walls'])} |

- speedup 8→32 cores: **{t8 / t32:.2f}×** (ideal 4×)
- **scaling efficiency = ({t8:.1f} / {t32:.1f}) / 4 = {eff:.3f}**
  {'(meets the ≥0.8 criterion)' if eff >= 0.8 else '(below 0.8 — see notes)'}

Host: 32-core / 125 GB, PySpark 4.1.2, AQE on, Arrow pandas-UDF parse,
`spark.sql.shuffle.partitions=32`. Raw JSON: `BENCH/scaling.json`.
""")
    with open(os.path.join(bench_dir, "scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(f"wrote {md}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
