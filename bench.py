"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, ...}

Each query is forced with a noop-format write (out_null analogue,
SURVEY.md §2.1) so timing covers the full plan, not driver collect.
A separate end-to-end pipeline throughput figure (sequences/sec on the
synthetic tokens table) is included as ``pipeline_rows_per_sec``; the
local[8]-vs-local[32] scaling evidence lives in tools/bench_scaling.py
→ BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative of SURVEY.md §2 operator families: parse, filter,
# enrich-join, route+agg (flagship), salted skew agg, windows, dedup,
# similarity, text analysis.
HEADLINE = [
    "route_agg",
    "parse_json_props",
    "grep_filter",
    "enrich_lookup",
    "salted_agg",
    "tumbling_agg",
    "topk_per_group",
    "agg_pushdown_q1",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_resolve_groups",
    "embedding_neardup",
    "ann_topk_bruteforce",
    "ann_ivf",
    "multiline_join",
    "multiline_cri",
    "decoder_escaped",
    "geoip_range_lookup",
    "asof_enrich",
    "rollup_agg",
    "sp_sql_window",
    "text_quality",
    "token_count_regex",
]


def force(df) -> int:
    """Force full evaluation without driver-side materialisation."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod
    from fluent_bit_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    queries = entrymod.queries()

    # Warm the JVM + Arrow path once (excluded from timings).
    force(queries["route_agg"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in HEADLINE:
        # Unregistered-but-benchable entries (the xxhash64 dedup twins
        # live outside queries() so the driver correctness file stays
        # free of no_oracle rows) resolve straight off the module.
        import fluent_bit_spark.queries as qmod
        fn = queries.get(name) or getattr(qmod, name, None)
        if fn is None:
            continue
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    # End-to-end north-star figure: parse→enrich→route→aggregate over the
    # synthetic tokens table (input_hint schema), noop fan-out.
    extra: dict[str, float] = {}
    try:
        from fluent_bit_spark import fixtures as fx
        from fluent_bit_spark.plans.pipeline import (
            PipelineSpec, build_stages, slice_metrics,
        )
        from fluent_bit_spark.operators.router import Route

        tok_path = os.environ.get(
            "SPARK_GRAFT_TOKENS", "/tmp/bench_tokens.parquet")
        n_rows = int(os.environ.get("SPARK_GRAFT_TOKENS_ROWS", "200000"))
        if not os.path.exists(tok_path):
            fx.generate_tokens_table(tok_path, n_rows)
        lk_path = "/tmp/bench_lookup.parquet"
        if not os.path.exists(lk_path):
            fx.generate_lookup_table(lk_path)
        spec = PipelineSpec(
            vocab=fx.vocab(),
            routes=[Route(*r) for r in fx.DEFAULT_ROUTES],
            lookup_path=lk_path,
        )
        df = spark.read.parquet(tok_path)
        rows = df.count()
        t0 = time.perf_counter()
        routed = build_stages(spark, df, spec)
        force(slice_metrics(routed, spec.salt_buckets))
        wall = time.perf_counter() - t0
        extra["pipeline_rows"] = rows
        extra["pipeline_sec"] = round(wall, 3)
        extra["pipeline_rows_per_sec"] = round(rows / wall, 1)
    except Exception as e:  # bench must still emit its JSON line
        extra["pipeline_error"] = str(e)[:200]

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline query wall time (parse/route/agg/dedup/ANN)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
        **extra,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
