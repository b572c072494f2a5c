"""spark-submit entry for the Structured Streaming pipeline — the
live-tail deployment (in_tail posture; SURVEY.md §3.4 entry points).

    zip -r engine.zip fluent_bit_spark
    spark-submit --master local[32] --py-files engine.zip \
        jobs/run_stream.py --landing /data/landing --output /data/out \
        [--continuous] [--gen-rows N]

Default drains what is currently in the landing dir (availableNow) and
exits — deterministic backfill mode; ``--continuous`` tails forever.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="fluent_bit_spark stream")
    ap.add_argument("--landing", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--gen-rows", type=int, default=0)
    ap.add_argument("--lookup", default=None)
    args = ap.parse_args()

    from fluent_bit_spark import fixtures as fx
    from fluent_bit_spark.operators.router import Route
    from fluent_bit_spark.plans.pipeline import PipelineSpec
    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.streaming.stream_pipeline import \
        start_pipeline_stream

    if args.gen_rows and not os.path.exists(args.landing):
        fx.generate_tokens_table(
            os.path.join(args.landing, "f0.parquet"), args.gen_rows)
    lookup = args.lookup
    if lookup is None:
        lookup = os.path.join(args.output, "_dims", "lookup_sources.parquet")
        if not os.path.exists(lookup):
            fx.generate_lookup_table(lookup)

    spark = get_spark(app_name="logpipe-stream")
    spec = PipelineSpec(
        vocab=fx.vocab(),
        routes=[Route(*r) for r in fx.DEFAULT_ROUTES],
        lookup_path=lookup,
    )
    q = start_pipeline_stream(spark, spec, args.landing, args.output,
                              available_now=not args.continuous)
    q.awaitTermination()
    print(json.dumps({"stopped": True, "output": args.output}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
