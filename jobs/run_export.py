"""spark-submit entry point for dataset-shard export with an
integrity manifest.

Writes a tokens/documents table as ``n_shards`` deterministic
md5-assigned parquet shards (operators/export.py), computes the
per-shard (rows, token-sum, xor-checksum) manifest from the INPUT,
then RE-READS the written tree and recomputes the manifest — the two
must match cell-for-cell before the job declares success (a manifest
computed only from the input cannot catch a write fault; the re-read
is the proof). Exits non-zero and leaves the manifest off disk on any
mismatch.

Usage:

    zip -r engine.zip fluent_bit_spark
    spark-submit --master local[32] --py-files engine.zip \
        jobs/run_export.py --input /path/tokens.parquet \
        --output /path/dataset [--shards 64] \
        [--content-col text|tokens] [--id-col doc_id] [--len-col n_tok]

Outputs under --output:
    shards/shard=K/*.parquet   (the dataset)
    manifest.json              (per-shard rows/tokens/checksum + totals)
Prints one JSON line with counts, verification, and throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="shard export + manifest")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--content-col", default="tokens")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--len-col", default="n_tok")
    ap.add_argument("--order-col", default=None,
                    help="RANGE sharding on this integral column "
                         "(contiguous balanced splits — curriculum "
                         "layout, shard 0 = lowest band) instead of "
                         "the default hash layout")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.export import (shard_assign,
                                                   shard_by_order,
                                                   shard_manifest)
    from fluent_bit_spark.session import get_spark

    spark = get_spark(app_name="run_export")
    t0 = time.time()
    if not os.path.exists(args.input):
        ap.error(f"input not found: {args.input}")
    df = spark.read.parquet(args.input)
    if args.content_col not in df.columns:
        ap.error(f"--content-col {args.content_col!r} not in input "
                 f"columns {df.columns}")
    len_col = args.len_col if args.len_col in df.columns else None

    if args.order_col:
        if args.order_col not in df.columns:
            ap.error(f"--order-col {args.order_col!r} not in input "
                     f"columns {df.columns}")
        assigned = shard_by_order(df, args.shards,
                                  order_col=args.order_col,
                                  id_col=args.id_col)
    else:
        assigned = shard_assign(df, args.shards, args.id_col)
    (assigned.write.mode("overwrite")
     .partitionBy("shard").parquet(f"{args.output}/shards"))

    want = {r["shard"]: r.asDict() for r in
            shard_manifest(assigned, args.content_col, args.id_col,
                           len_col).collect()}
    back = spark.read.parquet(f"{args.output}/shards")
    got = {r["shard"]: r.asDict() for r in
           shard_manifest(back, args.content_col, args.id_col,
                          len_col).collect()}
    verified = want == got

    n_in = df.count()
    n_docs = sum(m["n_docs"] for m in want.values())
    wall = time.time() - t0
    res = {
        "rows_in": n_in,
        "rows_sharded": n_docs,
        "shards": args.shards,
        "shards_nonempty": len(want),
        "verified": verified and n_docs == n_in,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_in / wall, 1),
    }
    if res["verified"]:
        with open(f"{args.output}/manifest.json", "w") as f:
            json.dump({"n_shards": args.shards,
                       "content_col": args.content_col,
                       "shards": sorted(want.values(),
                                        key=lambda m: m["shard"])},
                      f, indent=1)
    print(json.dumps(res))
    return 0 if res["verified"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
