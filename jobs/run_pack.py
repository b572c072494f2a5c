"""spark-submit entry point for sequence packing.

Packs a tokens table in the north-star input shape — (doc_id,
tokens:array<int32>, n_tok, source) — into fixed context-length
training windows (operators/tokens.py pack_sequences), optionally in
deterministically SHUFFLED corpus order (xxhash64 of the id: the
"global shuffle then chunk" step every training pipeline runs before
materializing a dataset). Asserts exact token conservation before
declaring success — a packing run that lost or duplicated a token
exits non-zero and removes nothing.

Usage:

    zip -r engine.zip fluent_bit_spark
    spark-submit --master local[32] --py-files engine.zip \
        jobs/run_pack.py --input /path/tokens.parquet \
        --output /path/packed [--ctx 2048] \
        [--order id|hash] [--id-col doc_id --part-col source]

Outputs under --output:
    packed/   (source, chunk_id, tokens, n_docs, n_tok_chunk, full)
Prints one JSON line with counts, conservation, and throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="sequence packing")
    ap.add_argument("--input", required=True, help="tokens parquet")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--ctx", type=int, default=2048,
                    help="context window length (tokens)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--tokens-col", default="tokens")
    ap.add_argument("--len-col", default="n_tok")
    ap.add_argument("--part-col", default="source")
    ap.add_argument("--order", choices=["id", "hash"], default=None,
                    help="concat order: 'id' (ids must be integral) or "
                         "'hash' (deterministic shuffle; default for "
                         "string ids, required for them)")
    ap.add_argument("--rows-per-group", "--group-size", type=int,
                    default=1 << 20, dest="rows_per_group",
                    help="target rows per prefix-sum range group "
                         "(bounds window task rows); in --order hash "
                         "mode the actual key-domain bucket width is "
                         "derived from this and the row count")
    ap.add_argument("--sep-token", type=int, default=None,
                    help="append this end-of-document token to every "
                         "doc before chunking")
    ap.add_argument("--mode", choices=["chunk", "nosplit", "fim",
                                       "batch", "spans", "ul2"],
                    default="chunk",
                    help="'chunk' = GPT-style concat-and-chunk (docs "
                         "may split across windows); 'nosplit' = SFT "
                         "greedy packing (docs stay whole, bins pad, "
                         "overlong docs land in the overlong/ dir); "
                         "'fim' = fill-in-the-middle transform of the "
                         "token streams (no packing); 'batch' = "
                         "length-bucketed max-token batch assignment; "
                         "'spans' = T5 span corruption; 'ul2' = UL2 "
                         "R/S/X mixture of denoisers")
    ap.add_argument("--fim-rate", type=int, default=900,
                    help="permille of docs FIM-transformed (mode fim)")
    ap.add_argument("--fim-spm", type=int, default=500,
                    help="permille of transformed docs serialized SPM "
                         "instead of PSM (mode fim)")
    ap.add_argument("--seed", type=int, default=0,
                    help="draw seed for mode fim")
    ap.add_argument("--bucket-round", type=int, default=64,
                    help="length-bucket rounding (mode batch; --ctx "
                         "is the per-batch token budget)")
    args = ap.parse_args()
    if args.mode == "nosplit" and args.sep_token is not None:
        ap.error("--sep-token applies to --mode chunk only (nosplit "
                 "bins are padded by the dataloader, not separated)")
    if args.mode == "nosplit" and args.order is not None:
        ap.error("--mode nosplit walks a fixed deterministic md5-key "
                 "order; --order does not apply")
    if args.mode in ("fim", "batch", "spans", "ul2") \
            and (args.order is not None or args.sep_token is not None):
        ap.error(f"--order/--sep-token do not apply to --mode "
                 f"{args.mode}")

    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.tokens import (hash_order_bucket_width,
                                                   pack_documents,
                                                   pack_sequences)
    from fluent_bit_spark.session import get_spark

    # Shuffle partitions ≥ 4× cores: the packing exchange moves wide
    # token rows, and one-task-per-core sizing makes every sort task
    # resident at once (measured 3-4× slowdown at local[32]; see
    # BENCH/PACK.md). AQE coalesces the excess on small inputs.
    cores = os.cpu_count() or 8
    spark = get_spark(app_name="run_pack",
                      shuffle_partitions=max(4 * cores, 32))
    t0 = time.time()
    if not os.path.exists(args.input):
        ap.error(f"input not found: {args.input}")
    df = spark.read.parquet(args.input)

    tok_in = df.agg(F.sum(args.len_col)).first()[0] or 0
    n_in = df.count()
    n_packed_docs = df.filter(F.col(args.len_col) > 0).count()

    if args.mode == "fim":
        from fluent_bit_spark.operators.tokens import fim_transform
        out = f"{args.output}/fim"
        fim_transform(df, rate_permille=args.fim_rate,
                      spm_permille=args.fim_spm, seed=args.seed,
                      id_col=args.id_col, tokens_col=args.tokens_col,
                      len_col=args.len_col) \
            .write.mode("overwrite").parquet(out)
        p = spark.read.parquet(out)
        a = p.agg(
            F.coalesce(F.sum("n_tok_out"), F.lit(0)).alias("tok"),
            F.coalesce(F.sum(F.when(F.col("fim_mode") != "none", 1)
                             .otherwise(0)), F.lit(0)).alias("nfim"),
            F.coalesce(F.sum(F.when(F.col("fim_mode") == "spm", 1)
                             .otherwise(0)), F.lit(0)).alias("nspm"),
        ).first()
        wall = time.time() - t0
        res = {
            "rows_in": n_in,
            "tokens_in": int(tok_in),
            "tokens_out": int(a["tok"]),
            # every transformed doc gains exactly the 3 sentinels
            "conserved": int(a["tok"]) == int(tok_in) + 3 * int(a["nfim"]),
            "fim_docs": int(a["nfim"]),
            "spm_docs": int(a["nspm"]),
            "rate_permille": args.fim_rate,
            "mode": "fim",
            "wall_sec": round(wall, 2),
            "tokens_per_sec": round(tok_in / wall, 1),
        }
        print(json.dumps(res))
        return 0 if res["conserved"] else 2

    if args.mode in ("spans", "ul2"):
        from fluent_bit_spark.operators.tokens import (span_corrupt,
                                                       ul2_mixture)
        out = f"{args.output}/{args.mode}"
        if args.mode == "spans":
            res_df = span_corrupt(df, seed=args.seed,
                                  id_col=args.id_col,
                                  tokens_col=args.tokens_col,
                                  len_col=args.len_col)
            overhead = 1  # closing sentinel
        else:
            res_df = ul2_mixture(df, seed=args.seed,
                                 id_col=args.id_col,
                                 tokens_col=args.tokens_col,
                                 len_col=args.len_col)
            overhead = 2  # closing sentinel + paradigm token
        res_df.write.mode("overwrite").parquet(out)
        p = spark.read.parquet(out)
        a = p.agg(
            F.coalesce(F.sum(F.size("inputs") + F.size("targets")),
                       F.lit(0)).alias("len_sum"),
            F.coalesce(F.sum("n_spans"), F.lit(0)).alias("spans"),
            F.count("*").alias("docs")).first()
        wall = time.time() - t0
        # every token lands in exactly one of inputs/targets; each
        # span adds one sentinel to each side, plus the fixed overhead
        expected = (int(tok_in) + 2 * int(a["spans"])
                    + overhead * int(a["docs"]))
        res = {
            "rows_in": n_in,
            "tokens_in": int(tok_in),
            "len_inputs_plus_targets": int(a["len_sum"]),
            "conserved": int(a["len_sum"]) == expected,
            "spans": int(a["spans"]),
            "mode": args.mode,
            "wall_sec": round(wall, 2),
            "tokens_per_sec": round(tok_in / wall, 1),
        }
        print(json.dumps(res))
        return 0 if res["conserved"] else 2

    if args.mode == "batch":
        from fluent_bit_spark.operators.tokens import bucket_batches
        out = f"{args.output}/batches"
        bucket_batches(df, max_tokens=args.ctx,
                       bucket_rounding=args.bucket_round,
                       id_col=args.id_col, len_col=args.len_col,
                       source_col=args.part_col) \
            .write.mode("overwrite").parquet(out)
        p = spark.read.parquet(out)
        per_batch = (p.filter(~F.col("oversize"))
                     .groupBy(args.part_col, "bucket_len", "batch_idx")
                     .agg(F.count("*").alias("n_seqs"),
                          F.sum("pad_tok").alias("pad")))
        b = per_batch.agg(
            F.count("*").alias("batches"),
            F.coalesce(F.sum("pad"), F.lit(0)).alias("pad"),
            F.coalesce(F.max(F.col("n_seqs") * F.col("bucket_len")),
                       F.lit(0)).alias("maxcost")).first()
        n_over = p.filter("oversize").count()
        n_assigned = p.count() - n_over
        tok_assigned = (p.filter(~F.col("oversize"))
                        .agg(F.coalesce(F.sum(args.len_col), F.lit(0)))
                        .first()[0])
        wall = time.time() - t0
        padded = int(b["pad"]) + int(tok_assigned)
        res = {
            "rows_in": n_in,
            # every positive-length doc lands in exactly one batch or
            # the oversize route
            "conserved": n_assigned + n_over == n_packed_docs
                         and int(b["maxcost"]) <= args.ctx,
            "batches": int(b["batches"]),
            "assigned_docs": n_assigned,
            "oversize_docs": n_over,
            "pad_tokens": int(b["pad"]),
            "fill_rate": round(1 - b["pad"] / max(padded, 1), 4),
            "max_batch_cost": int(b["maxcost"]),
            "budget": args.ctx,
            "mode": "batch",
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_in / wall, 1),
        }
        print(json.dumps(res))
        return 0 if res["conserved"] else 2

    if args.mode == "nosplit":
        # cell width over the 60-bit md5-key domain, sized so a cell
        # holds ~rows_per_group docs (bounds the greedy walk's memory;
        # waste ≤ one underfull bin per cell)
        cells = max(n_packed_docs // args.rows_per_group, 1)
        cell_width = max((1 << 60) // cells, 1)
        packed = pack_documents(df, ctx_len=args.ctx,
                                id_col=args.id_col,
                                tokens_col=args.tokens_col,
                                len_col=args.len_col,
                                part_col=args.part_col,
                                cell_width=cell_width)
        out = f"{args.output}/packed"
        packed.write.mode("overwrite").parquet(out)
        p = spark.read.parquet(out)
        a = p.agg(
            F.count("*").alias("bins"),
            F.coalesce(F.sum("n_tok_bin"), F.lit(0)).alias("tok"),
            F.coalesce(F.sum(F.col("overlong").cast("long")),
                       F.lit(0)).alias("over"),
            F.coalesce(F.sum(F.when(~F.col("overlong"), F.col("pad"))
                             .otherwise(F.lit(0))), F.lit(0))
             .alias("pad")).first()
        wall = time.time() - t0
        bins_packed = int(a["bins"]) - int(a["over"])
        res = {
            "rows_in": n_in,
            "tokens_in": int(tok_in),
            "tokens_out": int(a["tok"]),
            "conserved": int(tok_in) == int(a["tok"]),
            "bins": bins_packed,
            "overlong_docs": int(a["over"]),
            "pad_tokens": int(a["pad"]),
            "fill_rate": round(
                1 - a["pad"] / max(bins_packed * args.ctx, 1), 4),
            "ctx": args.ctx,
            "mode": "nosplit",
            "wall_sec": round(wall, 2),
            "tokens_per_sec": round(tok_in / wall, 1),
        }
        print(json.dumps(res))
        return 0 if res["conserved"] else 2

    id_integral = (df.schema[args.id_col].dataType.simpleString()
                   in ("tinyint", "smallint", "int", "bigint"))
    order = args.order or ("id" if id_integral else "hash")
    if order == "id" and not id_integral:
        ap.error(f"--order id requires an integral {args.id_col}; "
                 "use --order hash")
    if order == "hash":
        df = df.withColumn("__okey", F.xxhash64(args.id_col))
        okey, tiebreak = "__okey", args.id_col
    else:
        okey, tiebreak = args.id_col, None
    # with an EOD separator every packed doc contributes one extra token
    tok_expected = tok_in + (n_packed_docs
                             if args.sep_token is not None else 0)

    # group_size is a width in ORDER-KEY units: dense ids → rows per
    # group directly; hash keys span the full int64 domain, so derive
    # the width from the key domain and the row count (a dense-sized
    # width would make the per-group totals table corpus-sized and the
    # base-offset broadcast a driver OOM at scale).
    if order == "hash":
        group_size = hash_order_bucket_width(n_packed_docs,
                                             args.rows_per_group)
    else:
        group_size = args.rows_per_group
    packed = pack_sequences(df, ctx_len=args.ctx, id_col=args.id_col,
                            tokens_col=args.tokens_col,
                            len_col=args.len_col, part_col=args.part_col,
                            group_size=group_size,
                            order_col=okey, tiebreak_col=tiebreak,
                            sep_token=args.sep_token)
    out = f"{args.output}/packed"
    packed.write.mode("overwrite").parquet(out)

    p = spark.read.parquet(out)
    agg = p.agg(F.count("*").alias("chunks"),
                F.coalesce(F.sum("n_tok_chunk"), F.lit(0)).alias("tok"),
                F.coalesce(F.sum(F.col("full").cast("long")),
                           F.lit(0)).alias("fullc")).first()
    wall = time.time() - t0
    res = {
        "rows_in": n_in,
        "tokens_in": int(tok_in),
        "tokens_out": int(agg["tok"]),
        "conserved": int(tok_expected) == int(agg["tok"]),
        "chunks": int(agg["chunks"]),
        "full_frac": round(agg["fullc"] / max(agg["chunks"], 1), 4),
        "ctx": args.ctx,
        "order": order,
        "wall_sec": round(wall, 2),
        "tokens_per_sec": round(tok_in / wall, 1),
    }
    print(json.dumps(res))
    return 0 if res["conserved"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
