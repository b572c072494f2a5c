"""spark-submit entry point for the training-data quality chain.

End-to-end over the north-star input shape (doc_id, tokens:array<int>,
n_tok, source): unigram-LM surprisal scoring (corpus-self-trained,
integer milli-nats) → optional surprisal-threshold drop → deterministic
stratified train/holdout split → partitioned writes.

Usage:

    zip -r engine.zip fluent_bit_spark
    spark-submit --master local[32] --py-files engine.zip \
        jobs/run_quality.py --input /path/tokens.parquet \
        --output /path/quality_out \
        [--max-mean-millinats 12000] [--holdout 50] \
        [--rate SRC PERMILLE ...]

Outputs under --output:
    train/     input schema + nll_millinats, n_tok_scored
    holdout/   same schema, the held-out eval slice
    dropped/   rows over the surprisal ceiling (audit trail)

DSIR mode (--dsir-target "SQLEXPR" --dsir-top N [--dsir-buckets K]
[--dsir-seed s]): importance-resample N docs toward the target sample
(operators/tokens.py dsir_select) instead of the surprisal chain;
writes selected/ (full schema + llr_millinats, n_feat, sel_key) and
rejected/, exits non-zero unless selected + rejected == docs_in.
Prints one JSON line with counts + exact conservation checks
(docs in == train + holdout + dropped; tokens scored == tokens in).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="quality scoring + split")
    ap.add_argument("--input", required=True, help="tokens parquet")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--tokens-col", default="tokens")
    ap.add_argument("--len-col", default="n_tok")
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--model", default="unigram",
                    choices=["unigram", "bigram"],
                    help="surprisal LM order: unigram (vocab-bounded "
                         "broadcast model) or bigram (conditional pair "
                         "model, shuffle-join scoring; n_tok_scored "
                         "then counts ADJACENT PAIRS and sub-2-token "
                         "docs score 0)")
    ap.add_argument("--max-mean-millinats", type=int, default=0,
                    help="drop docs whose MEAN token surprisal exceeds "
                         "this many milli-nats (0 = no drop)")
    ap.add_argument("--holdout", type=int, default=0,
                    help="default holdout rate in permille")
    ap.add_argument("--rate", nargs=2, action="append", default=[],
                    metavar=("GROUP", "PERMILLE"),
                    help="per-group holdout override (repeatable)")
    ap.add_argument("--dsir-target", default=None, metavar="SQLEXPR",
                    help="DSIR mode: SQL filter expression defining "
                         "the target sample (e.g. \"source = 'wiki'\")"
                         "; selects --dsir-top docs by importance "
                         "resampling instead of the surprisal chain")
    ap.add_argument("--dsir-top", type=int, default=0,
                    help="number of docs to select in DSIR mode")
    ap.add_argument("--dsir-buckets", type=int, default=4096,
                    help="hashed-feature bucket count (model size)")
    ap.add_argument("--dsir-seed", default="dsir",
                    help="seed string for the deterministic Gumbel "
                         "perturbation (reruns reproduce the draw)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.filters import stratified_split
    from fluent_bit_spark.operators.tokens import (
        bigram_surprisal, unigram_surprisal,
    )
    from fluent_bit_spark.session import get_spark

    # Every exchange here is NARROW (tok/count partials, one row per
    # doc), so one reduce task per core is right (NOTES.md #12).
    cores = os.cpu_count() or 8
    spark = get_spark(app_name="run_quality", shuffle_partitions=cores)
    t0 = time.time()
    if not os.path.exists(args.input):
        ap.error(f"input not found: {args.input}")
    df = spark.read.parquet(args.input)
    n_in = df.count()
    tok_in = df.agg(F.sum(args.len_col)).first()[0] or 0

    if args.dsir_target is not None:
        # DSIR importance resampling (operators/tokens.py
        # dsir_select): K-bounded hashed-feature model, broadcast
        # scoring, deterministic Gumbel top-k. Same write/conservation
        # posture as the surprisal chain: selected + rejected == in.
        from fluent_bit_spark.operators.tokens import dsir_select
        if args.dsir_top <= 0:
            ap.error("--dsir-target requires --dsir-top N > 0")
        target = df.filter(args.dsir_target)
        if target.limit(1).count() == 0:
            ap.error("--dsir-target matched no rows")
        picked = dsir_select(df, target, n=args.dsir_top,
                             tokens_col=args.tokens_col,
                             n_buckets=args.dsir_buckets,
                             id_col=args.id_col,
                             id_cols=(args.id_col,),
                             seed=args.dsir_seed)
        joined = (df.join(picked, args.id_col, "left").persist())
        sel = joined.filter(F.col("sel_key").isNotNull())
        rej = (joined.filter(F.col("sel_key").isNull())
               .drop("llr_millinats", "n_feat", "sel_key"))
        sel.write.mode("overwrite").parquet(f"{args.output}/selected")
        rej.write.mode("overwrite").parquet(f"{args.output}/rejected")
        n_sel = spark.read.parquet(f"{args.output}/selected").count()
        n_rej = spark.read.parquet(f"{args.output}/rejected").count()
        joined.unpersist()
        from fluent_bit_spark.caching import release
        release(picked)  # the K-row model persist inside dsir_select
        conserved = (n_sel + n_rej == n_in
                     and n_sel == min(args.dsir_top, n_in))
        print(json.dumps({"docs_in": n_in, "selected": n_sel,
                          "rejected": n_rej, "model": "dsir",
                          "buckets": args.dsir_buckets,
                          "tokens_in": int(tok_in),
                          "conserved": conserved,
                          "wall_sec": round(time.time() - t0, 2)}))
        return 0 if conserved else 2

    if args.model == "bigram":
        scores = (bigram_surprisal(df, tokens_col=args.tokens_col,
                                   id_cols=(args.id_col,))
                  .withColumnRenamed("n_bigrams_scored", "n_tok_scored"))
        # a bigram model scores one unit per ADJACENT PAIR
        tok_expected = (df.agg(F.sum(F.greatest(
            F.size(F.col(args.tokens_col)) - 1, F.lit(0))).cast("long"))
            .first()[0] or 0)
    else:
        scores = unigram_surprisal(df, tokens_col=args.tokens_col,
                                   id_cols=(args.id_col,))
        tok_expected = tok_in
    # one narrow equi-join on the id brings the two score columns back
    # onto the full-width rows (the score agg output is doc-keyed, so
    # this is a co-partitioned shuffle join, not a blow-up); LEFT so a
    # zero-token doc keeps a row (score 0) instead of vanishing
    scored = (df.join(scores, args.id_col, "left")
              .fillna({"nll_millinats": 0, "n_tok_scored": 0}))

    if args.max_mean_millinats > 0:
        # integer cross-multiply: mean > ceiling <=> sum > ceiling * n
        bad = (F.col("nll_millinats")
               > F.lit(args.max_mean_millinats)
               * F.col("n_tok_scored"))
    else:
        bad = F.lit(False)
    scored = scored.withColumn("__drop", bad)

    rates = {g: int(p) for g, p in args.rate}
    out = stratified_split(scored, args.group_col, args.id_col, rates,
                           default_permille=args.holdout)
    out = out.persist()
    dropped = out.filter("__drop").drop("__drop", "split")
    train = out.filter("NOT __drop AND split = 'train'").drop("__drop")
    hold = out.filter("NOT __drop AND split = 'holdout'").drop("__drop")
    dropped.write.mode("overwrite").parquet(f"{args.output}/dropped")
    train.write.mode("overwrite").parquet(f"{args.output}/train")
    hold.write.mode("overwrite").parquet(f"{args.output}/holdout")

    counts = {k: spark.read.parquet(f"{args.output}/{k}").count()
              for k in ("train", "holdout", "dropped")}
    tok_scored = out.agg(F.sum("n_tok_scored")).first()[0] or 0
    out.unpersist()
    from fluent_bit_spark.caching import release
    release(scores)  # bigram model's pair-count persist (ADVICE r4)
    conserved = (sum(counts.values()) == n_in
                 and tok_scored == tok_expected)
    print(json.dumps({"docs_in": n_in, **counts,
                      "model": args.model,
                      "tokens_in": int(tok_in),
                      "tokens_expected": int(tok_expected),
                      "tokens_scored": int(tok_scored),
                      "conserved": conserved,
                      "wall_sec": round(time.time() - t0, 2)}))
    # no spark.stop(): spark-submit tears the JVM down at exit, and an
    # in-suite main() call must not kill the caller's shared session
    return 0 if conserved else 2


if __name__ == "__main__":
    raise SystemExit(main())
