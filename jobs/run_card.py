"""spark-submit entry point for dataset-card generation — the
"datasheet for the dataset" artifact (Gebru et al. 2021 posture): one
JSON document summarizing a tokens table's composition, built from
the engine's own audited operators so every number in the card has an
oracled implementation behind it:

- per-source composition: docs, tokens, mean length (integer DIV);
- corpus health: Zipf top-k coverage (zipf_table), vocab size +
  Heaps growth points (vocab_growth), approximate distinct doc_ids
  (approx_distinct_hll — the sketch, cross-checked against the exact
  count when --exact-distinct);
- repetition quality: corpus means of the Gopher top-2-gram share and
  dup-5-gram coverage permilles (ngram_repetition);
- optional drift vs a previous snapshot (--previous): L1 drift ppm +
  top movers (corpus_drift).

Usage:

    zip -r engine.zip fluent_bit_spark
    spark-submit --master local[32] --py-files engine.zip \
        jobs/run_card.py --input /path/tokens.parquet \
        --output /path/card.json [--previous /path/old_tokens.parquet]
        [--zipf-top 20] [--exact-distinct]

Prints the card JSON (one line) and writes it to --output; exits
non-zero when the input is empty or a section fails to compute —
a card with silently-missing sections is worse than no card.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="dataset card")
    ap.add_argument("--input", required=True, help="tokens parquet")
    ap.add_argument("--output", required=True, help="card JSON path")
    ap.add_argument("--previous", default=None,
                    help="previous-snapshot tokens parquet for drift")
    ap.add_argument("--tokens-col", default="tokens")
    ap.add_argument("--len-col", default="n_tok")
    ap.add_argument("--part-col", default="source")
    ap.add_argument("--zipf-top", type=int, default=20)
    ap.add_argument("--rep-sample-permille", type=int, default=250,
                    help="repetition signals are computed on this "
                         "deterministic md5 content-hash fraction of "
                         "docs (cards are summaries; the full scan's "
                         "per-doc gram tables need several GB of "
                         "heap at 10^5+ docs — sample or size the "
                         "driver). 1000 = full scan")
    ap.add_argument("--exact-distinct", action="store_true",
                    help="also compute the exact distinct doc count "
                         "(one extra corpus agg) and report the HLL "
                         "error")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.aggregate import approx_distinct_hll
    from fluent_bit_spark.operators.tokens import (corpus_drift,
                                                   ngram_repetition,
                                                   vocab_growth,
                                                   zipf_table)
    from fluent_bit_spark.session import get_spark

    spark = get_spark(app_name="run_card")
    t0 = time.time()
    if not os.path.exists(args.input):
        ap.error(f"input not found: {args.input}")
    df = spark.read.parquet(args.input)
    n_in = df.count()
    if n_in == 0:
        print(json.dumps({"error": "empty input"}))
        return 2

    comp = (df.groupBy(args.part_col)
            .agg(F.count("*").alias("docs"),
                 F.sum(args.len_col).cast("long").alias("tokens"),
                 F.expr(f"sum({args.len_col}) DIV count(*)")
                  .cast("long").alias("mean_len"))
            .orderBy(args.part_col).collect())
    zt = zipf_table(df, tokens_col=args.tokens_col,
                    k=args.zipf_top).collect()
    vg = vocab_growth(df, tokens_col=args.tokens_col).collect()
    hll = approx_distinct_hll(df, "doc_id").first()
    rp = max(1, min(1000, args.rep_sample_permille))
    rep_in = df.filter(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                           1, 7), 16, 10).cast("long") % 1000 < rp)
    rep = (ngram_repetition(rep_in, tokens_col=args.tokens_col,
                            len_col=args.len_col)
           .agg(F.expr("sum(top2_permille) DIV count(*)")
                 .cast("long").alias("top2"),
                F.expr("sum(dup5_permille) DIV count(*)")
                 .cast("long").alias("dup5")).first())

    card = {
        "rows": n_in,
        "tokens_total": int(sum(r["tokens"] for r in comp)),
        "sources": [{"source": r[args.part_col], "docs": r["docs"],
                     "tokens": int(r["tokens"]),
                     "mean_len": int(r["mean_len"])} for r in comp],
        "zipf_top": [{"rank": int(r["rank"]), "tok": r["tok"],
                      "count": int(r["freq"]),
                      "cum_mass_permille": int(r["cum_permille"])}
                     for r in zt],
        "vocab_growth": [{"sample_permille": int(r["permille"]),
                          "docs": int(r["docs"]),
                          "vocab": int(r["distinct_toks"])}
                         for r in vg],
        "est_distinct_docs": int(hll["est_distinct"]),
        "mean_top2gram_permille": int(rep["top2"]),
        "mean_dup5gram_coverage_permille": int(rep["dup5"]),
        "rep_sample_permille": rp,
    }
    if args.exact_distinct:
        exact = df.select("doc_id").distinct().count()
        card["exact_distinct_docs"] = exact
        card["hll_abs_err_permille"] = (
            abs(card["est_distinct_docs"] - exact) * 1000
            // max(exact, 1))
    if args.previous:
        prev = spark.read.parquet(args.previous)
        dr = corpus_drift(prev, df, k=10,
                          tokens_col=args.tokens_col).collect()
        card["drift_vs_previous"] = {
            "l1_drift_ppm": int(dr[0]["l1_drift_ppm"]) if dr else 0,
            "top_movers": [{"tok": int(r["tok"]),
                            "ppm_old": int(r["ppm_old"]),
                            "ppm_new": int(r["ppm_new"]),
                            "delta_ppm": int(r["delta_ppm"])}
                           for r in dr],
        }
    card["wall_sec"] = round(time.time() - t0, 2)
    with open(args.output, "w") as f:
        json.dump(card, f, indent=1)
    print(json.dumps(card))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
