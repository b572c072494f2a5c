"""Incremental-dedup-at-volume evidence: dedup_vs_corpus with planted
truth at millions of corpus docs.

The claim under test is the 100 TB one: deduping a NEW batch against
an existing corpus costs ~(batch + corpus-artifact join), never a
corpus re-read/re-shingle. This harness, at each (corpus, batch) size:

  1. generates a deterministic original-only corpus (bench_dedup's
     hashed-token generator, dup_frac=0) and a new batch where class
     n%10 ∈ {0,1} is an EXACT copy of a corpus doc, {2,3} a one-token
     near-dup of one, {4..9} fresh text from a disjoint seed space;
  2. precomputes corpus artifacts (hashes + MinHash sigs) — timed as
     its own phase because production amortizes it across batches;
  3. runs dedup_vs_corpus and scores drops against the planted truth
     BY ID CLASS: exact-copy drops must be total, fresh false-drops
     zero (both hard asserts → non-zero exit), near-dup recall is
     REPORTED (estimator-based: 16-perm est_jaccard ≥ 0.5 on ~0.9
     true Jaccard is near-certain per doc but not guaranteed).

Scaling evidence: run with a fixed batch at 2 corpus sizes (artifact
join growth only) and a fixed corpus at 2 batch sizes (batch-linear).

Usage:
    python tools/bench_vscorpus.py --pairs 1600000:160000,6400000:160000,1600000:640000 \
        [--out /tmp/vscorpus_vol] [--md BENCH/DEDUP.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_dedup import corpus_sql, shuffle_totals  # noqa: E402

VOCAB = 50_000
FRESH_OFFSET = 10 ** 12


def batch_sql(n_batch: int, n_corpus: int) -> str:
    """New-batch table over spark.range(n_batch): ids are n+OFFSET so
    they never collide with corpus doc_ids; token formulas mirror
    tools.bench_dedup.corpus_sql exactly for the copy/near classes."""
    return f"""
    SELECT id + {FRESH_OFFSET} AS doc_id, cls,
           concat_ws(' ', transform(sequence(0, L - 1), j ->
             concat('w', CASE
               WHEN cls = 'near' AND j = pmod(id, L)
                 THEN pmod(xxhash64(id, j), {VOCAB}) + {VOCAB}
               WHEN cls = 'fresh'
                 THEN pmod(xxhash64(id + {FRESH_OFFSET}, j), {VOCAB})
               ELSE pmod(xxhash64(base, j), {VOCAB})
             END))) AS text
    FROM (
      SELECT id, base, cls,
             CAST(30 + pmod(CASE WHEN cls = 'fresh' THEN id + {FRESH_OFFSET}
                                 ELSE base END * 7919, 31) AS INT) AS L
      FROM (
        SELECT id,
               CASE WHEN pmod(id, 10) < 2 THEN 'exact'
                    WHEN pmod(id, 10) < 4 THEN 'near'
                    ELSE 'fresh' END AS cls,
               pmod(id * 1103515245 + 12345, {n_corpus}) AS base
        FROM rng))
    """


def run_pair(n_corpus: int, n_batch: int, out: str) -> dict:
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators import dedup as DD
    from fluent_bit_spark.session import get_spark

    shuf = max(32, min(512, n_corpus // 125_000))
    spark = get_spark(app_name=f"bench_vscorpus_{n_corpus}_{n_batch}",
                      shuffle_partitions=shuf,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4040"})
    res: dict = {"n_corpus": n_corpus, "n_batch": n_batch}
    marks = [(0, 0)]

    def phase(name: str, t0: float) -> None:
        rd, wr = shuffle_totals()
        res[f"{name}_wall_s"] = round(time.time() - t0, 1)
        res[f"{name}_shuffle_read_mb"] = round((rd - marks[-1][0]) / 2**20, 1)
        res[f"{name}_shuffle_write_mb"] = round((wr - marks[-1][1]) / 2**20, 1)
        marks.append((rd, wr))

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    spark.range(n_corpus).createOrReplaceTempView("rng")
    spark.sql(corpus_sql(n_corpus, 0.0)) \
        .write.mode("overwrite").parquet(f"{out}/corpus")
    spark.range(n_batch).createOrReplaceTempView("rng")
    spark.sql(batch_sql(n_batch, n_corpus)) \
        .write.mode("overwrite").parquet(f"{out}/batch")
    phase("gen", t0)

    corpus = spark.read.parquet(f"{out}/corpus")
    batch = spark.read.parquet(f"{out}/batch")

    t0 = time.time()
    hashes, sigs = DD.corpus_artifacts(corpus, "doc_id", "text")
    hashes.write.mode("overwrite").parquet(f"{out}/art/hashes")
    sigs.write.mode("overwrite").parquet(f"{out}/art/sigs")
    phase("artifacts", t0)

    t0 = time.time()
    hashes = spark.read.parquet(f"{out}/art/hashes")
    sigs = spark.read.parquet(f"{out}/art/sigs")
    survivors = DD.dedup_vs_corpus(batch, "doc_id", "text", hashes, sigs,
                                   num_perm=16, bands=4, threshold=0.5)
    survivors.write.mode("overwrite").parquet(f"{out}/deduped")
    phase("dedup", t0)

    surv = spark.read.parquet(f"{out}/deduped")
    counts = {r["cls"]: r["n"] for r in
              surv.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    planted = {r["cls"]: r["n"] for r in
               batch.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    res["planted"] = planted
    res["survived"] = counts
    res["exact_dropped"] = planted.get("exact", 0) - counts.get("exact", 0)
    res["fresh_false_drops"] = planted.get("fresh", 0) - counts.get("fresh", 0)
    near_total = planted.get("near", 0)
    res["near_recall"] = round(
        (near_total - counts.get("near", 0)) / near_total, 4) \
        if near_total else None
    res["batch_docs_per_sec"] = round(n_batch / res["dedup_wall_s"], 1)
    spark.stop()

    ok = (res["exact_dropped"] == planted.get("exact", 0)
          and res["fresh_false_drops"] == 0)
    res["truth_ok"] = ok
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="1600000:160000,6400000:160000",
                    help="comma list of corpus:batch sizes")
    ap.add_argument("--out", default="/tmp/vscorpus_vol")
    ap.add_argument("--md", default=None, help="append a markdown report")
    args = ap.parse_args()

    results = []
    for spec in args.pairs.split(","):
        c, b = (int(x) for x in spec.split(":"))
        r = run_pair(c, b, f"{args.out}/{c}_{b}")
        print(json.dumps(r))
        results.append(r)

    if args.md:
        lines = [
            "",
            f"## vs-corpus incremental dedup volume run "
            f"(pairs {args.pairs})",
            "",
            "| corpus | batch | artifacts s | dedup s | dedup shuffle "
            "R/W MB | exact dropped | near recall | false drops | "
            "batch docs/s |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for r in results:
            lines.append(
                f"| {r['n_corpus']:,} | {r['n_batch']:,} "
                f"| {r['artifacts_wall_s']} | {r['dedup_wall_s']} "
                f"| {r['dedup_shuffle_read_mb']}/"
                f"{r['dedup_shuffle_write_mb']} "
                f"| {r['exact_dropped']} ({r['truth_ok']}) "
                f"| {r['near_recall']} | {r['fresh_false_drops']} "
                f"| {r['batch_docs_per_sec']:,} |")
        with open(args.md, "a") as f:
            f.write("\n".join(lines) + "\n")

    return 0 if all(r["truth_ok"] for r in results) else 2


if __name__ == "__main__":
    raise SystemExit(main())
