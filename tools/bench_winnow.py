"""Winnowing-at-volume evidence: winnow_fingerprints /
winnow_overlap_pairs at hundreds of thousands to millions of docs.

The oracled queries (`winnow_fingerprint_digest`,
`winnow_overlap_pairs`) verify exact selection semantics; this script
evidences the scale claims (operators/tokens.py docstrings):

  1. fingerprint derivation is MAP-ONLY — its stage graph shows no
     exchange before the explode (asserted on the plan string here,
     not just in unit tests);
  2. the detection GUARANTEE holds at volume: every planted near-dup
     (one substituted token => shared runs >> w+k-1) MUST pair with
     its base at min_shared=1 — recall is gated at exactly 1.0, the
     SIGMOD'03 theorem, not a statistical target;
  3. pair-stage shuffle bytes track rows (the exchanges carry 16-byte
     fingerprint rows, never content). Gate on bytes, not walls
     (NOTES.md measurement rules).

Reuses the dedup corpus generator (tools/bench_dedup.corpus_sql):
docs [n_base, n) are a pseudo-random base doc with ONE substituted
token, so each dup shares a contiguous run of >= ~15 tokens with its
base — far above the w+k-1 = 7 guarantee floor.

Usage:
    python tools/bench_winnow.py --sizes 400000,1600000 \
        [--dup-frac 0.1] [--out /tmp/winnow_vol] [--md BENCH/DEDUP.md] \
        [--gate]
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

K, W = 4, 4
MAX_FP_FREQ = 32


def run_size(n_docs: int, dup_frac: float, out: str) -> dict:
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.tokens import (
        winnow_fingerprints, winnow_overlap_pairs,
    )
    from fluent_bit_spark.session import get_spark

    cores = os.cpu_count() or 8
    # fp rows ~= 2/(w+1) * ~45 grams/doc; size reduce tasks ~4M rows
    shuf = max(4 * cores, min(2048, n_docs * 18 // 4_000_000))
    spark = get_spark(app_name=f"bench_winnow_{n_docs}",
                      shuffle_partitions=shuf,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4040"})
    res: dict = {"n_docs": n_docs, "k": K, "w": W,
                 "dup_frac": dup_frac, "shuffle_partitions": shuf}
    marks = [(0, 0)]

    def phase(name: str, t0: float) -> None:
        rd, wr = shuffle_totals()
        res[f"{name}_wall_s"] = round(time.time() - t0, 1)
        res[f"{name}_shuffle_read_mb"] = round((rd - marks[-1][0]) / 2**20, 1)
        res[f"{name}_shuffle_write_mb"] = round((wr - marks[-1][1]) / 2**20, 1)
        marks.append((rd, wr))

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    spark.range(n_docs).createOrReplaceTempView("rng")
    spark.sql(corpus_sql(n_docs, dup_frac)).write.mode("overwrite") \
        .parquet(f"{out}/docs")
    phase("gen", t0)

    docs = (spark.read.parquet(f"{out}/docs")
            .select("doc_id", F.split("text", " ").alias("tokens")))

    # 1) map-only fingerprint derivation (count = one pass)
    fp = winnow_fingerprints(docs, "doc_id", "tokens", k=K, w=W)
    plan = fp._jdf.queryExecution().executedPlan().toString()
    res["fp_plan_map_only"] = ("Exchange" not in plan
                               and "Python" not in plan)
    t0 = time.time()
    n_fp = fp.count()
    phase("fp", t0)
    n_grams = docs.agg(
        F.sum(F.greatest(F.size("tokens") - (K - 1), F.lit(0)))
    ).first()[0]
    res["n_fingerprints"] = int(n_fp)
    res["n_grams"] = int(n_grams)
    res["fp_density"] = round(n_fp / n_grams, 4)   # ~2/(w+1) expected
    res["fp_docs_per_sec"] = round(n_docs / res["fp_wall_s"], 1)

    # 2) pair generation + planted recall (the theorem gate)
    t0 = time.time()
    winnow_overlap_pairs(docs, "doc_id", "tokens", k=K, w=W,
                         min_shared=1, max_fp_freq=MAX_FP_FREQ) \
        .write.mode("overwrite").parquet(f"{out}/pairs")
    phase("pairs", t0)

    pairs = spark.read.parquet(f"{out}/pairs")
    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    planted = (spark.range(n_base, n_docs)
               .select(F.expr(f"pmod(id * 1103515245 + 12345, {n_base})")
                       .alias("id_a"), F.col("id").alias("id_b"))
               .filter("id_a != id_b"))
    found = planted.join(pairs, ["id_a", "id_b"], "left_semi").count()
    n_planted = planted.count()
    res["n_planted"] = int(n_planted)
    res["planted_found"] = int(found)
    res["planted_recall"] = round(found / max(n_planted, 1), 6)
    res["n_pairs"] = pairs.count()
    res["pairs_docs_per_sec"] = round(n_docs / res["pairs_wall_s"], 1)
    spark.stop()
    return res


def run_vs_corpus(n_corpus: int, n_batch: int, out: str) -> dict:
    """Incremental-probe volume evidence (winnow_vs_corpus): a FIXED
    prebuilt corpus fp artifact (with its maintained freq table, the
    production posture) probed by a batch where half the docs are
    planted near-dups of corpus docs. Claims evidenced:

      1. every planted dup is DROPPED at min_shared=1 (the SIGMOD'03
         guarantee carried through the incremental path), and every
         fresh doc survives — drop recall and survivor precision both
         exactly 1.0;
      2. the probe's shuffle volume tracks the BATCH, not the corpus:
         holding the corpus fixed and growing the batch R×, probe
         shuffle bytes grow ≲ R× (the corpus-side fp exchange is the
         constant term a bucketed production table removes entirely).
    """
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.tokens import (
        winnow_corpus_fp, winnow_vs_corpus,
    )
    from fluent_bit_spark.session import get_spark

    cores = os.cpu_count() or 8
    shuf = max(4 * cores, min(2048, (n_corpus + n_batch) * 18 // 4_000_000))
    spark = get_spark(app_name=f"bench_winnow_vs_{n_corpus}_{n_batch}",
                      shuffle_partitions=shuf,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4040"})
    res: dict = {"n_corpus": n_corpus, "n_batch": n_batch,
                 "k": K, "w": W, "shuffle_partitions": shuf}
    shutil.rmtree(out, ignore_errors=True)

    # corpus = base docs [0, n_corpus); batch = n_batch docs, half
    # planted dups of corpus docs (one substituted token → shared runs
    # >> w+k-1), half fresh (disjoint token ids)
    n_dup = n_batch // 2
    spark.range(n_corpus + n_dup).createOrReplaceTempView("rng")
    gen = spark.sql(corpus_sql(n_corpus + n_dup,
                               n_dup / (n_corpus + n_dup)))
    gen.filter(F.col("doc_id") < n_corpus).write.mode("overwrite") \
        .parquet(f"{out}/corpus")
    gen.filter(F.col("doc_id") >= n_corpus) \
        .withColumn("planted", F.lit(True)).write.mode("overwrite") \
        .parquet(f"{out}/dups")
    fresh = spark.range(n_batch - n_dup).select(
        (F.col("id") + n_corpus + n_dup).alias("doc_id"),
        F.concat_ws(" ", F.array([
            F.concat(F.lit(f"fr{j}_"), F.col("id").cast("string"))
            for j in range(40)])).alias("text"),
        F.lit(False).alias("planted"))
    fresh.write.mode("append").parquet(f"{out}/dups")

    tokize = lambda df: df.withColumn("tokens", F.split("text", " "))
    t0 = time.time()
    corpus_fp = winnow_corpus_fp(
        tokize(spark.read.parquet(f"{out}/corpus")), k=K, w=W)
    corpus_fp.write.mode("overwrite").parquet(f"{out}/fps")
    corpus_fp = spark.read.parquet(f"{out}/fps")
    freq = corpus_fp.groupBy("fp").agg(F.count("*").alias("n_docs"))
    freq.write.mode("overwrite").parquet(f"{out}/freq")
    freq = spark.read.parquet(f"{out}/freq")
    res["artifact_wall_s"] = round(time.time() - t0, 1)

    batch = tokize(spark.read.parquet(f"{out}/dups"))
    rd0, wr0 = shuffle_totals()
    t0 = time.time()
    winnow_vs_corpus(batch, corpus_fp, k=K, w=W, min_shared=1,
                     max_fp_freq=MAX_FP_FREQ, corpus_freq=freq) \
        .write.mode("overwrite").parquet(f"{out}/deduped")
    rd1, wr1 = shuffle_totals()
    res["probe_wall_s"] = round(time.time() - t0, 1)
    res["probe_shuffle_read_mb"] = round((rd1 - rd0) / 2**20, 1)
    res["probe_shuffle_write_mb"] = round((wr1 - wr0) / 2**20, 1)
    res["probe_docs_per_sec"] = round(n_batch / res["probe_wall_s"], 1)

    surv = spark.read.parquet(f"{out}/deduped")
    n_surv_fresh = surv.filter(~F.col("planted")).count()
    n_surv_dup = surv.filter(F.col("planted")).count()
    res["n_fresh"] = n_batch - n_dup
    res["n_planted"] = n_dup
    res["fresh_survived"] = int(n_surv_fresh)
    res["planted_survived"] = int(n_surv_dup)
    res["drop_recall"] = round(1.0 - n_surv_dup / max(n_dup, 1), 6)
    res["fresh_precision"] = round(
        n_surv_fresh / max(n_batch - n_dup, 1), 6)
    spark.stop()
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="400000,1600000")
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--out", default="/tmp/winnow_vol")
    ap.add_argument("--md", default=None)
    ap.add_argument("--gate", action="store_true")
    ap.add_argument("--vs-corpus", action="store_true",
                    help="incremental-probe mode: --sizes is the FIXED "
                         "corpus size; batches of size/8 and size/2 "
                         "probe it (cost-∝-batch + guarantee gates)")
    args = ap.parse_args()

    if args.vs_corpus:
        n_corpus = int(args.sizes.split(",")[0])
        results = []
        for n_batch in (n_corpus // 8, n_corpus // 2):
            r = run_vs_corpus(n_corpus, n_batch,
                              f"{args.out}/vs_{n_batch}")
            print(json.dumps(r))
            results.append(r)
        a, b = results
        ratio = b["n_batch"] / a["n_batch"]
        shuf_x = (b["probe_shuffle_write_mb"]
                  / max(a["probe_shuffle_write_mb"], 0.1))
        ok = (a["drop_recall"] == 1.0 and b["drop_recall"] == 1.0
              and a["fresh_precision"] == 1.0
              and b["fresh_precision"] == 1.0
              and shuf_x <= ratio * 1.3)
        print(json.dumps({"gate": "ok" if ok else "FAIL",
                          "batch_x": ratio,
                          "probe_shuffle_x": round(shuf_x, 2)}))
        if args.md:
            lines = [
                "", f"## Winnowing vs-corpus probe run "
                f"{time.strftime('%Y-%m-%d')} (corpus {n_corpus:,}, "
                f"k={K}, w={W}, min_shared=1)", "",
                "| batch | artifact s | probe s | probe shuffle R/W MB"
                " | drop recall | fresh precision | batch docs/s |",
                "|" + "---|" * 7]
            for r in results:
                lines.append(
                    f"| {r['n_batch']:,} | {r['artifact_wall_s']} | "
                    f"{r['probe_wall_s']} | "
                    f"{r['probe_shuffle_read_mb']}/"
                    f"{r['probe_shuffle_write_mb']} | "
                    f"{r['drop_recall']} | {r['fresh_precision']} | "
                    f"{r['probe_docs_per_sec']:,} |")
            lines += [
                "", f"{ratio:.0f}× batch vs a fixed {n_corpus:,}-doc "
                f"corpus → {shuf_x:.1f}× probe shuffle write: the "
                f"probe's exchange volume tracks the BATCH (the "
                f"corpus-side fp exchange is the constant term a "
                f"bucketed production fps table removes); every "
                f"planted dup dropped and every fresh doc kept at "
                f"min_shared=1 — the detection guarantee survives the "
                f"incremental path, gated not sampled.", ""]
            with open(args.md, "a") as f:
                f.write("\n".join(lines))
        return 0 if ok else 3

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        r = run_size(n, args.dup_frac, f"{args.out}/{n}")
        print(json.dumps(r))
        results.append(r)

    if args.gate:
        for r in results:
            if r["planted_recall"] != 1.0:
                print(json.dumps({"gate": "FAIL",
                                  "why": "guarantee violated",
                                  "n_docs": r["n_docs"],
                                  "recall": r["planted_recall"]}))
                return 3
            if not r["fp_plan_map_only"]:
                print(json.dumps({"gate": "FAIL",
                                  "why": "fingerprint plan not map-only",
                                  "n_docs": r["n_docs"]}))
                return 3
        if len(results) >= 2:
            a, b = results[-2], results[-1]
            ratio = b["n_docs"] / a["n_docs"]
            shuf_x = (b["pairs_shuffle_write_mb"]
                      / max(a["pairs_shuffle_write_mb"], 0.1))
            if shuf_x > ratio * 1.3:
                print(json.dumps({"gate": "FAIL",
                                  "why": "super-linear shuffle write",
                                  "rows_x": ratio, "shuffle_x": shuf_x}))
                return 3
            print(json.dumps({"gate": "ok", "rows_x": ratio,
                              "shuffle_x": round(shuf_x, 2),
                              "recall": b["planted_recall"]}))

    if args.md and len(results) >= 2:
        a, b = results[-2], results[-1]
        ratio = b["n_docs"] / a["n_docs"]
        lines = [
            "", f"## Winnowing volume run {time.strftime('%Y-%m-%d')} "
            f"(sizes {args.sizes}, k={K}, w={W}, "
            f"dup_frac {args.dup_frac})", "",
            "| n_docs | fp s | fp density | pairs s | planted recall | "
            "pairs shuffle R/W MB | pairs docs/s |",
            "|" + "---|" * 7]
        for r in results:
            lines.append(
                f"| {r['n_docs']:,} | {r['fp_wall_s']} | "
                f"{r['fp_density']} | {r['pairs_wall_s']} | "
                f"{r['planted_recall']} | "
                f"{r['pairs_shuffle_read_mb']}/"
                f"{r['pairs_shuffle_write_mb']} | "
                f"{r['pairs_docs_per_sec']:,} |")
        wall_x = b["pairs_wall_s"] / max(a["pairs_wall_s"], 0.1)
        shuf_x = (b["pairs_shuffle_write_mb"]
                  / max(a["pairs_shuffle_write_mb"], 0.1))
        lines += [
            "", f"{ratio:.0f}× rows → {wall_x:.1f}× wall, {shuf_x:.1f}× "
            f"shuffle write on the pair stage; fingerprint derivation "
            f"map-only (plan-asserted) at density "
            f"~{b['fp_density']} of grams (theory 2/(w+1) = "
            f"{2/(W+1):.2f}); planted-pair recall exactly 1.0 at both "
            f"sizes — the SIGMOD'03 detection guarantee, gated, not "
            f"sampled.", ""]
        with open(args.md, "a") as f:
            f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
