"""k-means / SemDeDup at volume: clustering scaling evidence plus
planted-twin semantic-dedup truth (extends the volume set: DEDUP.md
near-dup + substring, PACK.md, CLEAN.md, QUALITY.md).

Phase 1 — kmeans scaling: deterministic synthetic embeddings (dim 64,
components a pure function of (id, position)), fixed-iteration Lloyd's
via the broadcast-join assignment path (`assign="join"` — the large-k
shape). The only wide movement per iteration is the n-row argmin
exchange; the update exchange is k·dim longs. Gate: shuffle bytes grow
linearly with n.

Phase 2 — semdedup planted truth (fixed size): ~1% of vectors are
near-copies of their predecessor (component-wise +1e-4 — cosine
~0.9999). semdedup(tau=0.99) must drop EXACTLY the twin set: every
twin shares its original's cluster (identical up to jitter), no
organic pair reaches 0.99 in 64 dims. Any non-twin drop or missed twin
exits non-zero (a boundary-knife-edge cluster split of a twin pair is
theoretically possible, so the gate allows 0.5% misses — measured 0).

Usage:
    python tools/bench_kmeans.py --sizes 1000000,4000000 [--k 64]
        [--semdedup-n 200000] [--semdedup-k 400]
        [--out /tmp/kmeans_vol] [--md BENCH/DEDUP.md] [--gate]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_dedup import shuffle_totals  # noqa: E402

DIM = 64
TWIN_PCT = 1          # % of ids that are near-copies of id-1
JITTER = 1e-4


def corpus_sql(n: int) -> str:
    """Embeddings: component p of id = (xxhash64(id,p) mod 2001 - 1000)
    / 1000. A twin id copies id-1's ORGANIC components + JITTER; ids
    whose predecessor is itself a twin are excluded from twinning so
    the truth set is a pure function of the generator."""
    org = ("(CAST(pmod(xxhash64({i}, p), 2001) AS DOUBLE) - 1000.0) "
           "/ 1000.0")
    is_twin = (f"(id > 0 AND pmod(xxhash64(id, 23), 100) < {TWIN_PCT} "
               f"AND pmod(xxhash64(id - 1, 23), 100) >= {TWIN_PCT})")
    return f"""
    SELECT id AS vec_id,
           {is_twin} AS is_twin,
           transform(sequence(0, {DIM - 1}), p ->
             CASE WHEN {is_twin}
                  THEN {org.format(i='id - 1')} + {JITTER}
                  ELSE {org.format(i='id')} END) AS embedding
    FROM range({n}) t(id)
    """


def run_kmeans_size(n: int, k: int, out: str) -> dict:
    from fluent_bit_spark.operators.similarity import kmeans
    from fluent_bit_spark.session import get_spark

    cores = os.cpu_count() or 8
    spark = get_spark(app_name=f"bench_kmeans_{n}",
                      shuffle_partitions=max(2 * cores, 32),
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4040"})
    res: dict = {"n": n, "k": k, "dim": DIM}
    marks = [(0, 0)]

    def phase(name: str, t0: float) -> None:
        rd, wr = shuffle_totals()
        res[f"{name}_wall_s"] = round(time.time() - t0, 1)
        res[f"{name}_shuffle_read_mb"] = round((rd - marks[-1][0]) / 2**20, 1)
        res[f"{name}_shuffle_write_mb"] = round((wr - marks[-1][1]) / 2**20, 1)
        marks.append((rd, wr))

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    spark.sql(corpus_sql(n)).write.mode("overwrite").parquet(f"{out}/emb")
    phase("gen", t0)

    emb = spark.read.parquet(f"{out}/emb")
    t0 = time.time()
    got = kmeans(emb.select("vec_id", "embedding"), "vec_id", "embedding",
                 dim=DIM, k=k, iters=2, assign="join")
    got.select("vec_id", "cluster", "d2") \
       .write.mode("overwrite").parquet(f"{out}/assign")
    phase("kmeans", t0)

    a = spark.read.parquet(f"{out}/assign")
    res["rows_out"] = a.count()
    res["clusters_used"] = a.select("cluster").distinct().count()
    res["rows_ok"] = res["rows_out"] == n
    res["vec_per_sec"] = round(n / res["kmeans_wall_s"], 1)
    spark.stop()
    if not res["rows_ok"]:
        raise SystemExit(f"ROW LOSS: {res}")
    return res


def run_semdedup(n: int, k: int, out: str) -> dict:
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.similarity import semdedup
    from fluent_bit_spark.session import get_spark

    cores = os.cpu_count() or 8
    spark = get_spark(app_name=f"bench_semdedup_{n}",
                      shuffle_partitions=max(2 * cores, 32),
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4040"})
    res: dict = {"n": n, "k": k, "tau": 0.99}
    shutil.rmtree(out, ignore_errors=True)
    spark.sql(corpus_sql(n)).write.mode("overwrite").parquet(f"{out}/emb")
    emb = spark.read.parquet(f"{out}/emb")
    twins = {r["vec_id"] for r in
             emb.filter("is_twin").select("vec_id").collect()}
    res["twins_planted"] = len(twins)

    t0 = time.time()
    dropped = semdedup(emb.select("vec_id", "embedding"), "vec_id",
                       "embedding", dim=DIM, k=k, iters=2,
                       tau2_num=9801, tau2_den=10000)
    got = {r["vec_id"] for r in dropped.collect()}
    res["semdedup_wall_s"] = round(time.time() - t0, 1)
    res["dropped"] = len(got)
    res["false_drops"] = len(got - twins)
    res["missed_twins"] = len(twins - got)
    res["twin_recall"] = round(1 - res["missed_twins"]
                               / max(len(twins), 1), 4)
    spark.stop()
    if res["false_drops"] or res["twin_recall"] < 0.995:
        raise SystemExit(f"PLANTED-TWIN BREACH: {res}")
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,4000000")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--semdedup-n", type=int, default=200000)
    ap.add_argument("--semdedup-k", type=int, default=400)
    ap.add_argument("--out", default="/tmp/kmeans_vol")
    ap.add_argument("--md", default=None)
    ap.add_argument("--gate", action="store_true")
    args = ap.parse_args()

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        r = run_kmeans_size(n, args.k, f"{args.out}/{n}")
        print(json.dumps(r))
        results.append(r)
    sd = run_semdedup(args.semdedup_n, args.semdedup_k,
                      f"{args.out}/semdedup")
    print(json.dumps(sd))

    if args.gate and len(results) >= 2:
        a, b = results[-2], results[-1]
        ratio = b["n"] / a["n"]
        shuf_x = (b["kmeans_shuffle_write_mb"]
                  / max(a["kmeans_shuffle_write_mb"], 0.1))
        if shuf_x > ratio * 1.3:
            print(json.dumps({"gate": "FAIL",
                              "why": "super-linear kmeans shuffle",
                              "rows_x": ratio, "shuffle_x": shuf_x}))
            return 3
        print(json.dumps({"gate": "ok", "rows_x": ratio,
                          "shuffle_x": round(shuf_x, 2)}))

    if args.md and len(results) >= 2:
        a, b = results[-2], results[-1]
        ratio = b["n"] / a["n"]
        wall_x = b["kmeans_wall_s"] / max(a["kmeans_wall_s"], 0.1)
        shuf_x = (b["kmeans_shuffle_write_mb"]
                  / max(a["kmeans_shuffle_write_mb"], 0.1))
        lines = [
            "", f"## k-means / SemDeDup volume run "
            f"{time.strftime('%Y-%m-%d')} (sizes {args.sizes}, k {args.k}, "
            f"dim {DIM}, iters 2, join-assignment path)", "",
            "| n | kmeans s | shuffle R/W MB | clusters used | vec/s |",
            "|" + "---|" * 5]
        for r in results:
            lines.append(
                f"| {r['n']:,} | {r['kmeans_wall_s']} | "
                f"{r['kmeans_shuffle_read_mb']}/"
                f"{r['kmeans_shuffle_write_mb']} | "
                f"{r['clusters_used']} | {r['vec_per_sec']:,} |")
        lines += [
            "", f"{ratio:.0f}× rows → {wall_x:.1f}× kmeans wall, "
            f"{shuf_x:.1f}× shuffle (the only wide exchange is the n-row "
            "argmin combine; centroid update moves k·dim longs).",
            "", f"SemDeDup planted-twin truth at n={sd['n']:,} "
            f"(k={sd['k']}, tau=0.99): {sd['twins_planted']} planted "
            f"twins → {sd['dropped']} dropped, {sd['false_drops']} false "
            f"drops, twin recall {sd['twin_recall']} "
            f"({sd['semdedup_wall_s']}s).", ""]
        with open(args.md, "a") as f:
            f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
