"""Dedup operator goldens (training-pipeline extensions; see
operators/dedup.py scale notes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.dedup import (
    exact_dedup, minhash_lsh_pairs, minhash_signature, simhash_pairs,
)

TEXTS = [
    ("d1", "the quick brown fox jumps over the lazy dog again and again"),
    ("d2", "the quick brown fox jumps over the lazy dog again and AGAIN"),
    ("d3", "completely unrelated content about spark shuffle partitions"),
    ("d4", "the quick brown fox jumps over the lazy dog again and again"),
]


def test_minhash_signature_positions_are_independent(spark):
    """Each permutation must use its own seed — a regression guard for
    the arity-2 transform-lambda pitfall (index shadowing the seed)."""
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    sigs = minhash_signature(df, "doc_id", "text", num_perm=16).collect()
    for r in sigs:
        assert len(set(r.sig)) > 8, f"degenerate signature for {r.doc}"
    by_doc = {r.doc: list(r.sig) for r in sigs}
    assert by_doc["d1"] == by_doc["d4"]          # identical text
    assert by_doc["d1"] != by_doc["d3"]


def test_minhash_lsh_finds_near_dup_pairs(spark):
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    pairs = {(r.d1, r.d2): r.est_jaccard
             for r in minhash_lsh_pairs(df, "doc_id", "text",
                                        threshold=0.5).collect()}
    assert ("d1", "d4") in pairs and pairs[("d1", "d4")] == 1.0
    assert ("d1", "d2") in pairs          # one-word change → near dup
    assert not any("d3" in p for p in pairs)


def test_simhash_hamming(spark):
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    got = {(r.d1, r.d2): r.hamming
           for r in simhash_pairs(df, "doc_id", "text",
                                  max_hamming=32).collect()}
    assert got.get(("d1", "d4")) == 0
    assert got.get(("d1", "d2")) == 0      # one-case change: no bit flips
    # the unrelated doc shares no band bucket → never even a candidate
    assert not any("d3" in p for p in got)


def test_exact_dedup_keeps_lowest_tiebreak(spark):
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    kept = {r.doc_id for r in
            exact_dedup(df, ["text"], tiebreak="doc_id").collect()}
    assert kept == {"d1", "d2", "d3"}     # d4 drops (same text as d1)


def test_resolve_duplicate_groups(spark):
    """Chain + star + singleton components: min-label propagation must
    converge across the 4-hop chain, label every member with the
    component minimum, and keep exactly the minimum id per group."""
    from fluent_bit_spark.operators.dedup import resolve_duplicate_groups
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(1, 10)], "doc_id string")
    pairs = spark.createDataFrame(
        # chain d1-d2-d3-d4-d5 (diameter 4), star d6-{d7,d8}, d9 alone
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4"), ("d4", "d5"),
         ("d6", "d7"), ("d6", "d8")],
        "d1 string, d2 string")
    got = {r.doc_id: (r.canonical_id, r.keep)
           for r in resolve_duplicate_groups(docs, pairs).collect()}
    assert len(got) == 9
    for d in ["d1", "d2", "d3", "d4", "d5"]:
        assert got[d] == ("d1", d == "d1")
    for d in ["d6", "d7", "d8"]:
        assert got[d] == ("d6", d == "d6")
    assert got["d9"] == ("d9", True)


def test_resolve_groups_matches_union_find(spark):
    """Randomized (seeded) cross-check: min-label propagation equals a
    plain python union-find on a 200-node / 240-edge random graph."""
    import random
    from fluent_bit_spark.operators.dedup import resolve_duplicate_groups
    rng = random.Random(7)
    n = 200
    edges = [(f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
             for _ in range(240)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {f"n{i:03d}": f"n{i:03d}" for i in range(n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: min(y for y in parent if find(y) == find(x))
            for x in parent}

    docs = spark.createDataFrame([(k,) for k in parent], "doc_id string")
    pairs = spark.createDataFrame(edges, "d1 string, d2 string")
    got = {r.doc_id: r.canonical_id
           for r in resolve_duplicate_groups(docs, pairs).collect()}
    assert got == want


def test_resolve_groups_nonconvergence_raises(spark):
    """A component chain longer than max_iters must raise, not return a
    partially propagated (silently wrong) labeling (ADVICE r2)."""
    import pytest as _pytest
    from fluent_bit_spark.operators.dedup import resolve_duplicate_groups
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(6)], "doc_id string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(5)], "d1 string, d2 string")
    with _pytest.raises(RuntimeError, match="did not converge"):
        resolve_duplicate_groups(docs, pairs, max_iters=1)
    # and with enough rounds the same chain resolves to one component
    out = resolve_duplicate_groups(docs, pairs, max_iters=10)
    assert {r.canonical_id for r in out.collect()} == {"d0"}


SF001_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_lsh_verified_xxhash64_equals_portable(spark):
    """Correctness gate for the xxhash64 (production-speed) MinHash/LSH
    family, which has no SQL oracle: after exact-Jaccard verification
    at the threshold, its verified pair set must EQUAL the
    DuckDB-oracled portable family's — the hash family only affects
    candidate generation, never which true pairs survive verify."""
    from fluent_bit_spark.operators.dedup import lsh_verified_pairs
    docs = spark.read.parquet(SF001_DOCS)
    kw = dict(num_perm=16, bands=4, cand_threshold=0.2,
              jaccard_threshold=0.5)
    xx = {(r.d1, r.d2) for r in lsh_verified_pairs(
        docs, "doc_id", "text", hash_fn="xxhash64", **kw).collect()}
    po = {(r.d1, r.d2) for r in lsh_verified_pairs(
        docs, "doc_id", "text", hash_fn="portable", **kw).collect()}
    assert xx == po
    assert len(xx) == 28            # deterministic corpus, pinned


def test_simhash_xxhash64_recall_parity(spark):
    """SimHash recall depends on the hash family (different families
    bucket different true pairs), so the xxhash64 gate is recall
    parity vs ground truth, not set equality: every verified pair is a
    true near-dup, and both families recover >85% of what either
    finds. Counts pinned — the corpus and both hash families are
    deterministic."""
    from fluent_bit_spark.operators.dedup import (
        ngram_jaccard_pairs, simhash_pairs,
    )
    docs = spark.read.parquet(SF001_DOCS)
    truth = {(r.d1, r.d2) for r in ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3,
        allow_quadratic=True).collect()}
    kw = dict(bits=32, bands=4, max_hamming=3)
    cxx = {(r.d1, r.d2) for r in simhash_pairs(
        docs, "doc_id", "text", **kw).collect()}
    cpo = {(r.d1, r.d2) for r in simhash_pairs(
        docs, "doc_id", "text", hash_fn="portable", **kw).collect()}
    vxx, vpo = cxx & truth, cpo & truth
    assert (len(truth), len(vxx), len(vpo)) == (28, 24, 26)
    union = vxx | vpo
    assert len(vxx & vpo) / len(union) > 0.85
    assert min(len(vxx), len(vpo)) / len(truth) > 0.8


def test_resolve_groups_probe_every_identical_output(spark):
    """probe_every=k trades driver-side convergence probes for extra
    cheap rounds — the labeling must be identical to the per-round
    probe on a diameter-8 chain, and a probe cadence coarser than the
    needed rounds must still converge (the last-round probe fires)."""
    from fluent_bit_spark.operators.dedup import resolve_duplicate_groups
    import pytest as _pytest
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(9)] + [("z9",)], "doc_id string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(8)], "d1 string, d2 string")
    want = sorted(map(tuple, resolve_duplicate_groups(
        docs, pairs, max_iters=12).collect()))
    got = sorted(map(tuple, resolve_duplicate_groups(
        docs, pairs, max_iters=12, probe_every=4).collect()))
    assert got == want
    assert {t[1] for t in got} == {"d0", "z9"}
    with _pytest.raises(ValueError, match="probe_every"):
        resolve_duplicate_groups(docs, pairs, probe_every=0)


def test_dedup_vs_corpus_planted_truth(spark):
    """Incremental ingest: exact copies and near-dups OF CORPUS DOCS
    are dropped; fresh docs and within-batch self-dups survive (self
    dedup is explicitly out of scope — composed separately)."""
    from fluent_bit_spark.operators.dedup import (
        corpus_artifacts, dedup_vs_corpus,
    )
    corpus = spark.createDataFrame([
        ("c1", "the quick brown fox jumps over the lazy dog again and "
               "again today"),
        ("c2", "completely unrelated content about spark shuffle "
               "partitions and skew"),
    ], "doc_id string, text string")
    new = spark.createDataFrame([
        # exact copy of c1 → exact-stage drop
        ("n1", "the quick brown fox jumps over the lazy dog again and "
               "again today"),
        # one-word edit of c1 → near-dup drop
        ("n2", "the quick brown fox jumps over the lazy dog again and "
               "AGAIN today"),
        # fresh
        ("n3", "fresh document about watermark semantics in structured "
               "streaming state stores"),
        # exact twin of n3 WITHIN the batch → must both survive
        ("n4", "fresh document about watermark semantics in structured "
               "streaming state stores"),
    ], "doc_id string, text string")
    for fn in ("xxhash64", "portable"):
        hashes, sigs = corpus_artifacts(corpus, "doc_id", "text",
                                        hash_fn=fn)
        # bands=8 (2-row bands): at bands=4 this particular n2↔c1 pair
        # estimates 9/16 ≥ 0.5 but no 4-row band slice is fully equal —
        # a faithful LSH candidate miss (recall/bands tradeoff), not a
        # bug; the sf-scale oracle reproduces the banding exactly.
        out = dedup_vs_corpus(new, "doc_id", "text", hashes, sigs,
                              bands=8, threshold=0.5, hash_fn=fn)
        assert sorted(r.doc_id for r in out.collect()) == ["n3", "n4"], fn
        # schema passthrough: every new column, unchanged
        assert out.columns == new.columns


def test_dedup_vs_corpus_no_corpus_text_rescans(spark):
    """The production contract: once artifacts exist, the plan for the
    survivor frame must not reference the corpus relation's text —
    only the narrow hash/signature frames."""
    from fluent_bit_spark.operators.dedup import (
        corpus_artifacts, dedup_vs_corpus,
    )
    corpus = spark.createDataFrame(
        [("c1", "alpha beta gamma delta")], "doc_id string, text string")
    new = spark.createDataFrame(
        [("n1", "epsilon zeta eta theta iota")],
        "doc_id string, text string")
    hashes, sigs = corpus_artifacts(corpus, "doc_id", "text")
    # materialized artifacts, as a maintained table would be
    hashes = spark.createDataFrame(hashes.collect(), hashes.schema)
    sigs = spark.createDataFrame(sigs.collect(), sigs.schema)
    out = dedup_vs_corpus(new, "doc_id", "text", hashes, sigs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "alpha" not in plan  # corpus text absent from the lineage
    assert sorted(r.doc_id for r in out.collect()) == ["n1"]


def test_append_corpus_artifacts_equals_rebuild(spark):
    """Incremental maintenance: folding an accepted batch's artifact
    DELTAS into the corpus tables must make the next batch's dedup
    decisions identical to a from-scratch rebuild over corpus ∪
    accepted — and within-batch twins collapse to one artifact row."""
    from fluent_bit_spark.operators.dedup import (
        append_corpus_artifacts, corpus_artifacts, dedup_vs_corpus,
    )
    corpus = spark.createDataFrame([
        ("c1", "the quick brown fox jumps over the lazy dog again and "
               "again today"),
        ("c2", "completely unrelated content about spark shuffle "
               "partitions and skew"),
    ], "doc_id string, text string")
    batch1 = spark.createDataFrame([
        ("b1", "fresh document about watermark semantics in structured "
               "streaming state stores"),
        # exact twin of b1 WITHIN the batch (survives vs-corpus; the
        # artifact fold-in must still record its content ONCE)
        ("b2", "fresh document about watermark semantics in structured "
               "streaming state stores"),
        ("b3", "another fresh one on broadcast joins and adaptive "
               "query execution plans"),
    ], "doc_id string, text string")
    h0, s0 = corpus_artifacts(corpus, "doc_id", "text")
    surv1 = dedup_vs_corpus(batch1, "doc_id", "text", h0, s0, bands=8)
    assert sorted(r.doc_id for r in surv1.collect()) == ["b1", "b2", "b3"]

    dh, ds, dbt = append_corpus_artifacts(surv1, "doc_id", "text",
                                          bands=8)
    # within-batch twins b1/b2 → ONE hash row, ONE signature row
    assert dh.count() == 2 and ds.count() == 2
    assert dbt.count() == 2 * 8
    # delta hashes disjoint from the maintained table (the plain-append
    # invariant)
    assert dh.join(h0, dh["h"] == h0["h"]).count() == 0

    h1, s1 = h0.unionByName(dh), s0.unionByName(ds)
    batch2 = spark.createDataFrame([
        # exact copy of a batch-1 survivor → exact-stage drop now
        ("x1", "fresh document about watermark semantics in structured "
               "streaming state stores"),
        # near-dup (one-word edit) of b3 → near-stage drop
        ("x2", "another fresh one on broadcast joins and ADAPTIVE "
               "query execution plans"),
        # exact copy of original corpus doc → still dropped
        ("x3", "completely unrelated content about spark shuffle "
               "partitions and skew"),
        ("x4", "genuinely new text about per-partition checkpoint "
               "manifests and lineage"),
    ], "doc_id string, text string")
    surv2 = dedup_vs_corpus(batch2, "doc_id", "text", h1, s1, bands=8)
    # from-scratch rebuild over corpus ∪ accepted must agree exactly
    fh, fs = corpus_artifacts(corpus.unionByName(surv1),
                              "doc_id", "text")
    surv2_rebuild = dedup_vs_corpus(batch2, "doc_id", "text", fh, fs,
                                    bands=8)
    got = sorted(r.doc_id for r in surv2.collect())
    assert got == sorted(r.doc_id for r in surv2_rebuild.collect())
    assert got == ["x4"]


def test_run_dedup_artifacts_append_cli(spark, tmp_path, monkeypatch):
    """jobs/run_dedup.py incremental loop in-suite: artifacts →
    vs-corpus → artifacts-append (deltas folded in, bands included) →
    a second vs-corpus run drops dups of BOTH the original corpus and
    the first accepted batch."""
    import importlib
    import json as _json
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs"))
    run_dedup = importlib.import_module("run_dedup")

    def run(argv):
        printed = []
        monkeypatch.setattr(sys, "argv", ["run_dedup.py"] + argv)
        monkeypatch.setattr("builtins.print",
                            lambda s: printed.append(s))
        assert run_dedup.main() == 0
        return _json.loads(printed[-1])

    corpus_p = str(tmp_path / "corpus.parquet")
    b1_p = str(tmp_path / "b1.parquet")
    b2_p = str(tmp_path / "b2.parquet")
    art = str(tmp_path / "art")
    spark.createDataFrame(
        [("c1", "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id string, text string").write.parquet(corpus_p)
    spark.createDataFrame(
        [("b1", "iota kappa lambda mu nu xi omicron pi rho")],
        "doc_id string, text string").write.parquet(b1_p)
    spark.createDataFrame([
        ("x1", "iota kappa lambda mu nu xi omicron pi rho"),   # dup b1
        ("x2", "alpha beta gamma delta epsilon zeta eta theta"),  # dup c1
        ("x3", "sigma tau upsilon phi chi psi omega one two"),
    ], "doc_id string, text string").write.parquet(b2_p)

    run(["--input", corpus_p, "--output", art, "--mode", "artifacts",
         "--bands", "8"])
    r1 = run(["--input", b1_p, "--output", str(tmp_path / "o1"),
              "--mode", "vs-corpus", "--corpus-artifacts", art,
              "--bands", "8"])
    assert r1["rows_out"] == 1
    ra = run(["--input", str(tmp_path / "o1" / "deduped"),
              "--output", str(tmp_path / "unused"),
              "--mode", "artifacts", "--corpus-artifacts", art,
              "--bands", "8"])
    assert ra["mode"] == "artifacts-append" and ra["bands_appended"]
    r2 = run(["--input", b2_p, "--output", str(tmp_path / "o2"),
              "--mode", "vs-corpus", "--corpus-artifacts", art,
              "--bands", "8"])
    assert r2["rows_out"] == 1 and r2["dropped"] == 2
    kept = spark.read.parquet(str(tmp_path / "o2" / "deduped"))
    assert [r.doc_id for r in kept.collect()] == ["x3"]


def test_run_dedup_winnow_cli(spark, tmp_path, monkeypatch):
    """jobs/run_dedup.py --mode winnow: near-dups (shared run >= w+k-1
    words) are dropped via the fingerprint pair anti-join; the
    conservation exit code holds (survivors + dropped == input)."""
    import importlib
    import json as _json
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs"))
    run_dedup = importlib.import_module("run_dedup")
    shared = "lorem ipsum dolor sit amet consectetur adipiscing"
    docs_p = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out")
    spark.createDataFrame([
        ("d1", "a0 a1 a2 a3 a4 a5 " + shared),
        ("d2", "b0 b1 b2 b3 b4 b5 " + shared),       # near-dup of d1
        ("d3", "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
    ], "doc_id string, text string").write.parquet(docs_p)

    printed = []
    monkeypatch.setattr(sys, "argv", [
        "run_dedup.py", "--input", docs_p, "--output", out,
        "--mode", "winnow", "--winnow-shared", "1"])
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    assert run_dedup.main() == 0
    rec = _json.loads(printed[-1])
    assert rec["rows_in"] == 3 and rec["pairs"] >= 1
    assert rec["rows_dropped"] == 1
    assert rec["rows_out"] == 2
    kept = {r.doc_id for r in
            spark.read.parquet(f"{out}/deduped").collect()}
    assert kept == {"d1", "d3"}


def test_run_dedup_winnow_artifacts_cli(spark, tmp_path, monkeypatch):
    """jobs/run_dedup.py winnowing incremental loop: winnow-artifacts →
    winnow-vs-corpus (dup of corpus dropped) → artifact append of the
    survivors → second probe drops dups of BOTH the corpus and the
    first accepted batch; a conflicting --winnow-k on a probe errors
    instead of silently detecting nothing."""
    import importlib
    import json as _json
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs"))
    run_dedup = importlib.import_module("run_dedup")

    def run(argv):
        printed = []
        monkeypatch.setattr(sys, "argv", ["run_dedup.py"] + argv)
        monkeypatch.setattr("builtins.print",
                            lambda s: printed.append(s))
        assert run_dedup.main() == 0
        return _json.loads(printed[-1])

    shared_a = "alpha beta gamma delta epsilon zeta eta theta"
    shared_b = "iota kappa lambda mu nu xi omicron pi rho"
    corpus_p = str(tmp_path / "corpus.parquet")
    b1_p = str(tmp_path / "b1.parquet")
    b2_p = str(tmp_path / "b2.parquet")
    art = str(tmp_path / "wart")
    spark.createDataFrame(
        [("c1", "p0 p1 p2 p3 " + shared_a)],
        "doc_id string, text string").write.parquet(corpus_p)
    spark.createDataFrame(
        [("b1", "q0 q1 q2 q3 " + shared_b)],
        "doc_id string, text string").write.parquet(b1_p)
    spark.createDataFrame([
        ("x1", "r0 r1 r2 r3 " + shared_b),    # dup of accepted b1
        ("x2", "s0 s1 s2 s3 " + shared_a),    # dup of corpus c1
        ("x3", "t0 t1 t2 t3 u0 u1 u2 u3 v0 v1 v2 v3"),
    ], "doc_id string, text string").write.parquet(b2_p)

    run(["--input", corpus_p, "--output", art,
         "--mode", "winnow-artifacts"])
    r1 = run(["--input", b1_p, "--output", str(tmp_path / "w1"),
              "--mode", "winnow-vs-corpus", "--corpus-artifacts", art,
              "--winnow-shared", "1"])
    assert r1["rows_out"] == 1 and r1["dropped"] == 0
    ra = run(["--input", str(tmp_path / "w1" / "deduped"),
              "--output", str(tmp_path / "unused"),
              "--mode", "winnow-artifacts", "--corpus-artifacts", art])
    assert ra["mode"] == "winnow-artifacts-append"
    r2 = run(["--input", b2_p, "--output", str(tmp_path / "w2"),
              "--mode", "winnow-vs-corpus", "--corpus-artifacts", art,
              "--winnow-shared", "1"])
    assert r2["rows_out"] == 1 and r2["dropped"] == 2
    kept = spark.read.parquet(str(tmp_path / "w2" / "deduped"))
    assert [r.doc_id for r in kept.collect()] == ["x3"]

    # params contract: probing with a conflicting k must error loudly
    printed = []
    monkeypatch.setattr(sys, "argv", ["run_dedup.py",
                        "--input", b2_p,
                        "--output", str(tmp_path / "w3"),
                        "--mode", "winnow-vs-corpus",
                        "--corpus-artifacts", art, "--winnow-k", "7"])
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    with pytest.raises(SystemExit):
        run_dedup.main()

    # and a minhash artifact dir cannot be probed as a winnow one
    mart = str(tmp_path / "mart")
    run_m = ["--input", corpus_p, "--output", mart,
             "--mode", "artifacts", "--bands", "8"]
    monkeypatch.setattr(sys, "argv", ["run_dedup.py"] + run_m)
    assert run_dedup.main() == 0
    monkeypatch.setattr(sys, "argv", ["run_dedup.py",
                        "--input", b2_p,
                        "--output", str(tmp_path / "w4"),
                        "--mode", "winnow-vs-corpus",
                        "--corpus-artifacts", mart])
    with pytest.raises(SystemExit):
        run_dedup.main()


def test_lsh_plan_matches_independent_enumeration():
    """lsh_plan == an independently coded brute-force enumeration
    (different integration: midpoint Riemann on a finer mesh), and the
    equal-weight 0.5-threshold plan is the repo's 4x4 default."""
    from fluent_bit_spark.operators.dedup import (
        lsh_collision_prob, lsh_plan,
    )

    def brute(threshold, num_perm, fnw=1.0, fpw=1.0, n=20000):
        best = None
        for r in range(1, num_perm + 1):
            if num_perm % r:
                continue
            b = num_perm // r
            fn = fp = 0.0
            for i in range(n):
                s = (i + 0.5) / n
                p = 1.0 - (1.0 - s ** r) ** b
                if s < threshold:
                    fp += p / n
                else:
                    fn += (1.0 - p) / n
            err = fnw * fn + fpw * fp
            if best is None or err < best[0]:
                best = (err, b, r)
        return best[1], best[2]

    for t in (0.3, 0.5, 0.8):
        p = lsh_plan(t, 16)
        assert (p["bands"], p["rows"]) == brute(t, 16)
    assert (lsh_plan(0.5, 16)["bands"], lsh_plan(0.5, 16)["rows"]) \
        == (4, 4)   # the repo's num_perm=16/bands=4 default
    # verify-backed weighting trades fn down by banding wider
    pv = lsh_plan(0.5, 16, fp_weight=0.1)
    assert pv["bands"] > 4 and pv["fn_area"] < lsh_plan(0.5, 16)["fn_area"]
    # curve endpoints + monotonicity + closed-form s50
    assert lsh_collision_prob(0.0, 4, 4) == 0.0
    assert lsh_collision_prob(1.0, 4, 4) == 1.0
    pts = [lsh_collision_prob(s / 20, 4, 4) for s in range(21)]
    assert all(a <= b for a, b in zip(pts, pts[1:]))
    s50 = lsh_plan(0.5, 16)["s50"]
    assert abs(lsh_collision_prob(s50, 4, 4) - 0.5) < 1e-5  # s50 6-dp
    with pytest.raises(ValueError):
        lsh_plan(0.0, 16)
    with pytest.raises(ValueError):
        lsh_collision_prob(1.5, 4, 4)
