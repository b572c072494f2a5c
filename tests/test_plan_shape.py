"""Physical-plan shape assertions (SURVEY.md §4.2) — the plans we
designed for, checked with .explain so regressions that silently
de-optimize (extra UDF evals, lost pushdown, shuffled lookup join)
fail loudly.

These are scale guarantees, not timings: at 10^12 rows the difference
between one ArrowEvalPython node and two is a second full pass of the
corpus through Python.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark import fixtures as fx
from fluent_bit_spark.operators.router import Route
from fluent_bit_spark.plans.pipeline import PipelineSpec, build_stages


@pytest.fixture(scope="module")
def routed_plan(spark, fixture_paths):
    spec = PipelineSpec(
        vocab=fx.vocab(),
        routes=[Route(*r) for r in fx.DEFAULT_ROUTES],
        lookup_path=fixture_paths["lookup"],
    )
    df = spark.read.parquet(fixture_paths["tokens"])
    routed = build_stages(spark, df, spec)
    return routed._jdf.queryExecution().executedPlan().toString()


def test_single_arrow_udf_pass(routed_plan):
    """detokenize + parse fuse into ONE Python/Arrow boundary — one
    Arrow round-trip for the whole parse stage (§4.2 item 3). The
    fused stage plans as a MapInArrow node; any ArrowEvalPython on top
    of it would mean a second pass of the corpus through Python."""
    boundaries = (routed_plan.count("ArrowEvalPython")
                  + routed_plan.count("MapInArrow")
                  + routed_plan.count("PythonMapInArrow"))
    assert boundaries == 1, routed_plan


def test_lookup_join_is_broadcast(routed_plan):
    """The enrich join must be broadcast, never a shuffled join
    (upstream filter_lookup is a per-record hash probe — the shuffle
    would be a 10^12-row exchange)."""
    assert "BroadcastHashJoin" in routed_plan
    assert "SortMergeJoin" not in routed_plan
    assert "ShuffledHashJoin" not in routed_plan


def test_no_shuffle_before_sinks(routed_plan):
    """parse→enrich→tag→route is a pure map chain: no Exchange above
    the scan (routing must not repartition; the only shuffles in the
    pipeline are the aggregate stages)."""
    assert "Exchange" not in routed_plan.replace("BroadcastExchange", "")


def test_scan_prunes_columns(spark, fixture_paths):
    """An aggregate-only query over the tokens table must not read
    ``tokens`` (ReadSchema pruning — §4.2 'critical')."""
    df = spark.read.parquet(fixture_paths["tokens"])
    plan = (df.groupBy("source").agg(F.sum("n_tok"))
            ._jdf.queryExecution().executedPlan().toString())
    schemas = [ln.split("ReadSchema:")[1] for ln in plan.splitlines()
               if "ReadSchema:" in ln]
    assert schemas and "tokens" not in schemas[0]


def test_filter_pushdown_reaches_scan(spark, fixture_paths):
    df = spark.read.parquet(fixture_paths["tokens"])
    plan = (df.filter(F.col("source") == "src1").select("doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src1)]" \
        in plan


def test_salted_agg_is_two_phase(spark, fixture_paths):
    """The salted aggregation must show partial aggregation below the
    exchange on (key, salt) and a final stage on the key alone."""
    from fluent_bit_spark.operators.aggregate import salted_sink_aggregates
    df = spark.read.parquet(fixture_paths["tokens"])
    plan = (salted_sink_aggregates(df, ["source"], salt_buckets=8)
            ._jdf.queryExecution().executedPlan().toString())
    # two aggregation layers → at least 4 HashAggregate nodes
    # (partial+final for the salted layer and for the de-salt layer)
    assert plan.count("HashAggregate") >= 4
    assert "xxhash64" in plan  # the salt expression survived planning


def test_grep_filter_stays_in_codegen(spark, fixture_paths):
    """grep predicates compile to JVM rlike, not python UDFs."""
    from fluent_bit_spark.operators.filters import GrepRule, grep
    df = spark.read.parquet(fixture_paths["tokens"])
    plan = (grep(df, [GrepRule("doc_id", "^doc1")], "AND")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "RLIKE" in plan or "rlike" in plan


def test_embedding_neardup_has_no_cross_join(spark):
    """The registered embedding near-dup operator must be the bucketed
    LSH path: every join in the plan is an equi-join on (band, bucket)
    or ids — a CartesianProduct / nested-loop join would be the O(n²)
    brute pair join, which is only allowed inside the DuckDB oracle."""
    from fluent_bit_spark.operators.similarity import lsh_banded_pairs
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(8)])
         for i in range(20)],
        "vec_id long, embedding array<double>")
    plan = (lsh_banded_pairs(df, "vec_id", "embedding", dim=8,
                             n_planes=4, n_bands=2, threshold=0.4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_is_map_only_plus_topk(spark):
    """IVF search must plan as one map-only scan (inline centroid argmax,
    probe filter, cosine) feeding TakeOrderedAndProject — no Exchange,
    no window, no join in the per-row path."""
    from fluent_bit_spark.operators.similarity import ivf_topk
    df = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 11) - 5.0 for j in range(8)])
         for i in range(1, 40)],
        "vec_id long, embedding array<double>")
    plan = (ivf_topk(df, "vec_id", "embedding",
                     [1.0] * 8, k=5, n_centroids=4, n_probe=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_range_lookup_is_broadcast_equi_join(spark):
    """The bucketed range join must plan as a BroadcastHashJoin on the
    bucket key with a residual range filter — NOT a nested-loop join
    over facts x ranges."""
    from fluent_bit_spark.operators.enrich import range_lookup
    facts = spark.range(100).select(
        (F.col("id") * 977).alias("ip"))
    ranges = spark.createDataFrame(
        [(0, 9999, "a"), (10000, 59999, "b")],
        "r_start long, r_end long, val string")
    plan = (range_lookup(facts, "ip", ranges, "r_start", "r_end",
                         bucket_bits=12)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with NO Exchange on either side — the write-once
    shuffle that makes repeated big-big joins affordable at scale."""
    from fluent_bit_spark.sources.tables import read_table, write_bucketed
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("x"))
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("y"))
    write_bucketed(a, "bkt_a", "k", n_buckets=8, sort_key="k")
    write_bucketed(b, "bkt_b", "k", n_buckets=8, sort_key="k")
    try:
        joined = read_table(spark, "bkt_a").join(
            read_table(spark, "bkt_b").hint("merge"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
        assert joined.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_multiline_join_is_single_shuffle(spark):
    """Window (partitionBy stream) and the group rebuild (groupBy
    stream,_gkey) must share ONE exchange: HashPartitioning(stream)
    satisfies the aggregation's ClusteredDistribution because its keys
    are a subset of the grouping keys — the docstring's 'same key →
    Catalyst reuses the partitioning' claim, pinned."""
    from fluent_bit_spark.operators.multiline import join_multiline
    df = spark.createDataFrame(
        [("s", i, f"l{i}") for i in range(50)],
        "stream string, off long, line string")
    out = join_multiline(df, "stream", "off", "line",
                         F.col("line").endswith("0"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_multiprobe_topk_shape_and_recall_dominates_single_probe(spark):
    """Multi-probe LSH: (a) the probe set is base-bucket-first with
    n_probe distinct Hamming-1-or-0 members; (b) the base-side plan is
    map-only + TakeOrderedAndProject (no join/window/shuffle added by
    probing); (c) its top-k overlap with brute force is >= the
    single-bucket path's on the same data (probing supersets the
    candidates)."""
    from fluent_bit_spark.operators.similarity import (
        ann_multiprobe_topk, brute_force_topk, lsh_bucket,
        lsh_dots_sql, lsh_probes_from_dots_sql, _vec_sql)
    import pyspark.sql.functions as F
    dim, planes_n, k = 8, 4, 5
    df = spark.createDataFrame(
        [(i, [float((i * 5 + j * 3) % 11) - 5.0 for j in range(dim)])
         for i in range(1, 60)],
        "vec_id long, embedding array<double>")
    qv = [1.0, -0.5, 2.0, 0.25, -1.5, 0.75, -0.25, 1.25]

    probes = (spark.range(1)
              .select(F.expr(lsh_dots_sql(_vec_sql(qv), dim,
                                          planes_n)).alias("d"))
              .select(F.expr(lsh_probes_from_dots_sql(
                  "d", planes_n, 3)).alias("pl"))
              .collect()[0].pl)
    assert len(probes) == 3 and len(set(probes)) == 3
    base_bucket = probes[0]
    for flip in probes[1:]:
        x = int(base_bucket) ^ int(flip)
        assert x != 0 and (x & (x - 1)) == 0  # Hamming distance exactly 1

    out = ann_multiprobe_topk(df, "vec_id", "embedding", dim, qv,
                              k=k, n_planes=planes_n, n_probe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan and "Window" not in plan

    brute = {r.vec_id for r in brute_force_topk(
        df, "vec_id", "embedding", qv, k).collect()}
    mp = {r.vec_id for r in out.collect()}
    single = (df.select("vec_id", "embedding",
                        lsh_bucket("embedding", dim, planes_n).alias("bk"))
              .filter(F.col("bk") == int(base_bucket)))
    from fluent_bit_spark.operators.similarity import cosine
    single_k = {r.vec_id for r in
                (single.withColumn(
                    "cos", cosine(F.col("embedding").cast("array<double>"),
                                  F.expr(_vec_sql(qv))))
                 .orderBy(F.desc("cos"), "vec_id").limit(k).collect())}
    assert len(mp & brute) >= len(single_k & brute)
    # the probed candidate set strictly contains the single bucket's
    assert single_k <= mp or len(single_k) < k


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_prefix_sum_windows_are_bounded(spark, tokens_df):
    """pack_sequences' offset scan must NOT plan a window partitioned
    only by source (that funnels a whole 10^12-row stream into one
    task). The two-phase form plans TWO windows: one over the tiny
    per-group totals and one partitioned by (source, group) — every
    window partition key set must include the bounded __g group."""
    from fluent_bit_spark.operators.tokens import exclusive_prefix_sum
    d = tokens_df.limit(500).withColumn(
        "oid", F.substring("doc_id", 4, 12).cast("long"))
    out = exclusive_prefix_sum(d, "source", "oid", "n_tok", "off",
                               group_size=64)
    plan = _plan(out)
    import re
    windows = re.findall(r"Window \[.*?\]", plan)
    assert windows, plan
    # the full-table window (over the fact rows) keys on __g too;
    # windows keyed on source alone may exist only over the per-group
    # totals frame, which is bounded by rows/group_size. Distinguish by
    # requiring at least one window spec that includes __g.
    assert any("__g" in w for w in windows), plan


def test_prefix_sum_windows_are_bounded_hash_order(spark, tokens_df):
    """Same guard on the HASH-ORDER path (run_pack --order hash):
    xxhash64 keys span the full int64 domain, so the range groups must
    be sized by hash_order_bucket_width — the dense 2^20 default would
    put every row in its own group, making the per-group totals table
    corpus-sized (its source-only window degenerates to one task and
    its broadcast would OOM the driver at 10^12 rows)."""
    from fluent_bit_spark.operators.tokens import (exclusive_prefix_sum,
                                                   hash_order_bucket_width)
    d = (tokens_df.limit(500)
         .withColumn("okey", F.xxhash64("doc_id")))
    width = hash_order_bucket_width(500, rows_per_group=64)
    out = exclusive_prefix_sum(d, "source", "okey", "n_tok", "off",
                               group_size=width, tiebreak_col="doc_id")
    plan = _plan(out)
    import re
    windows = re.findall(r"Window \[.*?\]", plan)
    assert windows, plan
    assert any("__g" in w for w in windows), plan
    # and the bucketing actually bounds the totals frame
    n_groups = (d.select(F.expr(f"okey DIV {width}").alias("g"))
                .distinct().count())
    assert n_groups <= 64, n_groups


def test_decontaminate_gram_join_is_broadcast(spark):
    """The benchmark gram set must broadcast: a shuffled join would
    exchange the 10^12-row exploded training grams."""
    from fluent_bit_spark.operators.tokens import decontaminate
    train = spark.createDataFrame(
        [("t%d" % i, list(range(i, i + 8))) for i in range(50)],
        "doc_id string, tokens array<int>")
    bench = spark.createDataFrame(
        [("b1", [2, 3, 4, 5, 6])], "doc_id string, tokens array<int>")
    plan = _plan(decontaminate(train, bench, n=3))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_mixture_sample_is_broadcast_plus_map_filter(spark, tokens_df):
    """mixture_sample adds only broadcast exchanges onto the fact
    scan — the corpus itself is never repartitioned to sample it."""
    from fluent_bit_spark.operators.tokens import mixture_sample
    d = tokens_df.limit(1000)
    out = mixture_sample(d, weight_pct=F.lit(20),
                         budget_tokens=F.expr("corpus_tokens DIV 2"))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # every Exchange on the FACT side must be broadcast; the only
    # hash exchanges allowed are under the tiny totals aggregates
    stripped = plan.replace("BroadcastExchange", "")
    # totals/corpus aggregates are rows-per-source sized: they may
    # hash-exchange, but the fact scan must not. The fact branch is the
    # one containing the parquet scan feeding the Filter; assert the
    # filter sits directly on the scan side with no Exchange between.
    import re
    m = re.search(r"Filter .*?\n(?:(?!Exchange).)*Scan", plan, re.S)
    assert m is not None, plan


def test_line_dedup_reuses_materialized_lines(spark, tokens_df):
    """line_dedup's exploded line frame must be persisted and REUSED by
    both plan branches (count build + join probe) — the unmaterialized
    probe side re-evaluates the explode at ~10x its cost (BENCH/
    CLEAN.md). Both branches must plan as InMemoryTableScan."""
    from fluent_bit_spark.operators.tokens import line_dedup
    docs = (tokens_df.limit(300)
            .withColumn("text", F.concat_ws(" ",
                        F.col("tokens").cast("array<string>"))))
    out = line_dedup(docs, line_words=4, max_occ=2)
    plan = _plan(out)
    # (the single FileScan that builds the cache appears inside the
    # InMemoryRelation description — only the InMemoryTableScan count
    # distinguishes reuse from re-evaluation)
    assert plan.count("InMemoryTableScan") >= 2, plan
    spark.catalog.clearCache()


def test_pq_topk_is_map_only_plus_topk(spark):
    """PQ search: the ADC scan (encode argmin + LUT sum, all literal
    arithmetic) must be map-only feeding TakeOrderedAndProject — no
    Exchange, window, or join anywhere; codebooks/LUT live in the plan
    as literals (the tiny-broadcast 10^12-vector posture)."""
    from fluent_bit_spark.operators.similarity import pq_topk
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(16)])
         for i in range(1, 60)],
        "vec_id long, embedding array<double>")
    out = pq_topk(df, "vec_id", "embedding", [1.0] * 16,
                  k=5, dim=16, m=4, n_codes=8, refine=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_pq_recall_improves_with_refine(spark):
    """Approximation-quality knob: widening the refine candidate pool
    must not lose recall, and a full-width pool recovers brute force
    exactly (the candidate ranking is a true distance bound)."""
    from pyspark.sql import functions as FF
    from fluent_bit_spark.operators.similarity import (_lit_vec, cosine,
                                                       pq_topk)
    df = spark.createDataFrame(
        [(i, [float((i * 11 + 3 * j * j) % 17) - 8.0 for j in range(16)])
         for i in range(1, 120)],
        "vec_id long, embedding array<double>")
    qv = [1.0, -2.0] * 8
    brute = [r.vec_id for r in
             df.select("vec_id",
                       cosine(FF.col("embedding"), _lit_vec(qv))
                       .alias("cos"))
             .orderBy(FF.desc("cos"), "vec_id").limit(5).collect()]
    r_small = {r.vec_id for r in
               pq_topk(df, "vec_id", "embedding", qv, k=5, dim=16,
                       m=4, n_codes=8, refine=2).collect()}
    full = [r.vec_id for r in
            pq_topk(df, "vec_id", "embedding", qv, k=5, dim=16,
                    m=4, n_codes=8, refine=24).collect()]
    assert full == brute                       # refine→all = exact
    assert len(r_small & set(brute)) >= 2      # approximate but sane


def test_pq_arrow_encode_bit_identical_to_sql(spark):
    """The vectorized Arrow ADC path (pq_adc_arrow) must return the
    EXACT rows of the pure-SQL form — same float64 ops in the same
    accumulation order (8-element sequential sums, first-min ties) —
    and stay map-only + TakeOrderedAndProject."""
    from fluent_bit_spark.operators.similarity import pq_topk
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) - 6.0 + 0.125 * ((i + j) % 5)
              for j in range(16)]) for i in range(1, 200)],
        "vec_id long, embedding array<double>")
    qv = [0.5, -1.25] * 8
    a = [(r.vec_id, r.cos) for r in
         pq_topk(df, "vec_id", "embedding", qv, k=7, dim=16, m=4,
                 n_codes=8, refine=3, encode="arrow").collect()]
    s = [(r.vec_id, r.cos) for r in
         pq_topk(df, "vec_id", "embedding", qv, k=7, dim=16, m=4,
                 n_codes=8, refine=3, encode="sql").collect()]
    assert a == s and len(a) == 7              # bit-exact, ordered
    out = pq_topk(df, "vec_id", "embedding", qv, k=7, dim=16, m=4,
                  n_codes=8, refine=3, encode="arrow")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInArrow" in plan                # the one Python boundary


def test_vs_corpus_bucketed_band_table_one_sided_exchange(spark):
    """With the corpus band table persisted BUCKETED on (band, bh),
    the per-batch LSH band join must read the corpus side with NO
    Exchange — only the new batch shuffles (per-batch cost ∝ batch,
    the BENCH/DEDUP.md vs-corpus posture) — and select the same
    survivors as the inline path."""
    from fluent_bit_spark.operators.dedup import (
        corpus_artifacts, corpus_band_table, dedup_vs_corpus,
    )
    from fluent_bit_spark.sources.tables import read_table, write_bucketed
    corpus = spark.createDataFrame(
        [(f"c{i}", f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}")
         for i in range(50)], "doc_id string, text string")
    new = spark.createDataFrame(
        [("n0", "alpha7 beta7 gamma7 delta7 eps7 zeta7"),     # = c7
         ("n1", "totally fresh words that match nothing here")],
        "doc_id string, text string")
    hashes, sigs = corpus_artifacts(corpus, "doc_id", "text")
    write_bucketed(corpus_band_table(sigs), "vs_bands",
                   ["band", "bh"], n_buckets=8)
    # at toy size the optimizer just broadcasts the corpus side; force
    # the SMJ the real corpus≫batch sizes would get so the test checks
    # the at-scale shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bands_tbl = read_table(spark, "vs_bands")
        out = dedup_vs_corpus(new, "doc_id", "text", hashes, sigs,
                              corpus_bands=bands_tbl)
        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        scan_at = [i for i, ln in enumerate(lines) if "vs_bands" in ln]
        assert scan_at, plan
        i = scan_at[0]
        assert "Bucketed: true" in plan
        # walk up from the bucketed scan to its SortMergeJoin: only
        # Sort/Project/Filter allowed in between — NO Exchange (the
        # bucketed layout already satisfies the join's distribution)
        subtree = "\n".join(lines[max(0, i - 6):i])
        assert "SortMergeJoin" in plan
        assert "Exchange" not in subtree, subtree
        got = sorted(r.doc_id for r in out.collect())
        want = dedup_vs_corpus(new, "doc_id", "text", hashes, sigs)
        assert got == sorted(r.doc_id for r in want.collect()) == ["n1"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS vs_bands")


def test_bpe_paths_plan_shapes(spark):
    """The BPE encode paths carry the right 100 TB shape: the Arrow
    kernel is MAP-ONLY (no Exchange — a tokenize pass must never
    shuffle the corpus) with exactly ONE Python boundary; the Catalyst
    chain has no Python boundary at all. word_counts' only exchange is
    the vocab-bounded partial-aggregated groupBy."""
    from fluent_bit_spark.functions.bpe import (
        bpe_apply_expr, bpe_encode_arrow, word_counts,
    )
    df = spark.createDataFrame(
        [(0, "the quick brown fox")], "id long, text string")

    plan = (bpe_encode_arrow(df, [("t", "h")])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1

    plan = (df.select(bpe_apply_expr("text", [("t", "h")]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan

    plan = (word_counts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2     # partial + final


def test_cms_plans_are_bounded_and_broadcast(spark):
    """count_min_table's only wide exchange is the d×w-bounded cell
    agg; cms_estimate joins the sketch via BroadcastHashJoin; neither
    path crosses a Python boundary."""
    from fluent_bit_spark.operators.aggregate import (
        cms_estimate, count_min_table,
    )
    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(200)],
                               "k string")
    cms = count_min_table(df, "k", width=32, depth=3)
    est = cms_estimate(cms, df.distinct(), "k", width=32, depth=3)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython",
                   "MapInPandas", "MapInArrow", "CartesianProduct"):
        assert marker not in plan
    # the sketch itself is the complete spine — depth*width rows
    assert cms.count() == 32 * 3


def test_vocab_growth_plan_has_no_expand(spark):
    """vocab_growth must not plan a multi-distinct Expand (it would
    multiply the exploded corpus by the aggregate count); the vocab
    side is a min-bucket reduction instead."""
    from fluent_bit_spark.operators.tokens import vocab_growth
    df = spark.createDataFrame(
        [(i, list(range(i % 5 + 1))) for i in range(50)],
        "doc_id long, tokens array<int>")
    plan = (vocab_growth(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Expand" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython",
                   "CartesianProduct"):
        assert marker not in plan


def test_kn_surprisal_plan_broadcasts_bounded_sides(spark, tokens_df):
    """KN scoring: the vocab-bounded context/continuation tables and
    the 1-row distinct-bigram scalar ride as broadcast joins; no
    cartesian product; no Python anywhere."""
    from fluent_bit_spark.operators.tokens import kn_surprisal
    d = tokens_df.limit(300)
    plan = (kn_surprisal(d)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert plan.count("BroadcastExchange") >= 3  # ctx, cont, nbb
    assert "BroadcastNestedLoopJoin" in plan     # the 1-row crossJoin


def test_bucket_batches_plan_bounded_windows_only(spark, tokens_df):
    """bucket_batches: the prefix count's windows are the two-phase
    bounded forms (per-group totals + local) — no corpus-wide
    unbounded sort per (source, bucket); no Python."""
    from fluent_bit_spark.operators.tokens import bucket_batches
    d = tokens_df.limit(300)
    plan = (bucket_batches(d, max_tokens=256)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "CartesianProduct" not in plan
    # exclusive_prefix_sum shape: the base-offset table broadcasts
    assert "BroadcastExchange" in plan


def test_remap_vocab_plan_broadcast_mapping(spark, tokens_df):
    """remap_vocab: the vocab-bounded mapping joins as a broadcast;
    the rewrite never becomes a shuffled join keyed on token."""
    from fluent_bit_spark.operators.tokens import remap_vocab
    d = tokens_df.limit(300)
    plan = (remap_vocab(d)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_spans_plan_broadcast_bench(spark, tokens_df):
    """decontaminate_spans: the bench window-key set broadcasts; train
    window content never shuffles (only fixed-width keys appear in
    exchanges — asserted by the absence of a token-array column in
    any Exchange's output schema is impractical to string-match, so
    we assert the join strategy instead)."""
    from fluent_bit_spark.operators.tokens import decontaminate_spans
    d = tokens_df.limit(300)
    train = d.filter(F.col("doc_id").substr(4, 12).cast("long") % 5
                     != 0)
    bench = d.filter(F.col("doc_id").substr(4, 12).cast("long") % 5
                     == 0)
    plan = (decontaminate_spans(train, bench, length=16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
