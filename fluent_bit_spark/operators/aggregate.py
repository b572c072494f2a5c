"""Aggregations (SURVEY.md §2.6–§2.7): stream-processor SELECT aggregates,
log_to_metrics, event-time windows, and the skew-salted two-phase groupBy.

Reference:
- SP aggregation paths (upstream:src/stream_processor/flb_sp.c,
  flb_sp_window.c): AVG/SUM/COUNT/MIN/MAX with GROUP BY over window
  buffers, processing-time flush.
- TIMESERIES_FORECAST (upstream:src/stream_processor/
  flb_sp_aggregate_func.c): least-squares linear forecast.
- filter_log_to_metrics (upstream:plugins/filter_log_to_metrics/
  log_to_metrics.c): counter / gauge / histogram derivation.

Scale notes: Spark's hash aggregate already does map-side partial
aggregation, which absorbs most key skew for algebraic aggs (count/sum/
min/max). The explicit salt matters for the *distinct* path and for any
holistic agg where one hot key (src0 ≈ 40% of rows) would otherwise land
on a single reducer: phase 1 groups by (keys…, salt) so the hot key fans
out over ``salt_buckets`` reducers; phase 2 recombines partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(seed_col: str = "doc_id", buckets: int = 32) -> Column:
    return F.pmod(F.xxhash64(F.col(seed_col)), F.lit(buckets)).alias("__salt")


def salted_sink_aggregates(df: DataFrame, keys: list[str],
                           n_tok_col: str = "n_tok",
                           source_col: str = "source",
                           salt_seed_col: str = "doc_id",
                           salt_buckets: int = 32,
                           approx_distinct: bool = False) -> DataFrame:
    """Per-tag/per-sink aggregate: records, n_tok sums, distinct sources
    (BASELINE.json north_star) as a two-phase salted aggregation.

    Phase 1 groups by (keys…, source, salt) — the hot (tag, src0) pair
    splits across ``salt_buckets`` partial groups. Phase 2 collapses the
    salt, phase 3 collapses source to get the exact distinct count without
    a shuffle of raw rows. ``approx_distinct=True`` swaps the exact count
    for HLL (the 10^12-row path when source cardinality were unbounded)."""
    if approx_distinct:
        p0 = (df.groupBy(*keys, salt_col(salt_seed_col, salt_buckets))
                .agg(F.count("*").alias("__c"),
                     F.sum(n_tok_col).alias("__s"),
                     F.approx_count_distinct(source_col).alias("__d")))
        return (p0.groupBy(*keys)
                  .agg(F.sum("__c").alias("records"),
                       F.sum("__s").alias("sum_n_tok"),
                       F.max("__d").alias("distinct_sources")))
    p0 = (df.groupBy(*keys, source_col,
                     salt_col(salt_seed_col, salt_buckets))
            .agg(F.count("*").alias("__c"), F.sum(n_tok_col).alias("__s")))
    p1 = (p0.groupBy(*keys, source_col)
            .agg(F.sum("__c").alias("__c"), F.sum("__s").alias("__s")))
    return (p1.groupBy(*keys)
              .agg(F.sum("__c").alias("records"),
                   F.sum("__s").alias("sum_n_tok"),
                   F.count(source_col).alias("distinct_sources")))


def sp_aggregate(df: DataFrame, group_keys: list[str],
                 aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Stream-processor SELECT list: {out_name: (fn, key)} with fn in
    avg|sum|count|min|max (upstream SP's full aggregate surface)."""
    fns = {"avg": F.avg, "sum": F.sum, "count": F.count,
           "min": F.min, "max": F.max}
    exprs = [fns[fn](F.col(key) if key != "*" else F.lit(1)).alias(name)
             if fn != "count" else
             (F.count("*") if key == "*" else F.count(F.col(key))).alias(name)
             for name, (fn, key) in aggs.items()]
    return df.groupBy(*group_keys).agg(*exprs)


# ---------------------------------------------------------------------------
# Event-time windows (SP WINDOW TUMBLING / HOPPING; SURVEY §2.7)
# ---------------------------------------------------------------------------


def tumbling(df: DataFrame, ts_col: str, size: str,
             keys: list[str] | None = None):
    return df.groupBy(F.window(F.col(ts_col), size).alias("win"),
                      *(keys or []))


def hopping(df: DataFrame, ts_col: str, size: str, advance: str,
            keys: list[str] | None = None):
    return df.groupBy(F.window(F.col(ts_col), size, advance).alias("win"),
                      *(keys or []))


def session(df: DataFrame, ts_col: str, gap: str,
            keys: list[str] | None = None):
    """Absent upstream (SURVEY §2.7) — free in Spark; provided for parity+."""
    return df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                      *(keys or []))


# ---------------------------------------------------------------------------
# TIMESERIES_FORECAST — closed-form least squares via regr_* builtins
# ---------------------------------------------------------------------------


def timeseries_forecast(df: DataFrame, keys: list[str], ts_col: str,
                        value_col: str, horizon_seconds: float) -> DataFrame:
    """Per-group linear forecast of ``value`` at max(ts)+horizon.
    Matches upstream's incremental least-squares exactly in the limit
    (same normal equations), computed distributed by Catalyst."""
    x = F.unix_timestamp(F.col(ts_col)).cast("double")
    y = F.col(value_col).cast("double")
    out = (df.groupBy(*keys)
             .agg(F.regr_slope(y, x).alias("slope"),
                  F.regr_intercept(y, x).alias("intercept"),
                  F.max(x).alias("__xmax")))
    return (out.withColumn(
                "forecast",
                F.col("intercept")
                + F.col("slope") * (F.col("__xmax") + F.lit(horizon_seconds)))
               .drop("__xmax"))


# ---------------------------------------------------------------------------
# filter_log_to_metrics
# ---------------------------------------------------------------------------


def log_counter(df: DataFrame, labels: list[str],
                name: str = "value") -> DataFrame:
    return df.groupBy(*labels).agg(F.count("*").alias(name))


def log_gauge(df: DataFrame, labels: list[str], value_field: str,
              mode: str = "avg", name: str = "value") -> DataFrame:
    fn = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}[mode]
    return df.groupBy(*labels).agg(fn(F.col(value_field)).alias(name))


def histogram_bucket(value_col: str, lo: float, hi: float,
                     nbuckets: int) -> Column:
    """Prometheus-style fixed buckets: floor((v-lo)/step) clamped to
    [0, n-1]; out-of-range low → 0 (er, underflow) / high → n (overflow
    bucket), matching log_to_metrics' +Inf bucket."""
    step = (hi - lo) / nbuckets
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(step))
    return (F.when(F.col(value_col) < lo, F.lit(-1))
             .when(F.col(value_col) >= hi, F.lit(nbuckets))
             .otherwise(raw)).cast("int")


def log_histogram(df: DataFrame, labels: list[str], value_field: str,
                  lo: float, hi: float, nbuckets: int) -> DataFrame:
    return (df.withColumn("bucket",
                          histogram_bucket(value_field, lo, hi, nbuckets))
              .groupBy(*labels, "bucket")
              .agg(F.count("*").alias("n")))


def log_histogram_bounds(df: DataFrame, labels: list[str],
                         value_field: str,
                         bounds: list[float]) -> DataFrame:
    """Explicit-boundary histogram — the ``[FILTER] log_to_metrics``
    repeatable ``bucket`` property (upstream:plugins/filter_log_to_metrics
    registers one Prometheus bucket per line): per label combination,
    one row per ``le`` boundary (plus ``+Inf``) with the CUMULATIVE
    observation count, Prometheus exposition semantics (``v <= le``).

    Output: ``labels + (le: string, n: bigint)``. Scale shape: one
    row per observation per boundary is never materialized — the
    observation maps to its FIRST bucket (one narrow projection), the
    groupBy is one exchange on (labels, bucket), and cumulation runs
    on the aggregated frame (rows = |labels| × |bounds|) via a window
    — aggregate-then-cumulate, not explode-then-aggregate.
    """
    if not bounds or sorted(bounds) != list(bounds):
        raise ValueError("histogram bounds must be a non-empty "
                         "ascending list")
    v = F.col(value_field).cast("double")
    idx = F.lit(len(bounds))  # +Inf
    for i in range(len(bounds) - 1, -1, -1):
        idx = F.when(v <= F.lit(float(bounds[i])), F.lit(i)) \
               .otherwise(idx)
    per = (df.withColumn("__b", idx.cast("int"))
             .groupBy(*labels, "__b").agg(F.count("*").alias("__n")))
    # per-label bucket→count map (bounded: ≤ len(bounds)+1 entries),
    # then densify against the literal boundary list so every
    # (labels, le) row exists even at count 0 — the exposition
    # contract — and cumulate with a running aggregate over the
    # literal array, all on model-sized data
    les = [str(float(b)) for b in bounds] + ["+Inf"]
    per_m = (per.groupBy(*labels)
                .agg(F.map_from_entries(
                    F.collect_list(F.struct("__b", "__n"))).alias("__m")))
    cum = F.lit(0).cast("long")
    rows = []
    for i, le in enumerate(les):
        cum = cum + F.coalesce(F.col("__m").getItem(i), F.lit(0))
        rows.append(F.struct(F.lit(le).alias("le"), cum.alias("n")))
    return (per_m.select(*labels, F.explode(F.array(*rows)).alias("__r"))
                 .select(*labels, F.col("__r.le").alias("le"),
                         F.col("__r.n").alias("n")))


def log_to_metrics(df: DataFrame, mode: str, labels: list[str],
                   value_field: str | None = None,
                   buckets: list[float] | None = None,
                   gauge_mode: str = "avg",
                   name: str = "value") -> DataFrame:
    """``[FILTER] log_to_metrics`` dispatcher
    (upstream:plugins/filter_log_to_metrics ``metric_mode``): counter /
    gauge / histogram over the matched records, grouped by the
    ``label_field`` columns. Deviation (documented): upstream's gauge
    is last-value-wins over arrival order; a batch engine has no
    arrival order, so ``gauge_mode`` selects the reduction
    (avg|min|max|sum, default avg)."""
    mode = mode.lower()
    if mode == "counter":
        return log_counter(df, labels, name=name)
    if mode == "gauge":
        if not value_field:
            raise ValueError("log_to_metrics gauge needs value_field")
        return log_gauge(df, labels, value_field, mode=gauge_mode,
                         name=name)
    if mode == "histogram":
        if not value_field:
            raise ValueError("log_to_metrics histogram needs "
                             "value_field")
        if not buckets:
            raise ValueError("log_to_metrics histogram needs at least "
                             "one bucket boundary")
        return log_histogram_bounds(df, labels, value_field, buckets)
    raise ValueError(f"metric_mode must be counter|gauge|histogram, "
                     f"got {mode!r}")


# ---------------------------------------------------------------------------
# Count-Min-Sketch heavy hitters (bounded-memory skew detection)
# ---------------------------------------------------------------------------


def _cms_bucket(key: Column, d: Column | int, width: int) -> Column:
    """Row d's hash bucket for a key — portable md5 ladder (first 7
    hex chars of md5("d:key") mod width) so DuckDB reproduces the
    sketch bit-for-bit."""
    drow = d if isinstance(d, Column) else F.lit(d)
    return (F.conv(F.substring(
        F.md5(F.concat(drow.cast("string"), F.lit(":"),
                       key.cast("string"))), 1, 7), 16, 10)
        .cast("long") % width)


def count_min_table(df: DataFrame, key_col: str,
                    width: int = 4096, depth: int = 4) -> DataFrame:
    """Build a Count-Min Sketch of the key column as a DataFrame of
    EXACTLY ``depth × width`` cells ``(d, bucket, c)`` (Cormode &
    Muthukrishnan 2005). The sketch answers point frequency queries
    with one-sided error: estimate ≥ true count always, and
    estimate ≤ true + εN with probability 1-δ for width = ⌈e/ε⌉,
    depth = ⌈ln 1/δ⌉.

    This is the bounded-memory alternative to ``groupBy(key).count()``
    when key cardinality is corpus-sized (URLs, doc hashes): the
    exchange carries at most ``depth × width`` map-side-combined
    partials per partition no matter how many distinct keys exist, and
    the result broadcasts. The zero-count spine (``spark.range``
    cross) makes the cell count exact so downstream joins never miss.

    Scale shape (10^12 rows): map-only explode to ``depth`` narrow
    rows per record, one K-bounded hash agg — the same posture as the
    DSIR bucket model; merging sketches of two corpora is cell-wise
    addition (a union + re-agg), which is how per-day sketches roll up.
    """
    spark = df.sparkSession
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        F.col(key_col).alias("k"))
    counted = (rows.select("d", _cms_bucket(F.col("k"), F.col("d"),
                                            width).alias("bucket"))
               .groupBy("d", "bucket").agg(F.count("*").alias("c")))
    spine = (spark.range(0, depth).select(F.col("id").alias("d"))
             .crossJoin(spark.range(0, width)
                        .select(F.col("id").alias("bucket"))))
    return (spine.join(F.broadcast(counted), ["d", "bucket"], "left")
            .select("d", "bucket",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c")))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str,
                 width: int = 4096, depth: int = 4) -> DataFrame:
    """Point-query a Count-Min sketch for each distinct key in
    ``keys``: explode the key into its ``depth`` (row, bucket) probes,
    broadcast-join the sketch cells, take the MIN over rows — the CMS
    estimate, ``est_count ≥ true count`` always. One narrow exchange
    row per queried key."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
    probes = probes.withColumn(
        "bucket", _cms_bucket(F.col(key_col), F.col("d"), width))
    return (probes.join(F.broadcast(cms), ["d", "bucket"])
            .groupBy(key_col)
            .agg(F.min("c").alias("est_count")))


def heavy_hitters_cms(df: DataFrame, key_col: str,
                      min_count: int,
                      width: int = 4096, depth: int = 4,
                      sample_permille: int = 1000,
                      row_id_col: str | None = None) -> DataFrame:
    """Detect heavy keys (the salting decision's input) with bounded
    memory: build the CMS, draw a DETERMINISTIC content-hash sample of
    rows as the candidate pool (portable md5 permille — the
    deterministic_sample rule), estimate each distinct candidate, keep
    ``est_count >= min_count``.

    Guarantee shape: CMS never underestimates, so no candidate above
    threshold is missed; candidate recall is the sampling story — a
    key with true count ≥ min_count appears in a p-rate sample with
    probability 1-(1-p)^min_count (≥ 1-e^{-p·min_count}, i.e. ~1 for
    any key actually worth salting at production thresholds). At
    ``sample_permille=1000`` the pool is all rows — exact recall, used
    by the oracle; production sets the permille so that
    p·min_count ≳ 7 (recall > 99.9%). Sub-1000 rates hash
    ``key:row_id`` (``row_id_col`` required — a per-ROW key, so a
    heavy key's many rows are sampled independently; hashing the key
    alone would drop whole keys), deterministic and engine-portable
    like every sampler here.

    Output: ``(key_col, est_count)``, est_count ≥ true count.
    """
    cms = count_min_table(df, key_col, width=width, depth=depth)
    if sample_permille < 1000:
        if row_id_col is None:
            raise ValueError(
                "heavy_hitters_cms: sample_permille < 1000 needs "
                "row_id_col (per-row sampling key) — hashing the key "
                "alone would sample whole keys in or out")
        keep = (F.conv(F.substring(
            F.md5(F.concat(F.lit("hh:"), F.col(key_col).cast("string"),
                           F.lit(":"),
                           F.col(row_id_col).cast("string"))),
            1, 7), 16, 10)
            .cast("long") % 1000) < sample_permille
        pool = df.filter(keep).select(key_col)
    else:
        pool = df.select(key_col)
    cands = pool.distinct()
    est = cms_estimate(cms, cands, key_col, width=width, depth=depth)
    return est.filter(F.col("est_count") >= min_count)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (Flajolet et al. 2007, portable integer form)
# ---------------------------------------------------------------------------


def _hll_hash60(key: Column) -> Column:
    """60-bit uniform hash from an md5 prefix — the same portable
    family as every other sketch here (DuckDB replays it bit-for-bit;
    xxhash64 would be faster but engine-private)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15),
                  16, 10).cast("long")


def hll_register_table(df: DataFrame, key_col: str, p: int = 10,
                       group_cols: list[str] | None = None) -> DataFrame:
    """HyperLogLog register table for distinct-``key_col`` estimation
    (Flajolet/Fusy/Gandouet/Meunier 2007): bucket = top ``p`` hash
    bits, register = max over the bucket of ``rho`` (1 + leading
    zeros of the remaining ``60-p`` bits). Emitted on a COMPLETE
    ``2^p``-register spine per group (missing buckets = 0) so
    estimation and merges never miss cells — the CMS spine posture.

    This is the bounded-memory scale path behind the SP dialect's
    ``COUNT(DISTINCT …)`` when key cardinality is corpus-sized: the
    exchange carries ≤ ``groups × 2^p`` map-side-combined partials no
    matter how many distinct keys exist, the table broadcasts, and
    per-day sketches roll up by cell-wise MAX (:func:`hll_merge`) —
    the exact-distinct twin stays the small-cardinality default.

    Scale shape (10^12 rows): one map-only hash projection + one
    K-bounded hash agg; no row-count-sized state anywhere.
    """
    if not 7 <= p <= 16:
        raise ValueError(f"hll: p out of [7,16]: {p} (alpha constant "
                         f"is the m>=128 form; >16 is spine bloat)")
    groups = list(group_cols or [])
    w = 60 - p
    h = _hll_hash60(F.col(key_col))
    bucket = F.expr(f"__h DIV {1 << w}").alias("bucket")
    rem = F.expr(f"__h % {1 << w}")
    rho = (F.when(rem == 0, F.lit(w + 1))
            .otherwise(F.lit(w + 1) - F.length(F.expr("bin(__h % "
                                                      f"{1 << w})"))))
    d = (df.withColumn("__h", h)
           .select(*groups, bucket, rho.cast("int").alias("rho")))
    regs = d.groupBy(*groups, "bucket").agg(F.max("rho").alias("m_rho"))
    spark = df.sparkSession
    spine = spark.range(0, 1 << p).select(F.col("id").alias("bucket"))
    if groups:
        spine = df.select(*groups).distinct().crossJoin(spine)
    return (spine.join(regs, [*groups, "bucket"], "left")
            .select(*groups, "bucket",
                    F.coalesce(F.col("m_rho"), F.lit(0))
                     .cast("int").alias("m_rho")))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Merge two register tables (same ``p``): cell-wise MAX — the
    lossless HLL union, how per-shard/per-day sketches roll up."""
    groups = list(group_cols or [])
    return (a.unionByName(b)
            .groupBy(*groups, "bucket")
            .agg(F.max("m_rho").cast("int").alias("m_rho")))


def hll_estimate(regs: DataFrame, p: int = 10,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Distinct-count estimate from a register table. The indicator
    sum ``S = Σ 2^(-M_j)`` is computed EXACTLY in BIGINT at scale
    ``2^(w+1)`` (every term ``2^(w+1-M)`` is integral and the total is
    ≤ ``2^(p+w+1)`` = 2^61 at p=10 — no float-summation order to
    diverge between engines); the only floating point is the final
    ``alpha_m · m² / S`` (and linear-counting ``m·ln(m/V)`` when the
    raw estimate ≤ 2.5m with empty registers, the Flajolet small-range
    rule) — identical literal IEEE expressions in Spark and the DuckDB
    oracle, snapped behind one round. Relative error ≈ 1.04/√m
    (~3.25% at p=10).
    """
    groups = list(group_cols or [])
    m = 1 << p
    w = 60 - p
    agg = (regs.groupBy(*groups)
           .agg(F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                             f"{w + 1} - m_rho)"))
                 .cast("long").alias("__s"),
                F.sum(F.when(F.col("m_rho") == 0, 1).otherwise(0))
                 .cast("long").alias("v_zero"),
                F.count("*").alias("__m")))
    # 'D' suffixes force DOUBLE literals — Spark otherwise types
    # 0.7213 as DECIMAL and the decimal-scale arithmetic diverges
    # from the oracle's IEEE chain in the 4th significant digit
    raw = F.expr(f"(0.7213D / (1.0D + 1.079D / {m})) * {m * m} "
                 f"* power(2.0D, {w + 1}) / __s")
    lin = F.expr(f"{m} * ln({m} / CAST(v_zero AS DOUBLE))")
    est = (F.when((raw <= 2.5 * m) & (F.col("v_zero") > 0),
                  F.round(lin))
            .otherwise(F.round(raw))).cast("long")
    return (agg.withColumn("est_distinct", est)
            .select(*groups, "est_distinct", "v_zero"))


def approx_distinct_hll(df: DataFrame, key_col: str, p: int = 10,
                        group_cols: list[str] | None = None) -> DataFrame:
    """``hll_register_table`` → ``hll_estimate`` composed: per-group
    approximate distinct counts with a 2^p-cell memory bound."""
    return hll_estimate(hll_register_table(df, key_col, p, group_cols),
                        p, group_cols)
