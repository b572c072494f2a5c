"""Dataset-shard export with integrity manifest — the materialization
step between a curated/packed corpus and a training dataloader.

Not in the reference (fluent-bit's out_file stops at per-tag files;
upstream:plugins/out_file has no dataset-integrity notion); this is the
extension a 10^12-sequence corpus needs when the produced artifact IS
the deliverable: deterministic shard assignment, per-shard statistics,
and an ORDER-INSENSITIVE content checksum per shard so any later
reader (or the writer itself, re-reading) can prove the bytes survived
— without assuming row order, file order, or engine.

Checksum design: per-row 60-bit md5 fingerprint over the row's
identity + content hash, folded per shard with ``bit_xor`` — xor is
commutative/associative with no overflow, so the fold is exact and
partitioning-independent at any scale (a sum would overflow BIGINT at
~10^3 rows of 60-bit values; modular sums survive but xor keeps full
avalanche per bit). The md5 chain is the portable family every sketch
here uses — DuckDB replays it bit-for-bit.

Scale shape: assignment is MAP-ONLY (hash mod); the manifest is one
hash agg keyed by ``n_shards`` values (K-bounded, map-side combined);
the write itself is ``partitionBy(shard)`` — one file tree per shard,
no exchange beyond the write's own partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_fingerprint(id_col: str, content_col: Column) -> Column:
    """60-bit portable row fingerprint: md5 over id + content-md5."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(
            ":", F.col(id_col).cast("string"),
            F.md5(content_col.cast("string")))), 1, 15),
        16, 10).cast("long")


def shard_assign(df: DataFrame, n_shards: int,
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard assignment: portable md5 hash of the id,
    mod ``n_shards`` — stable across runs, partitionings, engines.
    MAP-ONLY."""
    if n_shards < 1:
        raise ValueError(f"shard_assign: n_shards must be >= 1, "
                         f"got {n_shards}")
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def shard_manifest(df: DataFrame, content_col: str,
                   id_col: str = "doc_id",
                   len_col: str | None = "n_tok") -> DataFrame:
    """Per-shard manifest over an already-assigned frame (``shard``
    column present): row count, token sum (when ``len_col``), and the
    xor-folded 60-bit content checksum. One K-bounded hash agg."""
    fp = _row_fingerprint(id_col, F.col(content_col))
    aggs = [F.count("*").alias("n_docs"),
            F.expr("bit_xor(__fp)").alias("checksum")]
    if len_col:
        aggs.insert(1, F.sum(F.col(len_col).cast("long"))
                    .alias("n_tok_sum"))
    return (df.withColumn("__fp", fp)
            .groupBy("shard").agg(*aggs))


def export_shards(df: DataFrame, out_dir: str, n_shards: int,
                  content_col: str, id_col: str = "doc_id",
                  len_col: str | None = "n_tok") -> DataFrame:
    """Assign, write ``partitionBy(shard)`` parquet under
    ``out_dir/shards``, and return the manifest computed from the
    INPUT frame. Callers verify integrity by re-reading the written
    tree and comparing :func:`shard_manifest` output — see
    ``jobs/run_export.py`` (the writer-re-read proof is the point:
    a manifest computed only from the input cannot catch a write
    fault)."""
    assigned = shard_assign(df, n_shards, id_col)
    (assigned.write.mode("overwrite")
     .partitionBy("shard").parquet(f"{out_dir}/shards"))
    return shard_manifest(assigned, content_col, id_col, len_col)


def shard_by_order(df: DataFrame, n_shards: int, order_col: str,
                   id_col: str = "doc_id",
                   group_size: int = 1 << 20) -> DataFrame:
    """RANGE shard assignment: documents ordered by ``order_col``
    (integral; ties broken on ``id_col``) split into ``n_shards``
    CONTIGUOUS, balanced-to-±1 ranges — the curriculum-export
    counterpart of :func:`shard_assign`'s hash layout (shard 0 holds
    the lowest-keyed docs, e.g. an easy-first surprisal band, so a
    dataloader can stream shards in curriculum order).

    ``shard = rank * n_shards DIV total`` over the distributed
    exclusive prefix COUNT — no global single-task sort; the only
    full-order structure is the tiny per-group totals table
    (:func:`~fluent_bit_spark.operators.tokens.exclusive_prefix_sum`).

    Scale shape: one tiny totals agg + bounded local windows + a
    1-row count broadcast; the write stays ``partitionBy(shard)``.
    """
    if n_shards < 1:
        raise ValueError(f"shard_by_order: n_shards must be >= 1, "
                         f"got {n_shards}")
    from .tokens import exclusive_prefix_sum
    d = df.withColumn("__one", F.lit("_"))
    ranked = exclusive_prefix_sum(d, "__one", order_col, F.lit(1),
                                  out_col="__rank",
                                  group_size=group_size,
                                  tiebreak_col=id_col)
    total = ranked.agg(F.count("*").alias("__n"))
    return (ranked.crossJoin(F.broadcast(total))
            .withColumn("shard",
                        F.expr(f"__rank * {n_shards} DIV __n")
                         .cast("int"))
            .drop("__one", "__rank", "__n"))
