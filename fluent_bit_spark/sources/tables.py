"""Table-format abstraction: Parquet in the sandbox, Iceberg in production.

Reference analogue: in_tail / out_file+out_s3 (upstream:plugins/in_tail,
plugins/out_file, plugins/out_s3) — file follow + per-tag file layout.
In a table engine both collapse to partitioned table scans/writes.

The sandbox has no Iceberg runtime jar (verified, SURVEY §1.2), so
``TableIO`` selects by format string and degrades gracefully: the Iceberg
path is exercised only when ``spark.sql.catalog.*`` is configured (cluster
deployments add ``iceberg-spark-runtime`` via ``spark.jars.packages``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@dataclass(frozen=True)
class TableIO:
    fmt: str = "parquet"  # 'parquet' | 'iceberg'

    @classmethod
    def resolve(cls, spark: SparkSession,
                prefer: str = "iceberg") -> "TableIO":
        """Select the preferred format, degrading to Parquet when the
        Iceberg runtime is absent (the sandbox case). Production conf
        that lights up the Iceberg branch:

            spark.jars.packages=org.apache.iceberg:iceberg-spark-
                runtime-4.0_2.13:<ver>
            spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
            spark.sql.catalog.lake.type=glue|hive|hadoop
        """
        if prefer == "iceberg" and iceberg_available(spark):
            return cls(fmt="iceberg")
        return cls(fmt="parquet")

    def read(self, spark: SparkSession, path_or_table: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(path_or_table)
        return spark.read.parquet(path_or_table)

    def write(self, df: DataFrame, path_or_table: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.fmt == "iceberg":
            w.format("iceberg").saveAsTable(path_or_table)
        else:
            w.parquet(path_or_table)

    def overwrite_partitions(self, df: DataFrame, path_or_table: str,
                             partition_by: list[str]) -> None:
        """Replace ONLY the partitions present in ``df``, leaving the
        rest of the table untouched (the idempotent re-run primitive for
        a partitioned sink: re-emitting one day/slice must not clobber
        the others). Iceberg: ``writeTo().overwritePartitions()`` — an
        atomic snapshot commit. Parquet: dynamic partition-overwrite
        mode — correct per-partition replacement, but directory swaps
        are not transactional (same caveat as compact_dir)."""
        if self.fmt == "iceberg":
            df.writeTo(path_or_table).overwritePartitions()
            return
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by) \
                .parquet(path_or_table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def upsert(self, df: DataFrame, path_or_table: str, key: str) -> None:
        """MERGE by key: rows in ``df`` replace same-key rows in the
        target; unmatched rows are inserted. Iceberg: a real MERGE INTO
        (one atomic commit, scan pruned by the ON clause). Parquet
        fallback: anti-join the target against the new keys, union,
        full rewrite through a temp dir + FS swap — correct but O(table)
        and non-transactional, which is exactly why the production
        deployment wants the Iceberg branch."""
        spark = df.sparkSession
        if self.fmt == "iceberg":
            src = f"__upsert_src_{abs(hash(path_or_table)) % 99999}"
            df.createOrReplaceTempView(src)
            cols = df.columns
            sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
            vals = ", ".join(f"s.{c}" for c in cols)
            spark.sql(
                f"MERGE INTO {path_or_table} t USING {src} s "
                f"ON t.{key} = s.{key} "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) "
                f"VALUES ({vals})")
            spark.catalog.dropTempView(src)
            return
        from ..plans import fsio
        existing = spark.read.parquet(path_or_table)
        keep = existing.join(df.select(key), key, "left_anti")
        merged = keep.unionByName(df)
        tmp = path_or_table.rstrip("/") + ".upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        fsio.delete(spark, path_or_table)
        fsio.rename(spark, tmp, path_or_table)


def read_tokens(spark: SparkSession, path: str,
                io: TableIO | None = None) -> DataFrame:
    """The engine's canonical input: (doc_id, tokens, n_tok, source)."""
    return (io or TableIO()).read(spark, path)


def write_bucketed(df: DataFrame, table: str,
                   bucket_key: str | list[str],
                   n_buckets: int = 32,
                   sort_key: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist a table bucketed (and optionally sorted) on its join
    key(s) — ``bucket_key`` may be one column or a composite list.

    The co-located-join tool for keys joined REPEATEDLY at scale: two
    tables bucketed on the same key with the same bucket count join with
    NO exchange on either side (asserted in tests/test_plan_shape.py) —
    the shuffle is paid once at write time instead of once per query;
    a table bucketed on its join keys also skips ITS side's exchange
    against a non-bucketed other side (the maintained-corpus posture).
    This is the Parquet/Hive bucketing analogue of Iceberg's
    ``bucket(N, key)`` partition transform; on the Iceberg deployment
    use that transform plus storage-partitioned joins."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    w = df.write.mode(mode).bucketBy(n_buckets, keys[0], *keys[1:])
    if sort_key:
        w = w.sortBy(sort_key)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact_dir(spark: SparkSession, path: str,
                target_mb: int = 256,
                partition_by: list[str] | None = None) -> dict:
    """Small-file compaction for a parquet sink tree (the maintenance
    job a per-slice fan-out needs at scale: each slice × sink ×
    partition write emits its own files; after thousands of slices the
    scan cost is dominated by file-open overhead).

    Rewrites the tree to ~``total_bytes / target_mb`` files via
    repartition, then swaps directories through the Hadoop FS API.
    The swap is delete+rename — NOT transactional (a reader racing the
    swap can miss the tree); run it in a maintenance window, or on the
    Iceberg deployment use ``rewrite_data_files`` which commits
    atomically. Returns {files_before, files_after, rows}."""
    from ..plans import fsio
    before = fsio.count_files(spark, path)
    df = spark.read.parquet(path)
    rows = df.count()
    total = fsio.total_bytes(spark, path)
    n_out = max(1, int(total / (target_mb << 20)) + (
        1 if total % (target_mb << 20) else 0))
    tmp = path.rstrip("/") + ".compact_tmp"
    w = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    fsio.delete(spark, path)
    fsio.rename(spark, tmp, path)
    return {"files_before": before,
            "files_after": fsio.count_files(spark, path),
            "rows": rows}
