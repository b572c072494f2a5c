"""SparkSession factory with the engine's performance configuration.

Reference analogue: fluent-bit's engine/config bootstrap
(upstream:src/flb_engine.c, src/flb_config.c) — there the knobs are
chunk sizes and worker threads; here they are AQE, Arrow batching and
shuffle partitioning (SURVEY.md §4.2 physical knobs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing: token rows are ~4 KB (avg ~60 int32 tokens + text);
# 10k rows/batch ≈ 40 MB per Arrow batch through the pandas-UDF boundary.
ARROW_BATCH_ROWS = 10_000


def get_spark(
    app_name: str = "fluent_bit_spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]``. On a real
    cluster pass ``master=None`` with spark-submit providing the master;
    these conf values are equally valid there (AQE handles the rest).
    """
    if master is None:
        n = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
        master = f"local[{n}]"
    if shuffle_partitions is None:
        ncpu = os.cpu_count() or 8
        shuffle_partitions = max(8, ncpu)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # Local sandbox has no Iceberg runtime jar; in production add:
        #   spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
        #   spark.sql.catalog.logpipe=org.apache.iceberg.spark.SparkCatalog
        # io.py degrades to Parquet when the catalog is absent.
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
