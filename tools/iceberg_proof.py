"""Iceberg surface proof: run the full TableIO Iceberg branch when the
runtime jar is present, and record a transcript.

The sandbox has no Iceberg runtime jar and no network to fetch one
(SURVEY §1.2), so the Iceberg branches of sources/tables.py cannot
execute here — this script is the evidence path for ANY jar-present
environment: point it at the jar and it exercises, against a local
hadoop-type catalog in a temp dir:

  1. TableIO.resolve → fmt == "iceberg"
  2. partitioned write + read-back
  3. upsert (a real MERGE INTO: update one row, insert one row)
  4. overwrite_partitions (writeTo().overwritePartitions(): replace one
     partition, prove the other survives)
  5. storage-partitioned join over two tables partitioned by
     bucket(8, key) with SPJ confs on — asserts the physical plan
     contains NO Exchange (the Iceberg analogue of write_bucketed's
     zero-shuffle SMJ, tests/test_plan_shape.py)

Usage (any environment WITH the jar):
    ICEBERG_JAR=/path/iceberg-spark-runtime-4.0_2.13-<ver>.jar \
        python tools/iceberg_proof.py [--transcript BENCH/ICEBERG.md]
or let Spark fetch it (network required):
    ICEBERG_PKG=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
        python tools/iceberg_proof.py

Exit 0 + transcript on success; exit 3 with a clear message when the
runtime is absent (the sandbox outcome — the point is that flipping it
to green needs ONLY the jar, no code changes; the same condition gates
tests/test_tables.py::test_iceberg_roundtrip_when_runtime_present).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcript", default=None)
    args = ap.parse_args()

    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.sources.tables import TableIO, iceberg_available

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    conf = {
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "hadoop",
        "spark.sql.catalog.lake.warehouse": wh,
        # SPJ: avoid shuffles when both sides share the partition transform
        "spark.sql.sources.v2.bucketing.enabled": "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled": "true",
        "spark.sql.iceberg.planning.preserve-data-grouping": "true",
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        "spark.sql.adaptive.enabled": "false",  # keep the SPJ plan visible
    }
    if os.environ.get("ICEBERG_JAR"):
        conf["spark.jars"] = os.environ["ICEBERG_JAR"]
    if os.environ.get("ICEBERG_PKG"):
        conf["spark.jars.packages"] = os.environ["ICEBERG_PKG"]
    spark = get_spark(app_name="iceberg_proof", extra_conf=conf)

    if not iceberg_available(spark):
        print("ICEBERG RUNTIME ABSENT: set ICEBERG_JAR or ICEBERG_PKG "
              "(sandbox has neither the jar nor network — SURVEY §1.2). "
              "No code change is needed to flip this green.")
        spark.stop()
        return 3

    log: list[str] = [f"# Iceberg surface transcript "
                      f"({time.strftime('%Y-%m-%d %H:%M')}, warehouse {wh})",
                      ""]

    def step(msg: str) -> None:
        print(f"[iceberg_proof] {msg}")
        log.append(f"- {msg}")

    io = TableIO.resolve(spark, prefer="iceberg")
    assert io.fmt == "iceberg", io.fmt
    step("resolve → iceberg")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
    t = "lake.db.tokens_proof"
    df = spark.createDataFrame(
        [("d1", 3, "s1"), ("d2", 5, "s1"), ("d3", 2, "s2")],
        "doc_id string, n_tok int, source string")
    io.write(df, t, partition_by=["source"])
    assert io.read(spark, t).count() == 3
    step("partitioned write + read-back: 3 rows")

    up = spark.createDataFrame([("d2", 99, "s1"), ("d4", 1, "s3")],
                               "doc_id string, n_tok int, source string")
    io.upsert(up, t, key="doc_id")
    got = {r.doc_id: r.n_tok for r in io.read(spark, t).collect()}
    assert got == {"d1": 3, "d2": 99, "d3": 2, "d4": 1}, got
    step("MERGE INTO upsert: d2 updated, d4 inserted")

    ow = spark.createDataFrame([("dX", 7, "s2")],
                               "doc_id string, n_tok int, source string")
    io.overwrite_partitions(ow, t, partition_by=["source"])
    got = {(r.doc_id, r.source) for r in io.read(spark, t).collect()}
    assert ("dX", "s2") in got and ("d3", "s2") not in got, got
    assert ("d1", "s1") in got, got
    step("overwritePartitions: s2 replaced, s1 untouched")

    for name in ("lake.db.spj_a", "lake.db.spj_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} (k BIGINT, v BIGINT) "
                  f"USING iceberg PARTITIONED BY (bucket(8, k))")
    spark.range(10_000).selectExpr("id AS k", "id * 2 AS v") \
        .writeTo("lake.db.spj_a").append()
    spark.range(10_000).selectExpr("id AS k", "id * 3 AS v") \
        .writeTo("lake.db.spj_b").append()
    j = spark.table("lake.db.spj_a").join(
        spark.table("lake.db.spj_b"), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Exchange" not in plan, plan
    assert j.count() == 10_000
    step("storage-partitioned join on bucket(8, k): zero Exchange, "
         "10000 rows")

    if args.transcript:
        with open(args.transcript, "w") as f:
            f.write("\n".join(log) + "\n")
        step(f"transcript → {args.transcript}")
    print("ICEBERG PROOF OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
