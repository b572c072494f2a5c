"""Scoped-persist carry/release contract (fluent_bit_spark.caching,
ADVICE r4: operator-internal persists must be releasable by long-lived
drivers)."""

from pyspark import StorageLevel
from pyspark.sql import functions as F

from fluent_bit_spark.caching import carry, release


def _cached_ids(spark):
    jsc = spark.sparkContext._jsc.sc()
    return {info.id() for info in
            jsc.getRDDStorageInfo()}


def test_carry_and_release_roundtrip(spark):
    base = spark.range(100)
    mid = base.withColumn("x", F.col("id") * 2) \
              .persist(StorageLevel.MEMORY_AND_DISK)
    out = carry(mid.filter("x > 10"), mid)
    out.count()
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) >= 1
    assert release(out) == 1
    assert release(out) == 0          # idempotent


def test_carry_composes_chained_handles(spark):
    a = spark.range(10).persist()
    r1 = carry(a.filter("id > 1"), a)
    b = r1.persist()
    r2 = carry(b.filter("id > 2"), b)
    # r2 carries both its own persist and the one r1 carried
    assert release(r2) == 2


def test_release_on_plain_frame_is_noop(spark):
    assert release(spark.range(3)) == 0


def test_operator_results_carry_their_persists(spark):
    from fluent_bit_spark.operators.tokens import tfidf_topk
    df = spark.createDataFrame(
        [(i, ["a", "b", "c", f"w{i}"]) for i in range(20)],
        "doc_id long, tokens array<string>")
    out = tfidf_topk(df, k=2)
    out.count()
    assert release(out) == 1
