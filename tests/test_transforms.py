"""Transform correctness: the reference's own spec test vectors
(api/src/test/java/org/apache/iceberg/transforms/TestBucketing.java:64-117,
TestDates/TestTimestamps ordinal semantics) + Python-vs-Spark parity —
the property that makes hidden-partition pruning safe."""

import datetime as dt
import uuid
from decimal import Decimal

import pytest

from linkedin_iceberg_spark.transforms.bucket_hash import (
    bucket_hash_bytes,
    murmur3_32,
)
from linkedin_iceberg_spark.transforms.transforms import (
    BucketTransform,
    TruncateTransform,
    parse_transform,
)


# -- spec vectors (TestBucketing.java:64-117, Iceberg spec Appendix B) -------
SPEC_VECTORS = [
    (34, "int", 2017239379),
    (34, "long", 2017239379),
    (dt.date(2017, 11, 16), "date", -653330422),
    ((22 * 3600 + 31 * 60 + 8) * 1_000_000, "time", -662762989),
    (dt.datetime(2017, 11, 16, 22, 31, 8), "timestamp", -2047944441),
    (dt.datetime(2017, 11, 16, 14, 31, 8,
                 tzinfo=dt.timezone(dt.timedelta(hours=-8))),
     "timestamptz", -2047944441),
    ("iceberg", "string", 1210000089),
    (uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"), "uuid", 1488055340),
    (Decimal("14.20"), "decimal(9,2)", -500754589),
    (b"\x00\x01\x02\x03", "binary", -188683207),
]


@pytest.mark.parametrize("value,type_str,expected", SPEC_VECTORS)
def test_bucket_hash_spec_vectors(value, type_str, expected):
    assert bucket_hash_bytes(value, type_str) == expected


def test_murmur3_empty_and_seed():
    assert murmur3_32(b"") == 0
    # hash of a 4-byte aligned block differs from unaligned tail
    assert murmur3_32(b"abcd") != murmur3_32(b"abc")


def test_bucket_mod_is_nonnegative():
    b = BucketTransform(16, "long")
    for v in (-1, -(2**40), 0, 2**40):
        assert 0 <= b.apply(v) < 16


def test_time_transform_ordinals():
    """year/month produce ordinals since epoch, NOT calendar values
    (ref: transforms/Dates.java:34-58, Timestamps.java:50)."""
    ts = dt.datetime(2017, 12, 1, 10, 30)
    assert parse_transform("year", "timestamp").apply(ts) == 2017 - 1970
    assert parse_transform("month", "timestamp").apply(ts) == \
        (2017 - 1970) * 12 + 11
    assert parse_transform("day", "timestamp").apply(ts) == \
        (dt.date(2017, 12, 1) - dt.date(1970, 1, 1)).days
    assert parse_transform("hour", "timestamp").apply(ts) == \
        ((dt.datetime(2017, 12, 1, 10) - dt.datetime(1970, 1, 1))
         .total_seconds() // 3600)


def test_truncate_semantics():
    t = TruncateTransform(10, "int")
    assert t.apply(1) == 0
    assert t.apply(-1) == -10       # floor-mod, not toward-zero
    assert t.apply(10) == 10
    assert TruncateTransform(3, "string").apply("iceberg") == "ice"
    assert TruncateTransform(2, "binary").apply(b"\x01\x02\x03") == b"\x01\x02"
    assert TruncateTransform(50, "decimal(9,2)").apply(Decimal("10.65")) == \
        Decimal("10.50")


def test_python_spark_bucket_parity(spark, sf_dir):
    """The pruning contract: the Python-side bucket (used to project
    predicates into partition space) must equal the Spark-side bucket (used
    to write partition values) on real data."""
    import os

    from pyspark.sql import functions as F
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_orderstatus").limit(200)
    bt_long = BucketTransform(16, "long")
    bt_str = BucketTransform(8, "string")
    got = (o.withColumn("bk", bt_long.to_spark_column(F.col("o_orderkey")))
           .withColumn("bs", bt_str.to_spark_column(F.col("o_orderstatus")))
           .collect())
    for r in got:
        assert r.bk == bt_long.apply(r.o_orderkey)
        assert r.bs == bt_str.apply(r.o_orderstatus)


def test_bucket_pruning_end_to_end(catalog, spark, sf_dir):
    import os

    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import eq, in_
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .bucket("o_custkey", 8).build()
    t = catalog.create_table("db.bkt", o, spec=spec)
    t.append(o)
    n_all = len(t.new_scan().plan_files())
    assert n_all >= 8
    pruned = t.new_scan().filter(eq("o_custkey", 7)).plan_files()
    assert len(pruned) < n_all  # only the matching bucket's files
    from pyspark.sql import functions as F
    assert t.scan(row_filter=eq("o_custkey", 7)).count() == \
        o.filter(F.col("o_custkey") == 7).count()
    # IN projects through bucket too
    pruned_in = t.new_scan().filter(in_("o_custkey", [7, 11])).plan_files()
    assert len(pruned_in) <= 2 * len(pruned) + 2


def test_truncate_pruning_end_to_end(catalog, spark, sf_dir):
    import os

    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import and_, gt_eq, lt
    from pyspark.sql import functions as F
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .truncate("o_custkey", 100).build()
    t = catalog.create_table("db.trunc", o, spec=spec)
    t.append(o)
    n_all = len(t.new_scan().plan_files())
    pred = and_(gt_eq("o_custkey", 100), lt("o_custkey", 300))
    pruned = t.new_scan().filter(pred).plan_files()
    assert 0 < len(pruned) < n_all
    assert t.scan(row_filter=pred).count() == \
        o.filter((F.col("o_custkey") >= 100)
                 & (F.col("o_custkey") < 300)).count()