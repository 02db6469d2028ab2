"""Property checks for the hash-split and z-order primitives."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.zorder import zorder_value
from linkedin_iceberg_spark.operators.text import split_assign


def test_split_assign_stable_and_weighted(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id: r.split for r in
         split_assign(d, "doc_id").select("doc_id", "split").collect()}
    # stability: repartitioning / row order never changes an assignment
    b = {r.doc_id: r.split for r in
         split_assign(d.repartition(7).orderBy(F.rand(seed=1)), "doc_id")
         .select("doc_id", "split").collect()}
    assert a == b
    # appends don't move earlier rows: a subset gets identical labels
    c = {r.doc_id: r.split for r in
         split_assign(d.filter(F.col("doc_id") < 100), "doc_id")
         .select("doc_id", "split").collect()}
    assert all(a[k] == v for k, v in c.items())
    # rough distribution (n=500, 90/5/5)
    from collections import Counter
    counts = Counter(a.values())
    assert counts["train"] > 400
    assert 1 <= counts["val"] <= 60 and 1 <= counts["test"] <= 60
    # a different salt re-rolls some assignments
    s2 = {r.doc_id: r.split for r in
          split_assign(d, "doc_id", salt="v2")
          .select("doc_id", "split").collect()}
    assert s2 != a


def test_split_assign_rejects_bad_weights(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="sum to 100"):
        split_assign(d, "doc_id", weights={"a": 50, "b": 20})


def test_zorder_single_column_is_monotone(spark, sf_dir):
    """With one z-column, the z-value order must equal the column order
    (the interleave degenerates to the scaled code)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    z = zorder_value(o, ["o_totalprice"])
    rows = (o.withColumn("_z", z)
            .select("o_totalprice", "_z")
            .orderBy("o_totalprice").collect())
    zs = [r._z for r in rows]
    assert zs == sorted(zs)


def test_zorder_two_columns_bounded(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    z = zorder_value(o, ["o_orderkey", "o_custkey"], bits=16)
    mx = o.withColumn("_z", z).agg(F.max("_z"), F.min("_z")).collect()[0]
    assert 0 <= mx[1] <= mx[0] < (1 << 32)  # 2 cols x 16 bits
