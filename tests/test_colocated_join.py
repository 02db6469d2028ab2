"""Co-located bucket join (catalog/colocated.py): zero-shuffle,
no-join-operator plan when both sides bucket the key with one modulus;
byte-identical rows to the plain Spark join on every path, including
every documented fallback."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.colocated import colocated_bucket_join

from conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _customer(spark):
    return (spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
            .withColumnRenamed("c_custkey", "o_custkey"))


def _bucketed(catalog, name, df, n=8):
    spec = PartitionSpec.builder_for(Schema.from_spark(df.schema)) \
        .bucket("o_custkey", n).build()
    t = catalog.create_table(name, df, spec=spec)
    t.append(df)
    return t


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_inner_no_shuffle_no_join_operator(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    j = colocated_bucket_join(
        t1, t2, "o_custkey",
        left_cols=["o_custkey", "o_orderkey", "o_totalprice"],
        right_cols=["o_custkey", "c_name", "c_acctbal"])
    plan = _plan(j)
    assert "Exchange" not in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct"):
        assert op not in plan
    assert "MapInPandas" in plan
    got = j.orderBy("o_orderkey").collect()
    want = (o.select("o_custkey", "o_orderkey", "o_totalprice")
            .join(c.select("o_custkey", "c_name", "c_acctbal"),
                  "o_custkey", "inner")
            .orderBy("o_orderkey").collect())
    assert got == want


def test_left_join_lonely_buckets(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    sparse = c.filter(F.col("o_custkey") % 5 == 0)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", sparse)
    j = colocated_bucket_join(
        t1, t2, "o_custkey", how="left",
        left_cols=["o_custkey", "o_orderkey"],
        right_cols=["o_custkey", "c_name"])
    assert "Exchange" not in _plan(j)
    got = j.orderBy("o_orderkey").collect()
    want = (o.select("o_custkey", "o_orderkey")
            .join(sparse.select("o_custkey", "c_name"), "o_custkey",
                  "left")
            .orderBy("o_orderkey").collect())
    assert got == want


def test_fallback_unbucketed_and_mismatched_modulus(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o, n=8)
    flat = catalog.create_table("db.dflat", c)
    flat.append(c)
    j = colocated_bucket_join(t1, flat, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"])
    want = o.join(c, "o_custkey").count()
    assert j.count() == want
    t3 = _bucketed(catalog, "db.d16", c, n=16)
    j2 = colocated_bucket_join(t1, t3, "o_custkey",
                               left_cols=["o_custkey", "o_orderkey"],
                               right_cols=["o_custkey", "c_name"])
    assert j2.count() == want


def test_fallback_pending_deletes(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    # a v2 equality delete leaves delete files pending -> the
    # co-located path must not serve stale rows
    t1.row_delta(
        equality_delete_keys=o.filter(F.col("o_orderkey") < 500)
        .select("o_orderkey"),
        key_cols=["o_orderkey"])
    j = colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"])
    want = (o.filter(F.col("o_orderkey") >= 500)
            .join(c, "o_custkey").count())
    assert j.count() == want


def test_schema_evolution_rename_and_new_column(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    # rename a projected column after the files were written: the rev
    # map realigns by field id
    t1.update_schema().rename_column("o_totalprice", "price").commit()
    j = colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_custkey", "price"],
                              right_cols=["o_custkey", "c_name"])
    assert "Exchange" not in _plan(j)
    assert j.count() == o.join(c, "o_custkey").count()
    assert j.agg(F.sum("price")).head()[0] == pytest.approx(
        o.join(c.select("o_custkey"), "o_custkey")
        .agg(F.sum("o_totalprice")).head()[0])
    # a column none of the files carry reads as NULL
    t2.update_schema().add_column("c_tier", "string").commit()
    j2 = colocated_bucket_join(t1, t2, "o_custkey",
                               left_cols=["o_custkey", "price"],
                               right_cols=["o_custkey", "c_tier"])
    assert j2.where(F.col("c_tier").isNotNull()).count() == 0
    assert j2.count() == o.join(c, "o_custkey").count()


def test_validation(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim",
                   c.withColumn("o_orderkey", F.lit(1)))
    with pytest.raises(ValueError, match="disjoint"):
        colocated_bucket_join(t1, t2, "o_custkey")
    with pytest.raises(ValueError, match="must be selected"):
        colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_orderkey"],
                              right_cols=["o_custkey"])
    with pytest.raises(ValueError, match="inner|left"):
        colocated_bucket_join(t1, t2, "o_custkey", how="full")
