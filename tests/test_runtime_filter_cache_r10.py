"""r10 (r9 verdict ask #4): runtime_filtered_join evaluates the build
side ONCE — the planning collect materializes it via an eager
localCheckpoint, and the join consumes the checkpointed partitions
instead of re-running the dim's scan+filter."""

import os

from pyspark.sql import functions as F


def test_join_plan_reads_checkpointed_build_side(catalog, spark, sf_dir):
    from linkedin_iceberg_spark.catalog.runtime_filter import (
        runtime_filtered_join)

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.rtf_cache", orders)
    t.append(orders)
    dim = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .filter(F.col("c_mktsegment") == "BUILDING")
           .select("c_custkey", "c_name"))
    out = runtime_filtered_join(t, dim, "o_custkey", "c_custkey")

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the build side must come from the checkpointed RDD, not a second
    # parquet scan of the dim
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "customer.parquet" not in plan

    # and the rows are still the plain-join rows
    expected = (orders.join(dim, orders.o_custkey == dim.c_custkey)
                .count())
    assert out.count() == expected


def test_rows_identical_above_max_keys(catalog, spark, sf_dir):
    """The envelope/bloom path (keys > max_keys) also consumes the
    checkpointed build side; values unchanged."""
    from linkedin_iceberg_spark.catalog.runtime_filter import (
        runtime_filtered_join)

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.rtf_cache2", orders)
    t.append(orders)
    dim = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .select("c_custkey", "c_acctbal"))
    out = runtime_filtered_join(t, dim, "o_custkey", "c_custkey",
                                max_keys=5)
    expected = (orders.join(dim, orders.o_custkey == dim.c_custkey)
                .count())
    assert out.count() == expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "customer.parquet" not in plan
