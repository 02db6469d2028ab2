"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in linkedin_iceberg_spark.queries (registry of
(spark_fn, oracle_sql) pairs; oracle-less entries are non-SQL-expressible
and get the rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkedin_iceberg_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: engine table end-to-end — create a hidden-partitioned table
    from sf0.001 orders, append, prune-scan, join + aggregate."""
    import tempfile

    from pyspark.sql import functions as F

    from linkedin_iceberg_spark import Catalog, PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import gt_eq

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    cat = Catalog(spark, tempfile.mkdtemp(prefix="liceberg_entry_"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = cat.create_table("entry.orders", orders, spec=spec)
    t.append(orders)

    scanned = t.scan(row_filter=gt_eq("o_orderdate", "1995-01-01"))
    return (scanned.join(F.broadcast(customer),
                         scanned.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .orderBy("c_mktsegment"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
