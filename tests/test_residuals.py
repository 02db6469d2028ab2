"""Residual evaluation (ref: api/.../expressions/ResidualEvaluator.java:52-118
and its tests in api/src/test/.../TestResidualEvaluator.java): the part of a
filter the partition tuple already guarantees folds away; only the rest is
applied to rows at read time."""

import os

import pytest

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.expressions import and_, bind, eq, gt, gt_eq, lt, or_
from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    Operation,
    Predicate,
)
from linkedin_iceberg_spark.expressions.residuals import (
    ResidualEvaluator,
    residual_of,
)
from tests.conftest import assert_df_equals_oracle


@pytest.fixture()
def sch(spark):
    df = spark.range(1).selectExpr(
        "cast(3 as int) as month_col", "cast(1.0 as double) as amount",
        "cast(id as long) as uid")
    return Schema.from_spark(df.schema)


def test_identity_partition_folds_true_and_false(sch):
    spec = PartitionSpec.builder_for(sch).identity("month_col").build() \
        .bind(sch)
    bound = bind(sch, and_(eq("month_col", 3), gt("amount", 10.0)))
    r = residual_of(spec, bound, {"month_col": 3})
    assert isinstance(r, Predicate) and r.op == Operation.GT  # amount > 10
    assert isinstance(residual_of(spec, bound, {"month_col": 4}), AlwaysFalse)


def test_filter_entirely_on_partition_col_folds_to_true(sch):
    spec = PartitionSpec.builder_for(sch).identity("month_col").build() \
        .bind(sch)
    bound = bind(sch, and_(gt_eq("month_col", 2), lt("month_col", 5)))
    assert isinstance(residual_of(spec, bound, {"month_col": 3}), AlwaysTrue)


def test_or_branch_folding(sch):
    spec = PartitionSpec.builder_for(sch).identity("month_col").build() \
        .bind(sch)
    bound = bind(sch, or_(eq("month_col", 7), gt("amount", 100.0)))
    # month matches: OR is satisfied for every row -> TRUE
    assert isinstance(residual_of(spec, bound, {"month_col": 7}), AlwaysTrue)
    # month differs: only the amount branch survives
    r = residual_of(spec, bound, {"month_col": 1})
    assert isinstance(r, Predicate) and r.op == Operation.GT


def test_bucket_partition_keeps_predicate_or_rules_out(sch):
    from linkedin_iceberg_spark.transforms.transforms import BucketTransform
    spec = PartitionSpec.builder_for(sch).bucket("uid", 16).build().bind(sch)
    bound = bind(sch, eq("uid", 5))
    b = BucketTransform(16, "long").apply(5)
    # matching bucket: bucket equality can't guarantee row equality -> keep
    r = residual_of(spec, bound, {"uid_bucket": b})
    assert isinstance(r, Predicate) and r.op == Operation.EQ
    # non-matching bucket: no row can match
    assert isinstance(
        residual_of(spec, bound, {"uid_bucket": (b + 1) % 16}), AlwaysFalse)


def test_unpartitioned_residual_is_filter_itself(sch):
    spec = PartitionSpec.unpartitioned().bind(sch)
    bound = bind(sch, gt("amount", 10.0))
    r = residual_of(spec, bound, {})
    assert isinstance(r, Predicate) and r.op == Operation.GT


def test_residual_evaluator_caches_by_partition(sch):
    spec = PartitionSpec.builder_for(sch).identity("month_col").build() \
        .bind(sch)
    ev = ResidualEvaluator(spec, bind(sch, eq("month_col", 3)))
    r1 = ev.residual_for({"month_col": 3})
    r2 = ev.residual_for({"month_col": 3})
    assert r1 is r2 and isinstance(r1, AlwaysTrue)


# --------------------------------------------------------------- end-to-end
def test_scan_residual_skips_filter_on_partition_only_query(
        catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.orders_resid", orders, spec=spec)
    t.append(orders)

    # month-aligned range: every surviving file's residual folds to TRUE
    scan = t.new_scan().filter(
        and_(gt_eq("o_orderdate", "1995-01-01"), lt("o_orderdate", "1995-04-01")))
    tasks = scan.plan_files()
    assert tasks and all(isinstance(tk.residual, AlwaysTrue) for tk in tasks)
    # and the physical plan carries no row-filter node for it (the scan's
    # own description still mentions "DataFilters: []" etc., so look for an
    # actual Filter operator)
    import re
    plan = scan.to_df()._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter \(", plan), plan

    assert_df_equals_oracle(
        scan.to_df().groupBy().count().withColumnRenamed("count", "n"),
        """SELECT count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1995-04-01'""",
        sf_dir)


def test_scan_residual_mixed_filter_still_correct(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.orders_resid2", orders, spec=spec)
    t.append(orders)

    scan = t.new_scan().filter(
        and_(gt_eq("o_orderdate", "1995-01-01"),
             lt("o_orderdate", "1995-04-01"),
             gt("o_totalprice", 50000.0)))
    tasks = scan.plan_files()
    # month part folds away; the price predicate survives per file
    assert tasks and all(isinstance(tk.residual, Predicate) for tk in tasks)
    assert_df_equals_oracle(
        scan.to_df().groupBy().count().withColumnRenamed("count", "n"),
        """SELECT count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1995-04-01'
             AND o_totalprice > 50000.0""",
        sf_dir)


def test_many_residual_groups_collapse(catalog, spark, sf_dir):
    """>32 distinct residuals must collapse to one full-filter read (the
    unionByName analyzer-pathology safety valve) and stay correct."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import gt_eq
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .day("o_orderdate").build()
    t = catalog.create_table("db.manyres", o, spec=spec)
    t.append(o.limit(3000))
    # day partitioning at sf0.001 -> hundreds of partitions; a timestamp
    # range filter leaves boundary-day residuals per partition
    flt = gt_eq("o_orderdate", "1995-06-15")
    got = t.scan(flt).count()
    exp = o.limit(3000).filter(F.col("o_orderdate") >= "1995-06-15").count()
    assert got == exp
