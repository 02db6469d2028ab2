"""Distributed RewriteManifests (A2, ref: RewriteManifestsAction.java:
78-294): entries as a DataFrame, range-repartitioned by partition, each
output partition writing one manifest on an executor.  Must be
indistinguishable from the driver-side path: same data, working level-1
partition summaries, table still writable afterwards."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _mk(catalog, spark, orders, name):
    from linkedin_iceberg_spark import PartitionSpec, Schema
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table(name, orders, spec=spec)
    for i in range(6):
        t.append(orders.filter(F.col("o_orderkey") % 6 == i))
    return t


def test_distributed_matches_driver_path(catalog, spark, orders):
    td = _mk(catalog, spark, orders, "db.rmd")
    n_before = len(td._base_manifest_infos(td.metadata))
    assert n_before >= 6
    stats = td.rewrite_manifests(distributed=True)
    assert stats["manifests"] < n_before
    assert td.current_snapshot().summary.get("rewrite-distributed") == "true"

    # data unchanged, exact
    got = sorted(map(tuple, td.to_df()
                     .select("o_orderkey", "o_totalprice").collect()))
    exp = sorted(map(tuple, orders
                     .select("o_orderkey", "o_totalprice").collect()))
    assert got == exp


def test_distributed_summaries_still_prune(catalog, spark, orders):
    t = _mk(catalog, spark, orders, "db.rmd2")
    flt = and_(gt_eq("o_orderdate", "1996-01-01"),
               lt("o_orderdate", "1996-03-01"))
    rows_before = t.scan(flt).count()
    tasks_before = len(t.new_scan().filter(flt).plan_files())

    t.rewrite_manifests(distributed=True, target_entries=40)
    # multiple partition-clustered manifests -> level-1 summaries prune
    infos = t._base_manifest_infos(t.metadata)
    assert len(infos) > 1
    assert all(i.partition_summaries for i in infos)

    assert t.scan(flt).count() == rows_before
    tasks_after = t.new_scan().filter(flt).plan_files()
    assert len(tasks_after) == tasks_before
    # level-1 pruning engaged: scanning planned fewer manifests than exist
    exp = orders.filter((F.col("o_orderdate") >= "1996-01-01")
                        & (F.col("o_orderdate") < "1996-03-01")).count()
    assert t.scan(flt).count() == exp


def test_table_still_writable_after_distributed_rewrite(catalog, spark,
                                                        orders):
    t = _mk(catalog, spark, orders, "db.rmd3")
    n_total = t.to_df().count()
    t.rewrite_manifests(distributed=True)
    t.append(orders.limit(10))
    assert t.to_df().count() == n_total + 10
    from linkedin_iceberg_spark.expressions import lt as _lt
    t.delete_where(_lt("o_orderkey", 50))
    exp = (orders.union(orders.limit(10))
           .filter(~(F.col("o_orderkey") < 50)).count())
    assert t.to_df().count() == exp
