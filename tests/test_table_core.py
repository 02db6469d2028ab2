"""M1 exit tests: create/append/scan/time-travel end-to-end
(pattern per SURVEY.md §5 item 2 — metadata state asserts after each op)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import Catalog, PartitionSpec
from linkedin_iceberg_spark.expressions import (
    and_, eq, gt_eq, lt, in_, starts_with, is_null, not_null,
)
from tests.conftest import assert_df_equals_oracle


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_create_append_scan_matches_oracle(catalog, orders_df, sf_dir):
    spec = (PartitionSpec.builder_for(
        __import__("linkedin_iceberg_spark").Schema.from_spark(orders_df.schema))
        .month("o_orderdate").build())
    t = catalog.create_table("db.orders", orders_df, spec=spec)
    assert t.current_snapshot() is None
    t.append(orders_df)
    snap = t.current_snapshot()
    assert snap is not None and snap.operation == "append"

    # full scan row parity
    assert t.to_df().count() == orders_df.count()

    # filtered scan matches duckdb oracle
    result = (t.scan(row_filter=gt_eq("o_orderdate", "1995-01-01"))
              .groupBy("o_orderpriority")
              .agg(F.count("*").alias("n"))
              .orderBy("o_orderpriority"))
    assert_df_equals_oracle(
        result,
        """SELECT o_orderpriority, count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        sf_dir)


def test_scan_prunes_files(catalog, orders_df):
    from linkedin_iceberg_spark import Schema
    spec = PartitionSpec.builder_for(Schema.from_spark(orders_df.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.orders_pruned", orders_df, spec=spec)
    t.append(orders_df)
    all_tasks = t.new_scan().plan_files()
    assert len(all_tasks) > 1  # partitioned by day -> many files
    some = t.new_scan().filter(
        and_(gt_eq("o_orderdate", "1996-01-01"),
             lt("o_orderdate", "1996-02-01"))).plan_files()
    assert 0 < len(some) < len(all_tasks)
    # pruned scan still returns exactly the right rows
    cnt = t.scan(row_filter=and_(gt_eq("o_orderdate", "1996-01-01"),
                                 lt("o_orderdate", "1996-02-01"))).count()
    expected = orders_df.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-02-01")).count()
    assert cnt == expected


def test_time_travel(catalog, orders_df):
    t = catalog.create_table("db.orders_tt", orders_df)
    first_half = orders_df.limit(500)
    t.append(first_half)
    v1 = t.current_snapshot().snapshot_id
    t.append(orders_df)
    assert t.to_df().count() == 500 + orders_df.count()
    # travel back
    assert t.scan(snapshot_id=v1).count() == 500
    # snapshot log has 2 entries
    assert len(t.history()) == 2
    # rollback
    t.rollback_to(v1)
    assert t.to_df().count() == 500


def test_unpartitioned_append_and_filters(catalog, spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    t = catalog.create_table("db.li", li)
    t.append(li)
    r = t.scan(row_filter=in_("l_returnflag", ["A", "N"]))
    expected = li.filter(F.col("l_returnflag").isin("A", "N")).count()
    assert r.count() == expected
    r2 = t.scan(row_filter=starts_with("l_linestatus", "O"))
    assert r2.count() == li.filter(F.col("l_linestatus").startswith("O")).count()


def test_stats_pruning_unpartitioned(catalog, spark):
    import pandas as pd
    pdf = pd.DataFrame({"id": range(1000), "val": [f"v{i}" for i in range(1000)]})
    df = spark.createDataFrame(pdf).repartitionByRange(8, "id")
    t = catalog.create_table("db.stats_prune", df)
    t.append(df)
    tasks_all = t.new_scan().plan_files()
    assert len(tasks_all) >= 2
    # a point lookup should prune most files via min/max bounds
    tasks_point = t.new_scan().filter(eq("id", 5)).plan_files()
    assert len(tasks_point) < len(tasks_all)
    assert t.scan(row_filter=eq("id", 5)).count() == 1


def test_metrics_modes(catalog, spark):
    """W16 metrics modes: none/counts/truncate(N)/full change what the
    write path records (ref: core/.../MetricsModes.java:34-96)."""
    import pandas as pd
    pdf = pd.DataFrame({"id": range(100),
                        "s": ["x" * 40 + str(i) for i in range(100)]})
    df = spark.createDataFrame(pdf).coalesce(1)

    def file_of(mode):
        t = catalog.create_table(
            f"db.mm_{mode.replace('(', '').replace(')', '')}", df,
            properties={"write.metadata.metrics.default": mode})
        t.append(df)
        return t.new_scan().plan_files()[0].file

    f_none = file_of("none")
    assert f_none.record_count == 100
    assert not f_none.value_counts and not f_none.lower_bounds

    f_counts = file_of("counts")
    assert f_counts.value_counts and not f_counts.lower_bounds

    f_trunc = file_of("truncate(8)")
    sid = 2  # field id of "s"
    assert len(f_trunc.lower_bounds[sid]) == 8
    assert f_trunc.upper_bounds[sid] >= "x" * 40  # truncated UP

    f_full = file_of("full")
    assert len(f_full.lower_bounds[sid]) == 41


def test_append_merge_schema(catalog, spark, sf_dir):
    """Union-by-name evolution on append (ref: SchemaUpdate.applyChanges)."""
    import os
    from pyspark.sql import functions as F
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.merge_app", o)
    t.append(o.limit(100))
    extra = (o.limit(50).withColumn("channel", F.lit("web")))
    t.append(extra, merge_schema=True)
    df = t.to_df()
    assert "channel" in df.columns
    assert df.filter(F.col("channel") == "web").count() == 50
    assert df.filter(F.col("channel").isNull()).count() == 100
    # narrower df (missing cols) appends as nulls too
    t.append(o.limit(10).drop("o_orderpriority"), merge_schema=True)
    assert t.to_df().filter(F.col("o_orderpriority").isNull()).count() == 10


def test_sql_over_temp_view(catalog, spark, sf_dir, orders_df):
    """Raw SQL over a registered engine table."""
    t = catalog.create_table("db.sqlview", orders_df)
    t.append(orders_df)
    view = t.create_temp_view()
    got = spark.sql(
        f"SELECT o_orderpriority, count(*) AS n FROM {view} "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority").collect()
    exp = (orders_df.groupBy("o_orderpriority")
           .agg(F.count("*").alias("n"))
           .orderBy("o_orderpriority").collect())
    assert got == exp


def test_write_distribution_mode_range_splits_skewed_partition(catalog,
                                                               spark,
                                                               sf_dir):
    """r4: write.distribution-mode=range — one giant partition spreads
    across several writer tasks (contiguous sort ranges) instead of
    funneling through a single task, while data stays exact."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark import PartitionSpec, Schema

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .withColumn("bucket", F.when(F.col("o_orderkey") <= 100,
                                     F.col("o_orderkey") % 3)
                    .otherwise(F.lit(99)))  # partition 99 is giant
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .identity("bucket").build())
    t = catalog.create_table(
        "db.wdist", o, spec=spec,
        properties={"write.distribution-mode": "range",
                    "write.sort-by": "o_orderkey"})
    # test data is far below AQE's advisory partition size, so adaptive
    # coalescing would (correctly) merge the tiny ranges back into one —
    # pin it off to observe the at-scale behavior
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled",
                          "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.append(o)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       prev)
    assert t.to_df().count() == o.count()
    files = t.new_scan().plan_files()
    giant = [f for f in files if f.file.partition["bucket"] == 99]
    assert len(giant) > 1  # hash mode would write exactly one
    # range + sort: the giant partition's files carry non-overlapping
    # o_orderkey bounds -> stats pruning works inside the partition
    fid = t.schema.id_for_name("o_orderkey")
    bounds = sorted((f.file.lower_bounds[fid], f.file.upper_bounds[fid])
                    for f in giant)
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2
    # round-trip equality on a sample predicate
    assert t.to_df().filter("o_orderkey <= 100").count() == \
        o.filter(F.col("o_orderkey") <= 100).count()


def test_write_distribution_mode_validation(catalog, spark, sf_dir):
    import pytest as _pytest
    from pyspark.sql import functions as F
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(10)
    t = catalog.create_table("db.wdist2", o,
                             properties={"write.distribution-mode": "bogus"})
    with _pytest.raises(ValueError, match="distribution-mode"):
        t.append(o)


def test_snapshot_summary_rolling_totals(catalog, spark, sf_dir):
    """r4: every snapshot carries O(1) rolling totals (SnapshotSummary
    parity) — append, CoW delete, upsert, and compaction all keep them
    consistent with the actual live state."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.expressions import lt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(400)
    t = catalog.create_table("db.totals", o)

    def totals():
        s = t.metadata.current_snapshot.summary
        return (int(s["total-records"]), int(s["total-data-files"]),
                int(s["total-delete-files"]))

    t.append(o)
    assert totals()[0] == 400 and totals()[2] == 0
    t.delete_where(lt("o_orderkey", 50))
    t.refresh()
    n = t.to_df().count()
    assert totals()[0] == n                      # CoW delete adjusted
    t.upsert(o.limit(20).withColumn("o_totalprice", F.lit(9.0)),
             ["o_orderkey"])
    t.refresh()
    rec, files, dels = totals()
    assert dels == 1                              # the eq-delete file
    assert rec >= n                               # upsert rows appended
    t.rewrite_data_files(min_input_files=1, remove_dangling=True)
    t.refresh()
    rec, files, dels = totals()
    assert rec == t.to_df().count()               # compaction nets out
    assert dels == 0                              # dangling removal
