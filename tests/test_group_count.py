"""count_rows_grouped + the SQL grouped-COUNT route: metadata fold over
identity partitions, graceful degrade for everything else."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.scan import TableScan


@pytest.fixture()
def gt(catalog, spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderstatus").build()
    t = catalog.create_table("db.gc", o, spec=spec)
    t.append(o)
    return t, o


def _want(o, *cols):
    return {tuple(r[c] for c in cols): r["count"]
            for r in o.groupBy(*cols).count().collect()}


def test_grouped_count_is_metadata_only(gt, spark):
    t, o = gt
    orig = TableScan._to_df_default
    TableScan._to_df_default = lambda self, tasks=None: (_ for _ in ()
                                                         ).throw(
        AssertionError("touched data"))
    try:
        got = t.new_scan().count_rows_grouped(["o_orderstatus"])
    finally:
        TableScan._to_df_default = orig
    assert {k[0]: v for k, v in got.items()} == \
        {k[0]: v for k, v in _want(o, "o_orderstatus").items()}


def test_grouped_count_degrades_with_filter_and_deletes(gt, spark):
    from linkedin_iceberg_spark.expressions import gt as egt
    from linkedin_iceberg_spark.expressions import eq
    t, o = gt
    # price conjunct: metrics can't decide most files -> real read
    got = t.new_scan().filter(egt("o_totalprice", 1000.0)) \
        .count_rows_grouped(["o_orderstatus"])
    want = _want(o.filter(F.col("o_totalprice") > 1000), "o_orderstatus")
    assert got == want
    # v2 deletes force the slow path; counts reflect the deletion
    t.row_delta(equality_delete_keys=spark.createDataFrame(
        [(1,)], "o_orderkey bigint"), key_cols=["o_orderkey"])
    got2 = t.new_scan().count_rows_grouped(["o_orderstatus"])
    want2 = _want(o.filter(F.col("o_orderkey") != 1), "o_orderstatus")
    assert got2 == want2


def test_non_partition_group_col_still_exact(gt, spark):
    t, o = gt
    got = t.new_scan().count_rows_grouped(["o_orderpriority"])
    assert got == _want(o, "o_orderpriority")


def test_sql_group_count_route_and_bails(catalog, spark, sf_dir, gt):
    t, o = gt
    out = catalog.sql(
        "SELECT o_orderstatus AS st, count(*) AS n FROM db.gc "
        "GROUP BY o_orderstatus ORDER BY n DESC, st")
    want = sorted(((r["o_orderstatus"], r["count"])
                   for r in o.groupBy("o_orderstatus").count().collect()),
                  key=lambda x: (-x[1], x[0]))
    assert [tuple(r) for r in out.collect()] == want
    # non-count aggregate in the list -> generic Spark route, same rows
    out2 = catalog.sql(
        "SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS s "
        "FROM db.gc GROUP BY o_orderstatus")
    assert out2.count() == len(want)


def test_show_partitions(catalog, spark, gt):
    # served as the partitions metadata relation (r8): one row per live
    # partition with record/file counts, strictly more than the bare
    # Hive string list
    rows = catalog.sql("SHOW PARTITIONS db.gc").collect()
    parts = sorted(r["partition"] for r in rows)
    assert len(parts) == 3
    for st, p in zip(("F", "O", "P"), parts):
        assert st in p
    t, o = gt
    assert sum(r["record_count"] for r in rows) == o.count()
    df = spark.createDataFrame([(1,)], "a long")
    catalog.create_table("db.unpart", df)
    with pytest.raises(ValueError, match="not partitioned"):
        catalog.sql("SHOW PARTITIONS db.unpart")


def test_grouped_minmax_metadata_and_sql(gt, catalog, spark):
    t, o = gt
    # pure metadata when bounds are exact (long col, identity groups)
    from linkedin_iceberg_spark.catalog.scan import TableScan
    orig = TableScan._to_df_default
    TableScan._to_df_default = lambda self, tasks=None: (_ for _ in ()
                                                         ).throw(
        AssertionError("touched data"))
    try:
        got = t.new_scan().agg_minmax_grouped(["o_orderstatus"],
                                              "o_orderkey")
    finally:
        TableScan._to_df_default = orig
    want = {(r["o_orderstatus"],): (r["lo"], r["hi"]) for r in
            o.groupBy("o_orderstatus")
            .agg(F.min("o_orderkey").alias("lo"),
                 F.max("o_orderkey").alias("hi")).collect()}
    assert got == want
    # SQL: mixed count + min/max items through the grouped route
    out = catalog.sql(
        "SELECT o_orderstatus AS st, count(*) AS n, "
        "min(o_orderkey) AS lo, max(o_orderkey) AS hi "
        "FROM db.gc GROUP BY o_orderstatus ORDER BY st")
    want2 = sorted((r["o_orderstatus"], r["n"], r["lo"], r["hi"])
                   for r in o.groupBy("o_orderstatus")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.min("o_orderkey").alias("lo"),
                        F.max("o_orderkey").alias("hi")).collect())
    assert [tuple(r) for r in out.collect()] == want2
    # double column (float family) degrades to a real scan, still exact
    out2 = catalog.sql(
        "SELECT o_orderstatus AS st, max(o_totalprice) AS m "
        "FROM db.gc GROUP BY o_orderstatus ORDER BY st")
    want3 = sorted((r["o_orderstatus"], r["m"])
                   for r in o.groupBy("o_orderstatus")
                   .agg(F.max("o_totalprice").alias("m")).collect())
    assert [(r[0], round(r[1], 2)) for r in out2.collect()] == \
        [(a, round(b, 2)) for a, b in want3]


def test_sql_group_having(gt, catalog, spark):
    t, o = gt
    want = sorted((r["o_orderstatus"], r["count"])
                  for r in o.groupBy("o_orderstatus").count().collect()
                  if r["count"] > 400)
    out = catalog.sql(
        "SELECT o_orderstatus AS st, count(*) AS n FROM db.gc "
        "GROUP BY o_orderstatus HAVING n > 400 ORDER BY st")
    assert [tuple(r) for r in out.collect()] == want
    # string comparison + <> spelling over an output group column
    out2 = catalog.sql(
        "SELECT o_orderstatus AS st, count(*) AS n FROM db.gc "
        "GROUP BY o_orderstatus HAVING st <> 'F' ORDER BY st")
    want2 = sorted((r["o_orderstatus"], r["count"])
                   for r in o.groupBy("o_orderstatus").count().collect()
                   if r["o_orderstatus"] != "F")
    assert [tuple(r) for r in out2.collect()] == want2
    # unsupported HAVING shape falls back to the generic route, same rows
    out3 = catalog.sql(
        "SELECT o_orderstatus, count(*) AS n FROM db.gc "
        "GROUP BY o_orderstatus HAVING n + 0 > 400")
    assert out3.count() == len(want)
