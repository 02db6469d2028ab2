"""Legacy Hive table adapter: read a plain Hive-partitioned directory
through the Table/TableScan API with partition pruning + residuals.

ref: hive-metastore/.../legacy/LegacyHiveTable.java:52-118,
LegacyHiveTableScan.java:48-92, HiveExpressions.java:34-52, and the
scan-shape assertions in TestLegacyHiveTableScan.java.
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.legacy_hive import (
    LegacyHiveTable,
    simplify_partition_filter,
)
from linkedin_iceberg_spark.expressions import (
    and_,
    bind,
    eq,
    gt,
    in_,
    is_null,
    not_,
    or_,
)
from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysTrue,
    Predicate,
)


@pytest.fixture()
def hive_dir(spark, tmp_path):
    """region=<str>/bucket=<int> two-level Hive layout with a null
    partition (__HIVE_DEFAULT_PARTITION__)."""
    rows = [Row(id=i, v=float(i) * 1.5,
                region=None if i % 10 == 9 else ["na", "eu", "ap"][i % 3],
                bucket=i % 4)
            for i in range(200)]
    path = str(tmp_path / "hive_tbl")
    spark.createDataFrame(rows).write \
        .partitionBy("region", "bucket").parquet(path)
    return path


def test_discovery(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    assert t._part_cols == ["region", "bucket"]
    assert [pf.transform_str for pf in t.spec.fields] == \
        ["identity", "identity"]
    assert set(t.schema.column_names()) == {"id", "v", "region", "bucket"}


def test_simplify_partition_filter_inclusive():
    # non-partition predicates become TRUE, even under NOT/OR
    f = and_(eq("region", "eu"), gt("v", 10.0))
    s = simplify_partition_filter(f, {"region", "bucket"})
    assert isinstance(s, Predicate) and s.term.name == "region"
    # OR with a non-partition side must widen to TRUE, not drop the branch
    s2 = simplify_partition_filter(
        or_(eq("region", "eu"), gt("v", 10.0)), {"region"})
    assert isinstance(s2, AlwaysTrue)
    # NOT over a non-partition predicate may not invert the TRUE replacement
    s3 = simplify_partition_filter(not_(gt("v", 10.0)), {"region"})
    assert isinstance(s3, AlwaysTrue)


def test_partition_pruning_file_counts(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    all_tasks = t.scan().plan_files()
    pruned = t.scan(row_filter=eq("region", "eu")).plan_files()
    assert 0 < len(pruned) < len(all_tasks)
    assert all(task.file.partition["region"] == "eu" for task in pruned)
    # two-level pruning
    both = t.scan(row_filter=and_(eq("region", "eu"),
                                  eq("bucket", 2))).plan_files()
    assert all(task.file.partition == {"region": "eu", "bucket": 2}
               for task in both)
    assert 0 < len(both) < len(pruned)


def test_residuals_decide_row_filtering(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    # pure partition predicate -> AlwaysTrue residual on every kept task
    tasks = t.scan(row_filter=eq("region", "na")).plan_files()
    assert all(isinstance(task.residual, AlwaysTrue) for task in tasks)
    # mixed predicate -> the non-partition part survives as residual
    tasks = t.scan(row_filter=and_(eq("region", "na"),
                                   gt("v", 30.0))).plan_files()
    assert all(isinstance(task.residual, Predicate) and
               task.residual.term.name == "v" for task in tasks)


def test_scan_results_match_spark(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    got = (t.scan(row_filter=and_(in_("region", ["eu", "ap"]), gt("v", 30.0)),
                  selected=["id", "region", "bucket", "v"])
           .to_df().orderBy("id").collect())
    want = (spark.read.parquet(hive_dir)
            .filter(F.col("region").isin("eu", "ap") & (F.col("v") > 30.0))
            .select("id", "region", "bucket", "v").orderBy("id").collect())
    assert got == want


def test_null_partition_is_null(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    tasks = t.scan(row_filter=is_null("region")).plan_files()
    assert tasks and all(task.file.partition["region"] is None
                         for task in tasks)
    got = t.scan(row_filter=is_null("region")).to_df()
    want = spark.read.parquet(hive_dir).filter(F.col("region").isNull())
    assert got.count() == want.count() == 20


def test_int_partition_values_decoded(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    tasks = t.scan(row_filter=eq("bucket", 3)).plan_files()
    assert tasks and all(task.file.partition["bucket"] == 3
                         for task in tasks)


def test_empty_match_keeps_schema(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    df = t.scan(row_filter=eq("region", "nowhere")).to_df()
    assert df.count() == 0
    assert set(df.columns) == {"id", "v", "region", "bucket"}


def test_unpartitioned_dir(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(50).withColumn("x", F.col("id") * 2).write.parquet(path)
    t = LegacyHiveTable(spark, path)
    assert t._part_cols == [] and not t.spec.is_partitioned()
    assert t.scan(row_filter=gt("x", 50)).to_df().count() == 24
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert len(t.scan().plan_files()) == n_files


def test_read_only_surface(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    for m in (t.current_snapshot, t.snapshots, t.history):
        with pytest.raises(NotImplementedError):
            m()
    with pytest.raises(NotImplementedError):
        t.append(None)


def test_orc_hive_layout(spark, tmp_path):
    """ORC legacy tables work identically (the reference's legacy adapter
    reads whatever the Hive storage handler wrote — parquet/ORC/Avro)."""
    path = str(tmp_path / "orc_tbl")
    rows = [Row(id=i, grp=["x", "y"][i % 2]) for i in range(40)]
    spark.createDataFrame(rows).write.partitionBy("grp").orc(path)
    t = LegacyHiveTable(spark, path, fmt="orc")
    assert t._part_cols == ["grp"]
    tasks = t.scan(row_filter=eq("grp", "x")).plan_files()
    assert tasks and all(task.file.partition["grp"] == "x"
                         for task in tasks)
    assert t.scan(row_filter=eq("grp", "x")).to_df().count() == 20


def test_catalog_entry_point(spark, catalog, hive_dir):
    t = catalog.legacy_table(hive_dir)
    assert isinstance(t, LegacyHiveTable)
    assert t.scan(row_filter=eq("region", "na")).to_df().count() > 0


def test_filter_binds_and_rejects_unknown_column(spark, hive_dir):
    t = LegacyHiveTable(spark, hive_dir)
    with pytest.raises(ValueError):
        t.scan(row_filter=eq("no_such_col", 1)).plan_files()
    # binding coerces: int literal against long column works
    bound = bind(t.schema, eq("id", 5))
    assert bound is not None


def test_special_char_partition_values(spark, tmp_path):
    """Spark percent-escapes special characters in partition directory
    names; the adapter must decode them back to the original values
    (urllib.parse.unquote mirrors Hive's FileUtils.escapePathName)."""
    vals = ["a b", "x=y", "p/q", "naïve", "100%", "c:d"]
    rows = [Row(id=i, grp=vals[i % len(vals)]) for i in range(30)]
    path = str(tmp_path / "esc")
    spark.createDataFrame(rows).write.partitionBy("grp").parquet(path)
    t = LegacyHiveTable(spark, path)
    seen = {task.file.partition["grp"] for task in t.scan().plan_files()}
    assert seen == set(vals)
    for v in vals:
        tasks = t.scan(row_filter=eq("grp", v)).plan_files()
        assert tasks and all(task.file.partition["grp"] == v
                             for task in tasks)
        got = t.scan(row_filter=eq("grp", v)).to_df().count()
        want = spark.read.parquet(path).filter(F.col("grp") == v).count()
        assert got == want == 5
