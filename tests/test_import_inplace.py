"""In-place (metadata-only) import: Table.add_files / Catalog.import_table.

ref: spark/.../SparkTableUtil.java:122-280 (importSparkTable/listPartition —
list existing files, collect footer metrics, append; no data rewrite) and
core/.../mapping/NameMapping.java (name-based column resolution for files
without engine field ids).
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def hive_dir(spark, tmp_path):
    """A Hive-layout parquet dataset partitioned by region (3 values,
    incl. a null partition) — written by plain Spark, no engine metadata."""
    src = str(tmp_path / "src")
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 7).alias("val"),
        F.when(F.col("id") % 3 == 0, "emea")
         .when(F.col("id") % 3 == 1, "apac").alias("region"))
    df.write.partitionBy("region").parquet(src)
    return src


def test_add_files_unpartitioned(catalog, spark, tmp_path):
    src = str(tmp_path / "flat")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("v")).write.parquet(src)
    t = catalog.create_table("db.flat", spark.read.parquet(src))
    t.add_files(src)

    assert t.to_df().count() == 100
    # metadata-only: manifest entries point INTO the source dir
    entries = t._live_entries()
    assert entries and all(
        e.data_file.file_path.startswith(os.path.abspath(src))
        for e in entries)
    # footer metrics were collected
    e0 = entries[0].data_file
    assert e0.record_count > 0 and e0.lower_bounds and e0.upper_bounds
    # no data files were copied under the table location
    tdata = os.path.join(t.location, "data")
    copied = [f for _r, _d, fs in os.walk(tdata) for f in fs] \
        if os.path.isdir(tdata) else []
    assert copied == []


def test_import_table_hive_partitioned(catalog, spark, hive_dir):
    t = catalog.import_table("db.imported", hive_dir)

    # spec inferred as identity(region)
    assert [f.transform_str for f in t.spec.fields] == ["identity"]
    assert [f.source_name for f in t.spec.fields] == ["region"]

    got = t.to_df()
    exp = spark.read.parquet(hive_dir)
    assert got.count() == 300
    assert sorted(got.columns) == sorted(exp.columns)
    # values match, including the reconstructed partition column
    assert got.exceptAll(exp.select(*got.columns)).count() == 0
    assert exp.select(*got.columns).exceptAll(got).count() == 0


def test_imported_partition_pruning(catalog, spark, hive_dir):
    from linkedin_iceberg_spark.expressions import eq

    t = catalog.import_table("db.pruned", hive_dir)
    all_tasks = t.new_scan().plan_files()
    emea_tasks = t.new_scan().filter(eq("region", "emea")).plan_files()
    # pruning happened at PLAN time: strictly fewer files
    assert 0 < len(emea_tasks) < len(all_tasks)
    df = t.scan(eq("region", "emea"))
    assert df.count() == 100
    assert df.select("region").distinct().collect()[0][0] == "emea"


def test_imported_null_partition(catalog, spark, hive_dir):
    t = catalog.import_table("db.nullpart", hive_dir)
    # ids with id % 3 == 2 got a null region (Hive default partition)
    n_null = t.to_df().filter(F.col("region").isNull()).count()
    assert n_null == 100


def test_schema_evolution_after_import(catalog, spark, hive_dir):
    """Name mapping: imported files are matched by name at import time and
    by field id afterwards — a rename must not corrupt them."""
    t = catalog.import_table("db.evolved", hive_dir)
    t.update_schema().rename_column("val", "value") \
        .add_column("extra", "string").commit()

    df = t.to_df()
    assert "value" in df.columns and "val" not in df.columns
    assert df.filter(F.col("value").isNotNull()).count() == 300
    assert df.filter(F.col("extra").isNull()).count() == 300

    # partition column rename also survives (id-based alignment over the
    # basePath-reconstructed column)
    t.update_schema().rename_column("region", "geo").commit()
    df2 = t.refresh().to_df()
    assert df2.filter(F.col("geo") == "emea").count() == 100


def test_local_read_of_imported(catalog, spark, hive_dir):
    """to_arrow injects partition values from the manifest tuple."""
    t = catalog.import_table("db.localread", hive_dir)
    tbl = t.new_scan().to_arrow()
    assert tbl.num_rows == 300
    regions = tbl.column("region").to_pylist()
    assert regions.count("emea") == 100 and regions.count(None) == 100


def test_add_files_then_engine_append(catalog, spark, hive_dir):
    """Mixed table: imported files + engine-written files coexist."""
    t = catalog.import_table("db.mixed", hive_dir)
    extra = spark.createDataFrame(
        [(1000, 5, "latam")], ["id", "val", "region"])
    t.append(extra)
    df = t.to_df()
    assert df.count() == 301
    assert df.filter(F.col("region") == "latam").count() == 1
    # and deletes work across both kinds of files
    from linkedin_iceberg_spark.expressions import eq
    t.delete_where(eq("region", "apac"))
    assert t.refresh().to_df().count() == 201


def test_add_files_rejects_non_identity(catalog, spark, tmp_path):
    from linkedin_iceberg_spark.catalog.spec import PartitionSpec
    from linkedin_iceberg_spark.schema import Schema

    src = str(tmp_path / "flat2")
    spark.range(0, 10).write.parquet(src)
    schema = Schema.from_spark(spark.read.parquet(src).schema)
    spec = PartitionSpec.builder_for(schema).bucket("id", 4).build()
    t = catalog.create_table("db.bad", schema, spec=spec)
    with pytest.raises(ValueError, match="identity"):
        t.add_files(src)


def test_expire_never_deletes_imported_files(catalog, spark, hive_dir):
    """Source files of an in-place import survive snapshot expiry even
    after being logically replaced (gc.enabled=false discipline)."""
    import glob
    t = catalog.import_table("db.expire_safe", hive_dir)
    src_files = set(glob.glob(os.path.join(hive_dir, "**", "*.parquet"),
                              recursive=True))
    # rewrite everything: imported files become unreferenced by HEAD
    from linkedin_iceberg_spark.expressions import gt_eq
    t.delete_where(gt_eq("id", 0))
    stats = t.refresh().expire_snapshots(retain_last=1)
    assert stats["expired_snapshots"] >= 1
    assert stats.get("external_files_kept", 0) > 0
    still = set(glob.glob(os.path.join(hive_dir, "**", "*.parquet"),
                          recursive=True))
    assert still == src_files  # every source file intact


def test_spec_evolution_after_import(catalog, spark, hive_dir):
    """In-place import -> evolve the spec -> engine-written files under the
    new spec coexist with imported Hive-layout files; scans and pruning
    stay correct across both."""
    from linkedin_iceberg_spark.expressions import eq

    t = catalog.import_table("db.imp_ev", hive_dir)          # identity(region)
    t.update_spec(lambda b: b.identity("region").bucket("id", 4))
    extra = spark.createDataFrame([(9000 + i, 1, "emea") for i in range(8)],
                                  ["id", "val", "region"])
    t.append(extra)
    df = t.to_df()
    assert df.count() == 308
    got = t.scan(eq("region", "emea")).count()
    assert got == 108
    # imported files keep spec 0, new files carry spec 1
    sids = {e.data_file.spec_id for e in t._live_entries()}
    assert sids == {0, 1}


def test_add_files_orc(catalog, spark, tmp_path):
    src = str(tmp_path / "orcflat")
    spark.range(0, 60).select(F.col("id"), (F.col("id") * 3).alias("w")) \
        .write.format("orc").save(src)
    t = catalog.create_table("db.orcimp", spark.read.format("orc").load(src))
    t.add_files(src, fmt="orc")
    assert t.to_df().count() == 60
    assert t.to_df().agg(F.sum("w")).collect()[0][0] == sum(3 * i for i in range(60))
    entries = t._live_entries()
    assert all(e.data_file.file_format == "orc" for e in entries)
    assert entries[0].data_file.record_count > 0
