"""Maintenance actions (A1-A4) + metadata tables (S13) + FindFiles/
ScanSummary (S11-S12) — metadata state asserts after each op, the
reference's TableTestBase pattern (SURVEY.md §5.2)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.expressions import gt_eq


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_rewrite_data_files_compacts(catalog, orders_df):
    t = catalog.create_table("db.compact", orders_df)
    # 4 small appends -> 4+ small files
    for i in range(4):
        t.append(orders_df.filter(F.col("o_orderkey") % 4 == i))
    n_before = len(t.new_scan().plan_files())
    assert n_before >= 4
    total = t.to_df().count()

    stats = t.rewrite_data_files(min_input_files=2)
    assert stats["rewritten_files"] >= 4
    assert stats["added_files"] < stats["rewritten_files"]
    # data unchanged, fewer files
    assert t.to_df().count() == total
    assert len(t.new_scan().plan_files()) < n_before
    assert t.current_snapshot().operation == "replace"


def test_rewrite_manifests_clusters(catalog, orders_df):
    t = catalog.create_table("db.reman", orders_df)
    for i in range(3):
        t.append(orders_df.filter(F.col("o_orderkey") % 3 == i))
    # 3 appends -> 3 manifests
    assert t.metadata_table("manifests").count() == 3
    total = t.to_df().count()
    t.rewrite_manifests()
    assert t.metadata_table("manifests").count() == 1
    assert t.to_df().count() == total


def test_expire_snapshots_deletes_unreachable(catalog, orders_df):
    t = catalog.create_table("db.expire", orders_df)
    t.append(orders_df.limit(100))
    t.append(orders_df.limit(200))
    t.overwrite_partitions if False else None
    # rewrite makes the first files unreachable from the new snapshot
    t.rewrite_data_files(min_input_files=2)
    files_before = {task.file.file_path for task in t.new_scan().plan_files()}
    n_snaps = len(t.snapshots())
    assert n_snaps == 3

    stats = t.expire_snapshots(retain_last=1)
    assert stats["expired_snapshots"] == 2
    assert stats["deleted_data_files"] > 0
    assert len(t.snapshots()) == 1
    # surviving files intact, table still reads
    assert {task.file.file_path for task in t.new_scan().plan_files()} \
        == files_before
    for p in files_before:
        assert os.path.exists(p)
    assert t.to_df().count() == 300


def test_remove_orphan_files(catalog, orders_df):
    t = catalog.create_table("db.orphan", orders_df)
    t.append(orders_df.limit(100))
    # plant an orphan in the data dir
    orphan_dir = os.path.join(t.location, "data", "stray")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "junk.parquet")
    orders_df.limit(1).toPandas().to_parquet(orphan)
    live = {task.file.file_path for task in t.new_scan().plan_files()}

    stats = t.remove_orphan_files(older_than_ms=2**62)  # no age gate in test
    assert stats["orphans_deleted"] == 1
    assert not os.path.exists(orphan)
    for p in live:
        assert os.path.exists(p)
    assert t.to_df().count() == 100


def test_metadata_tables(catalog, orders_df):
    schema = Schema.from_spark(orders_df.schema)
    spec = PartitionSpec.builder_for(schema).identity("o_orderstatus").build()
    t = catalog.create_table("db.meta", orders_df, spec=spec)
    t.append(orders_df)
    t.append(orders_df.limit(10))

    snaps = t.metadata_table("snapshots")
    assert snaps.count() == 2
    assert set(snaps.select("operation").distinct().toPandas()["operation"]) \
        == {"append"}

    hist = t.metadata_table("history").toPandas()
    assert list(hist["is_current_ancestor"]) == [True, True]

    files = t.metadata_table("files")
    n_status = orders_df.select("o_orderstatus").distinct().count()
    assert files.count() >= n_status
    assert files.filter(F.col("record_count") <= 0).count() == 0

    parts = t.metadata_table("partitions").toPandas()
    assert len(parts) == n_status
    assert parts["record_count"].sum() == orders_df.count() + 10

    assert t.metadata_table("entries").count() == files.count()
    assert t.metadata_table("all_manifests").count() >= \
        t.metadata_table("manifests").count()
    refs = t.metadata_table("refs").toPandas()
    assert list(refs["name"]) == ["main"]


def test_find_files_and_scan_summary(catalog, orders_df):
    from linkedin_iceberg_spark.catalog.find_files import FindFiles, scan_summary
    schema = Schema.from_spark(orders_df.schema)
    spec = PartitionSpec.builder_for(schema).identity("o_orderstatus").build()
    t = catalog.create_table("db.ff", orders_df, spec=spec)
    t.append(orders_df)

    all_files = FindFiles.in_table(t).collect()
    by_part = FindFiles.in_table(t) \
        .in_partition({"o_orderstatus": "F"}).collect()
    assert 0 < len(by_part) < len(all_files)
    assert all(f.partition == {"o_orderstatus": "F"} for f in by_part)

    by_filter = FindFiles.in_table(t) \
        .with_metadata_matching(gt_eq("o_totalprice", 1e9)).collect()
    assert len(by_filter) == 0  # bounds prove no file can match

    summ = scan_summary(t)
    assert sum(s["row_count"] for s in summ.values()) == orders_df.count()


def test_partial_progress_compaction(catalog, spark, sf_dir):
    """r4: per-group commits — completed groups stay durable even when a
    later group's commit fails (ref: RewriteDataFiles partial progress)."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark import PartitionSpec, Schema

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.year("o_orderdate") == 1995)
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .month("o_orderdate").build())
    t = catalog.create_table("db.ppc", o, spec=spec)
    for i in range(3):
        t.append(o.filter(F.col("o_orderkey") % 3 == i))
    n = t.to_df().count()
    files0 = len(t.new_scan().plan_files())

    res = t.rewrite_data_files(target_size_bytes=8 * 1024,
                               min_input_files=2, partial_progress=True,
                               max_groups_per_commit=2)
    assert res["commits"] > 1                      # really incremental
    assert t.to_df().count() == n
    assert len(t.new_scan().plan_files()) < files0
    # one REPLACE snapshot per batch
    replaces = [s for s in t.metadata.snapshots if s.operation == "replace"]
    assert len(replaces) == res["commits"]


def test_partial_progress_keeps_completed_batches_on_failure(catalog, spark,
                                                             sf_dir):
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark import PartitionSpec, Schema

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.year("o_orderdate") == 1995)
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .month("o_orderdate").build())
    t = catalog.create_table("db.ppf", o, spec=spec)
    for i in range(2):
        t.append(o.filter(F.col("o_orderkey") % 2 == i))
    n = t.to_df().count()

    orig = t.rewrite_files
    calls = {"n": 0}

    def failing(removed_paths, added_files):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated commit failure")
        return orig(removed_paths, added_files)

    t.rewrite_files = failing
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated"):
        t.rewrite_data_files(target_size_bytes=8 * 1024, min_input_files=2,
                             partial_progress=True, max_groups_per_commit=1)
    t.rewrite_files = orig
    t.refresh()
    # the two committed batches are durable, data intact throughout
    replaces = [s for s in t.metadata.snapshots if s.operation == "replace"]
    assert len(replaces) == 2
    assert t.to_df().count() == n


def test_remove_dangling_deletes(catalog, spark, sf_dir):
    """r4: eq-delete files whose targets were all compacted away are
    dropped from metadata; reads unchanged, external export unblocked."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.catalog.maintenance import (
        export_symlink_manifest)

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(800)
    t = catalog.create_table("db.dangling", o)
    t.append(o)
    t.upsert(o.limit(100).withColumn("o_totalprice", F.lit(1.0)),
             ["o_orderkey"])
    t.refresh()
    n = t.to_df().count()
    _data, dels = t._live_data_and_deletes()
    assert len(dels) == 1  # the upsert's eq-delete file is live

    # nothing dangles yet: the delete still guards the original file
    assert t.remove_dangling_deletes()["removed_delete_files"] == 0

    # compaction applies the delete and rewrites data at a higher seq
    t.rewrite_data_files(min_input_files=1)
    t.refresh()
    res = t.remove_dangling_deletes()
    assert res["removed_delete_files"] == 1
    t.refresh()
    _data, dels = t._live_data_and_deletes()
    assert dels == []
    assert t.to_df().count() == n
    assert all(not task.deletes for task in t.new_scan().plan_files())
    # the external-reader export (which refuses unapplied deletes) works
    import tempfile
    out = export_symlink_manifest(t, tempfile.mkdtemp())
    assert out["files"] > 0


def test_compaction_with_remove_dangling_option(catalog, spark, sf_dir):
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(600)
    t = catalog.create_table("db.rdopt", o)
    t.append(o)
    t.upsert(o.limit(50).withColumn("o_totalprice", F.lit(2.0)),
             ["o_orderkey"])
    t.refresh()
    n = t.to_df().count()
    res = t.rewrite_data_files(min_input_files=1, remove_dangling=True)
    assert res["removed_delete_files"] == 1
    t.refresh()
    _d, dels = t._live_data_and_deletes()
    assert dels == [] and t.to_df().count() == n


def test_rewrite_data_files_where_scopes_compaction(catalog, spark, sf_dir):
    """r8: where= compacts only the files the predicate might touch
    (BaseRewriteDataFilesAction.filter) -- cold partitions keep their
    original files byte-for-byte; the CALL route parses the predicate."""
    import os

    from pyspark.sql import functions as F

    from linkedin_iceberg_spark import PartitionSpec, Schema
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderstatus").build()
    t = catalog.create_table("db.cmpw", o.limit(0), spec=spec)
    for i in range(3):  # 3 small files per partition
        t.append(o.filter(F.col("o_orderkey") % 3 == i))
    ent = t._live_entries()
    before = {e.data_file.file_path for e in ent}
    cold = {e.data_file.file_path for e in ent
            if e.data_file.partition.get("o_orderstatus") == "F"}
    hot = {e.data_file.file_path for e in ent
           if e.data_file.partition.get("o_orderstatus") == "O"}
    assert cold and hot
    sql = ("CALL rewrite_data_files('db.cmpw', "
           + "where => 'o_orderstatus = " + "''" + "O" + "''" + "')")
    catalog.sql(sql)
    t.refresh()
    after = {e.data_file.file_path for e in t._live_entries()}
    assert cold <= after  # untouched partition's files survive verbatim
    gone = before - after
    assert gone and gone <= hot
    assert sorted(r.o_orderkey for r in t.to_df().collect()) == \
        sorted(r.o_orderkey for r in o.collect())
