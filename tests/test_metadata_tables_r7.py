"""r7 metadata-relation additions: data_files / delete_files /
all_files / all_delete_files / metadata_log_entries / position_deletes
(ref: core/.../MetadataTableType.java — the remaining types; the
r1-r6 set covered snapshots..changes)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import gt_eq


@pytest.fixture()
def laden(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.mtab7", orders)
    t.append(orders)
    entries, _ = t._live_data_and_deletes()
    some_file = entries[0].data_file.file_path
    pos = spark.createDataFrame([(some_file, i) for i in range(5)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    keys = spark.createDataFrame([(k,) for k in range(10, 20)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    return t, some_file


def test_file_slices_partition_files_by_content(laden):
    t, _ = laden
    files = t.metadata_table("files")
    data = t.metadata_table("data_files")
    dels = t.metadata_table("delete_files")
    assert data.filter(F.col("content") != 0).count() == 0
    assert dels.filter(F.col("content") == 0).count() == 0
    assert data.count() + dels.count() == files.count()
    # both delete contents are live (pos-delete writes may span files)
    assert {r.content for r in dels.select("content").collect()} \
        == {1, 2}


def test_all_files_spans_history(laden, catalog):
    t, _ = laden
    # overwrite everything: current files shrink, all_files keeps the
    # originals reachable from older snapshots
    t.delete_where(gt_eq("o_orderkey", 0))
    t.refresh()
    live = t.metadata_table("files").count()
    alls = t.metadata_table("all_files").count()
    assert alls > live
    all_dels = t.metadata_table("all_delete_files")
    assert all_dels.filter(F.col("content") == 0).count() == 0
    assert all_dels.count() >= 2


def test_metadata_log_entries_grow_with_commits(laden):
    t, _ = laden
    log1 = t.metadata_table("metadata_log_entries").collect()
    assert len(log1) >= 1
    assert log1[-1].file == "(current)"
    t.update_properties(set_props={"k": "v"})
    t.refresh()
    log2 = t.metadata_table("metadata_log_entries").collect()
    assert len(log2) > len(log1)
    # rows are (timestamp, timestamp_ms, file) and timestamps ascend
    ms = [r.timestamp_ms for r in log2]
    assert ms == sorted(ms)


def test_position_deletes_rows(laden):
    t, some_file = laden
    pd_rows = t.metadata_table("position_deletes").collect()
    assert len(pd_rows) == 5
    assert {r.file_path for r in pd_rows} == {some_file}
    assert sorted(r.pos for r in pd_rows) == list(range(5))
    assert all(r.delete_file_path for r in pd_rows)


def test_position_deletes_empty(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.mtab7e", orders)
    t.append(orders)
    assert t.metadata_table("position_deletes").count() == 0


def test_new_relations_via_sql(laden, catalog):
    n = catalog.sql(
        "SELECT count(*) AS n FROM db.mtab7.delete_files").collect()[0].n
    assert n >= 2
    rows = catalog.sql(
        "SELECT file_path, pos FROM db.mtab7.position_deletes "
        "ORDER BY pos").collect()
    assert [r.pos for r in rows] == list(range(5))
    logs = catalog.sql("SELECT file FROM db.mtab7.metadata_log_entries"
                       ).collect()
    assert logs[-1].file == "(current)"


def test_metadata_log_entries_enriched_columns(laden, catalog):
    t, _ = laden
    rows = t.metadata_table("metadata_log_entries").collect()
    cur = rows[-1]
    assert cur.file == "(current)"
    assert cur.latest_snapshot_id == t.metadata.current_snapshot_id
    assert cur.latest_sequence_number == \
        t.metadata.last_sequence_number
    # older retained versions carry THEIR snapshot ids (ascending
    # sequence numbers along the log)
    seqs = [r.latest_sequence_number for r in rows
            if r.latest_sequence_number is not None]
    assert seqs == sorted(seqs)
    assert any(r.latest_snapshot_id != cur.latest_snapshot_id
               for r in rows[:-1])
