"""export_symlink_manifest: external-reader file lists consistent with
the engine snapshot (the HiveMetadataPreservingTableOperations analog)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.maintenance import (
    export_symlink_manifest,
    rewrite_data_files,
)


def _manifest_paths(res):
    out = []
    for m in res["manifests"]:
        with open(m) as fh:
            out.extend(line.strip() for line in fh if line.strip())
    return out


def _duck_read_count(paths, where=""):
    con = duckdb.connect()
    lst = "[" + ", ".join(f"'{p}'" for p in paths) + "]"
    w = f"WHERE {where}" if where else ""
    return con.execute(
        f"SELECT count(*) FROM read_parquet({lst}) {w}").fetchone()[0]


def test_export_matches_table_after_dml(catalog, spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderpriority").build()
    from linkedin_iceberg_spark.expressions import gt
    t = catalog.create_table("db.sym", o, spec=spec)
    t.append(o)
    # create dead files a naive directory read would wrongly include
    t = t.delete_where(gt("o_totalprice", 200000.0))
    t = t.append(o.filter(F.col("o_totalprice") > 300000)
                 .withColumn("o_totalprice", F.col("o_totalprice") * 0 + 1.0))

    res = export_symlink_manifest(t, str(tmp_path / "sym"))
    paths = _manifest_paths(res)
    assert res["files"] == len(paths) and paths
    # the manifest view equals the engine view exactly
    assert _duck_read_count(paths) == t.to_df().count()
    # partition layout: manifests live under key=value dirs
    assert all("o_orderpriority=" in m for m in res["manifests"])
    # ...and the naive directory listing disagrees (dead files exist)
    import glob
    all_files = glob.glob(os.path.join(t.location, "data", "**",
                                       "*.parquet"), recursive=True)
    assert len(all_files) > len(paths)


def test_export_refuses_pending_deletes_then_ok_after_compaction(
        catalog, spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1000)
    t = catalog.create_table("db.sym2", o)
    t.append(o)
    keys = o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    t = t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    with pytest.raises(ValueError, match="delete files"):
        export_symlink_manifest(t, str(tmp_path / "s2"))
    rewrite_data_files(t)
    t = catalog.load_table("db.sym2")
    res = export_symlink_manifest(t, str(tmp_path / "s2"))
    assert _duck_read_count(_manifest_paths(res)) == t.to_df().count()


def test_export_past_snapshot(catalog, spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500)
    t = catalog.create_table("db.sym3", o)
    t.append(o)
    snap1 = t.metadata.current_snapshot.snapshot_id
    t = t.append(o.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000))
    res_old = export_symlink_manifest(t, str(tmp_path / "old"),
                                      snapshot_id=snap1)
    res_new = export_symlink_manifest(t, str(tmp_path / "new"))
    assert _duck_read_count(_manifest_paths(res_old)) == 500
    assert _duck_read_count(_manifest_paths(res_new)) == 1000
    with pytest.raises(ValueError, match="unknown snapshot"):
        export_symlink_manifest(t, str(tmp_path / "x"), snapshot_id=12345)


def test_export_across_spec_evolution(catalog, spark, sf_dir, tmp_path):
    """Mixed-spec tables export correctly: files written under the OLD
    spec land in directories derived from THEIR spec's partition tuple
    (unpartitioned -> the root manifest), new-spec files under key=value
    dirs — and the union still equals the engine view."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") <= 8000)  # deterministic subset
    n = o.count()
    t = catalog.create_table("db.sym4", o)          # unpartitioned
    t.append(o.filter(F.col("o_orderkey") % 2 == 0))
    t = t.update_spec(lambda b: b.identity("o_orderpriority"))
    t.append(o.filter(F.col("o_orderkey") % 2 == 1))
    res = export_symlink_manifest(t, str(tmp_path / "mix"))
    roots = [m for m in res["manifests"]
             if os.path.dirname(m) == str(tmp_path / "mix")]
    parts = [m for m in res["manifests"] if "o_orderpriority=" in m]
    assert roots and parts
    assert _duck_read_count(_manifest_paths(res)) == t.to_df().count() == n


def test_reexport_removes_stale_partition_manifests(
        catalog, spark, sf_dir, tmp_path):
    """Re-exporting after a partition empties out must DELETE its old
    manifest — otherwise external readers resurrect dead files."""
    from linkedin_iceberg_spark.expressions import eq
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderpriority").build()
    t = catalog.create_table("db.sym5", o, spec=spec)
    t.append(o)
    dest = str(tmp_path / "re")
    export_symlink_manifest(t, dest)
    assert os.path.exists(os.path.join(dest, "o_orderpriority=1-URGENT",
                                       "manifest.txt"))
    t = t.delete_where(eq("o_orderpriority", "1-URGENT"))
    res = export_symlink_manifest(t, dest)
    assert res["stale_removed"] == 1
    assert not os.path.exists(os.path.join(dest,
                                           "o_orderpriority=1-URGENT",
                                           "manifest.txt"))
    assert _duck_read_count(_manifest_paths(res)) == t.to_df().count()
