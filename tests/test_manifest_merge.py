"""Manifest merge on commit (W1): manifest count stays bounded over many
appends (ref: core/.../ManifestMergeManager.java + TableProperties.java:38-45).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def orders_df(spark, sf_dir):
    import os
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _manifest_count(t) -> int:
    snap = t.current_snapshot()
    from linkedin_iceberg_spark.catalog import manifests as M
    return len(M.read_manifest_list(
        t.ops.new_metadata_path(snap.manifest_list),
        t.spec.partition_type()))


def test_append_merges_small_manifests(catalog, orders_df, spark):
    small = orders_df.limit(20).coalesce(1)
    t = catalog.create_table(
        "db.merge_small", orders_df,
        properties={"commit.manifest.min-count-to-merge": "8"})
    for _ in range(30):
        t.append(small)
    # without merging this would be 30 manifests; merge keeps it bounded
    # around the min-count threshold
    assert _manifest_count(t) <= 8, _manifest_count(t)
    assert t.to_df().count() == 30 * 20
    # entries keep their original snapshot/sequence numbers (time travel
    # and incremental scans still work through merged manifests)
    snaps = t.snapshots()
    mid = snaps[15].snapshot_id
    assert t.scan(snapshot_id=mid).count() == 16 * 20


def test_merge_respects_disable_flag(catalog, orders_df):
    small = orders_df.limit(5).coalesce(1)
    t = catalog.create_table(
        "db.merge_off", orders_df,
        properties={"commit.manifest.min-count-to-merge": "4",
                    "commit.manifest-merge.enabled": "false"})
    for _ in range(10):
        t.append(small)
    assert _manifest_count(t) == 10
    assert t.to_df().count() == 50


def test_merge_keeps_delete_manifests_separate(catalog, orders_df, spark):
    t = catalog.create_table(
        "db.merge_del", orders_df,
        properties={"commit.manifest.min-count-to-merge": "4"})
    t.append(orders_df)
    keys = spark.createDataFrame([(k,) for k in range(0, 50)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    small = orders_df.filter(F.col("o_orderkey") >= 100).limit(10).coalesce(1)
    for _ in range(12):
        t.append(small)
    from linkedin_iceberg_spark.catalog import manifests as M
    infos = M.read_manifest_list(
        t.ops.new_metadata_path(t.current_snapshot().manifest_list),
        t.spec.partition_type())
    # the delete manifest survives with its content marker intact
    assert any(i.content != M.CONTENT_DATA for i in infos)
    # deletes still apply after merging
    n = orders_df.count()
    n50 = orders_df.filter(F.col("o_orderkey") < 50).count()
    assert t.to_df().count() == n - n50 + 12 * 10
