"""Regression tests for the r4-late review pass: clone-source GC fencing,
branch-ref protection, rolling totals across delete-file swaps, no-op
fast-forward, and the trigram join fallback."""

import json
import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.maintenance import (
    expire_snapshots,
    remove_orphan_files,
    rewrite_position_deletes,
)
from linkedin_iceberg_spark.expressions import gt_eq
from linkedin_iceberg_spark.operators.text import trigram_novelty


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_source_gc_blocked_while_clone_exists(catalog, orders):
    t = catalog.create_table("db.srcgc", orders)
    t.append(orders)
    catalog.snapshot_table(t, "db.srcgc_clone")
    t.refresh()
    assert json.loads(t.properties["snapshot.clone-locations"])
    # the dangerous direction: deleting the SOURCE's files would corrupt
    # the clone — both actions refuse (dry runs stay allowed)
    t.append(orders.limit(5))
    with pytest.raises(ValueError, match="clones"):
        expire_snapshots(t, retain_last=1)
    with pytest.raises(ValueError, match="clones"):
        remove_orphan_files(t)
    assert "expired_snapshots" in expire_snapshots(t, retain_last=1,
                                                   dry_run=True)
    # purging the source outright is refused too
    with pytest.raises(ValueError, match="clones"):
        catalog.drop_table("db.srcgc")
    # dropping the clone auto-releases; maintenance unblocks
    catalog.drop_table("db.srcgc_clone")
    t.refresh()
    assert "snapshot.clone-locations" not in t.properties
    assert expire_snapshots(t, retain_last=1)["expired_snapshots"] >= 1


def test_create_tag_cannot_clobber_branch(catalog, orders):
    t = catalog.create_table("db.tagbr", orders)
    t.append(orders)
    first = t.current_snapshot().snapshot_id
    t.create_branch("dev")
    t.branch("dev").append(orders.limit(5))
    with pytest.raises(ValueError, match="branch"):
        t.create_tag("dev", snapshot_id=first, replace=True)
    # the branch head survived
    t.refresh()
    assert t.metadata.refs["dev"] != first


def test_rolling_totals_across_pos_delete_rewrite(catalog, orders):
    t = catalog.create_table("db.totals", orders)
    t.append(orders.orderBy("o_orderkey").coalesce(1))
    fa = t.new_scan().plan_files()[0].file.file_path
    for lo in (0, 3):  # two overlapping delete commits
        pos = [(fa, p) for p in range(lo, lo + 4)]
        t.row_delta(position_deletes=t.spark.createDataFrame(
            pos, "file_path string, pos bigint").coalesce(1))
    n_visible = t.to_df().count()
    before = t.current_snapshot().summary
    out = rewrite_position_deletes(t)
    assert out["rewritten_delete_files"] == 2
    after = t.current_snapshot().summary
    # data totals unchanged; delete-file total nets removed vs added
    assert after["total-data-files"] == before["total-data-files"]
    assert after["total-records"] == before["total-records"]
    assert int(after["total-delete-files"]) == \
        int(before["total-delete-files"]) - 2 + out["added_delete_files"]
    assert after["deleted-data-files"] == "0"
    assert after["added-data-files"] == "0"
    assert t.to_df().count() == n_visible


def test_fast_forward_noop_no_version_bump(catalog, orders):
    t = catalog.create_table("db.ffnoop", orders)
    t.append(orders)
    t.create_branch("dev")
    t.branch("dev").append(orders.limit(3))
    t.fast_forward("dev")
    t.refresh()  # compare on-disk state (in-memory log lags by one)
    v = t.version
    n = len(t.metadata.metadata_log)
    head = t.metadata.current_snapshot_id
    t.fast_forward("dev")  # already at head
    assert t.version == v
    assert len(t.metadata.metadata_log) == n
    assert t.metadata.current_snapshot_id == head


def test_trigram_shuffle_join_matches_broadcast(spark, sf_dir):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .limit(100)
    a = sorted(map(tuple, trigram_novelty(d).collect()))
    b = sorted(map(tuple,
                   trigram_novelty(d, broadcast_freq=False).collect()))
    assert a == b
