"""Catalog.snapshot_table: zero-copy clone with preserved delete semantics."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.catalog import AlreadyExistsError
from linkedin_iceberg_spark.catalog.maintenance import (
    expire_snapshots,
    remove_orphan_files,
)
from linkedin_iceberg_spark.expressions import lt


@pytest.fixture()
def source(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.clone_src", orders)
    t.append(orders.filter(F.col("o_orderkey") < 3000))
    t.append(orders.filter(F.col("o_orderkey") >= 3000))
    # live equality deletes so the clone must carry v2 delete files
    keys = spark.createDataFrame([(k,) for k in range(0, 40)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    return t, orders


def _keys(t):
    return sorted(r["o_orderkey"]
                  for r in t.to_df().select("o_orderkey").collect())


def test_clone_sees_source_rows_without_copying(catalog, source):
    t, _ = source
    clone = catalog.snapshot_table(t, "db.clone_a")
    assert _keys(clone) == _keys(t)
    # zero copy: nothing under the clone's data dir
    assert not os.path.isdir(os.path.join(clone.location, "data"))
    with pytest.raises(AlreadyExistsError):
        catalog.snapshot_table(t, "db.clone_a")


def test_clone_and_source_diverge_independently(catalog, source, spark):
    t, orders = source
    clone = catalog.snapshot_table(t, "db.clone_b")
    before = _keys(t)

    # write to the clone: source untouched
    clone.delete_where(lt("o_orderkey", 1000))
    assert _keys(t) == before
    assert _keys(clone) == [k for k in before if k >= 1000]

    # write to the source: clone untouched
    t.append(orders.filter(F.col("o_orderkey") < 100))
    clone_keys = _keys(clone)
    assert all(k >= 1000 for k in clone_keys)


def test_clone_preserves_equality_delete_scoping(catalog, source, spark):
    t, orders = source
    clone = catalog.snapshot_table(t, "db.clone_c")
    # keys 0..39 were eq-deleted in the source BEFORE the clone; appending
    # them to the clone must survive (the delete's sequence number is
    # preserved, new data lands strictly above it)
    resurrect = orders.filter(F.col("o_orderkey") < 40)
    n = resurrect.count()
    assert n > 0
    base = clone.to_df().count()
    clone.append(resurrect)
    assert clone.to_df().count() == base + n


def test_clone_of_branch_captures_branch_state(catalog, source, spark):
    t, orders = source
    t.create_branch("dev")
    t.branch("dev").append(orders.limit(7))
    main_n = t.to_df().count()
    c = catalog.snapshot_table(t.branch("dev"), "db.clone_br")
    assert c.to_df().count() == main_n + 7
    c2 = catalog.snapshot_table(t, "db.clone_main")
    assert c2.to_df().count() == main_n


def test_clone_refuses_physical_gc(catalog, source):
    t, _ = source
    clone = catalog.snapshot_table(t, "db.clone_d")
    with pytest.raises(ValueError, match="gc.enabled"):
        expire_snapshots(clone)
    with pytest.raises(ValueError, match="gc.enabled"):
        remove_orphan_files(clone)
    # the source itself is unrestricted
    assert "orphans_deleted" in remove_orphan_files(t, dry_run=True)


def test_clone_chain_drop_order_enforced(catalog, source):
    t, _ = source
    c1 = catalog.snapshot_table(t, "db.chain1")
    catalog.snapshot_table(c1, "db.chain2")  # grandchild shares t's files
    # c1 cannot be dropped in EITHER mode while chain2 depends on it
    with pytest.raises(ValueError, match="clones"):
        catalog.drop_table("db.chain1")
    with pytest.raises(ValueError, match="clones"):
        catalog.drop_table("db.chain1", purge=False)
    # leaf-first drop order releases cleanly and unfences the root
    catalog.drop_table("db.chain2")
    catalog.drop_table("db.chain1")
    t.refresh()
    assert "snapshot.clone-locations" not in t.properties
    assert "orphans_deleted" in remove_orphan_files(
        t, older_than_ms=int(1e18), dry_run=True)
