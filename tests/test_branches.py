"""Snapshot branches: writable refs, branch DML isolation, fast-forward."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import lt
from linkedin_iceberg_spark.catalog.maintenance import expire_snapshots


@pytest.fixture()
def table(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.branchy", orders)
    t.append(orders)
    return t, orders


def _keys(h):
    return sorted(r["o_orderkey"]
                  for r in h.to_df().select("o_orderkey").collect())


def test_branch_commits_stay_off_main(table, spark):
    t, orders = table
    main_before = _keys(t)
    t.create_branch("dev")
    dev = t.branch("dev")
    extra = orders.filter(F.col("o_orderkey") < 100)
    dev.append(extra)
    dev.append(extra)
    # branch sees both appends, main sees neither
    assert len(_keys(dev)) == len(main_before) + 2 * extra.count()
    t.refresh()
    assert _keys(t) == main_before
    assert len(t.history()) == len(t.metadata.snapshot_log)


def test_branch_dml_and_fast_forward(table, spark):
    t, orders = table
    t.create_branch("work")
    w = t.branch("work")
    w.delete_where(lt("o_orderkey", 2000))
    assert all(k >= 2000 for k in _keys(w))
    t.refresh()
    assert min(_keys(t)) < 2000  # main untouched

    # main is an ancestor of work -> fast-forward allowed
    t.fast_forward("work")
    assert all(k >= 2000 for k in _keys(t))
    assert _keys(t) == _keys(t.branch("work"))


def test_fast_forward_refuses_divergence(table, spark):
    t, orders = table
    t.create_branch("dev")
    t.branch("dev").append(orders.limit(10))
    # main moves too -> diverged
    t.append(orders.limit(5))
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("dev")


def test_branch_guards_and_lifecycle(table, spark):
    t, orders = table
    t.create_branch("dev")
    dev = t.branch("dev")
    with pytest.raises(ValueError, match="main table handle"):
        dev.rollback_to(t.current_snapshot().snapshot_id)
    with pytest.raises(ValueError, match="main table handle"):
        dev.create_tag("x")
    with pytest.raises(ValueError, match="drop_branch"):
        t.drop_tag("dev")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dev")
    with pytest.raises(ValueError, match="unknown branch"):
        t.branch("nope")
    t.drop_branch("dev")
    with pytest.raises(ValueError, match="unknown branch"):
        t.branch("dev")


def test_expire_pins_branch_ancestry(table, spark):
    t, orders = table
    t.create_branch("keep")
    k = t.branch("keep")
    k.append(orders.limit(10))
    k.append(orders.limit(10))
    branch_lineage = set(t.metadata.ancestry(t.metadata.refs["keep"]))
    # advance main so old snapshots become expirable
    t.append(orders.limit(1))
    t.append(orders.limit(1))
    expire_snapshots(t, retain_last=1)
    t.refresh()
    live = {s.snapshot_id for s in t.snapshots()}
    assert branch_lineage <= live
    # branch still fully readable after expiry
    assert t.branch("keep").to_df().count() == orders.count() + 20
    # dropping the branch releases its lineage on the next expiry
    t.drop_branch("keep")
    expire_snapshots(t, retain_last=1)
    t.refresh()
    live2 = {s.snapshot_id for s in t.snapshots()}
    assert not ({sid for sid in branch_lineage
                 if sid not in t.metadata.ancestry()} & live2)
    assert t.to_df().count() == orders.count() + 2


def test_refs_metadata_table_shows_branch_type(table, spark):
    t, _ = table
    t.create_branch("dev")
    t.create_tag("rel1")
    rows = {r["name"]: r["type"]
            for r in t.metadata_table("refs").collect()}
    assert rows["main"] == "branch"
    assert rows["dev"] == "branch"
    assert rows["rel1"] == "tag"


def test_branch_sequence_scoped_deletes(table, spark):
    """Equality deletes on MAIN before the branch must keep applying on
    the branch, and branch-side appends after them must survive."""
    t, orders = table
    keys = spark.createDataFrame([(k,) for k in range(0, 30)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    n_deleted = orders.filter(F.col("o_orderkey") < 30).count()
    t.create_branch("b")
    b = t.branch("b")
    assert b.to_df().count() == orders.count() - n_deleted
    resurrect = orders.filter(F.col("o_orderkey") < 30)
    b.append(resurrect)  # higher sequence number -> survives the delete
    assert b.to_df().count() == orders.count()


def test_contended_branch_commits_chain(catalog, spark, table):
    """Two handles committing to the SAME branch: the loser's CAS retry
    re-reads the moved branch head and chains onto it — both appends
    land, exactly once, and main never moves.  Deterministic via the
    refresh hook (the rival lands between plan and CAS)."""
    t, orders = table
    t.create_branch("dev")
    a = t.branch("dev")
    b = t.branch("dev")
    main_head = t.metadata.current_snapshot_id
    base_n = a.to_df().count()

    orig = a.ops.refresh
    state = {"done": False}

    def racy():
        if not state["done"]:
            state["done"] = True
            b.append(orders.limit(5))  # rival lands first
        return orig()
    a.ops.refresh = racy
    a.append(orders.limit(3))

    t.refresh()
    assert t.metadata.current_snapshot_id == main_head  # main untouched
    dev = t.branch("dev")
    assert dev.to_df().count() == base_n + 5 + 3
    # the branch lineage chains: head's parent is the rival's commit
    head = t.metadata.snapshot_by_id(t.metadata.refs["dev"])
    parent = t.metadata.snapshot_by_id(head.parent_snapshot_id)
    assert parent is not None and \
        parent.parent_snapshot_id == main_head


def test_branch_commit_races_main_commit(catalog, spark, table):
    """A branch commit racing a MAIN commit: both land independently —
    the branch ref advances, main's head advances, neither clobbers the
    other's pointer."""
    t, orders = table
    t.create_branch("dev")
    dev = t.branch("dev")
    main_before = t.to_df().count()

    orig = dev.ops.refresh
    state = {"done": False}

    def racy():
        if not state["done"]:
            state["done"] = True
            t.append(orders.limit(4))  # main commit lands mid-branch-commit
        return orig()
    dev.ops.refresh = racy
    dev.append(orders.limit(2))

    fresh = catalog.load_table("db.branchy")
    assert fresh.to_df().count() == main_before + 4
    assert fresh.branch("dev").to_df().count() == main_before + 2


def test_ref_age_retention(table, spark):
    """maxRefAgeMs retention: an age-limited tag/branch stops pinning and
    is dropped by expire once its target snapshot outlives the limit;
    unlimited refs stay forever."""
    import time as _time
    t, orders = table
    t.append(orders.limit(5))
    old_head = t.current_snapshot().snapshot_id
    t.create_tag("ephemeral", max_ref_age_ms=1)       # expires instantly
    t.create_tag("forever")                            # no limit
    t.create_branch("stale_branch", max_ref_age_ms=1)
    t.append(orders.limit(1))                          # advance main
    _time.sleep(0.05)
    stats = expire_snapshots(t, retain_last=1)
    t.refresh()
    assert sorted(stats.get("dropped_refs", [])) == \
        ["ephemeral", "stale_branch"]
    assert set(t.metadata.refs) == {"forever"}
    # the unlimited tag still pins its snapshot
    assert t.metadata.snapshot_by_id(t.metadata.refs["forever"]) is not None
    assert t.metadata.refs["forever"] == old_head
