"""merge_branch: re-apply a diverged branch's exclusive commits onto main
as ONE atomic conflict-validated commit with per-entry remapped sequence
numbers (ref: core/.../SnapshotManager.java:65-171 generalized to branch
refs).  Disjoint work merges clean; overlapping DML raises BEFORE any
commit; a concurrent commit mid-merge retries the WHOLE merge — never a
partial prefix."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.metadata import ValidationException
from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


@pytest.fixture()
def table(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # disjoint halves so branch/main DML can provably not overlap
    # sf0.001 orders span o_orderkey 0..~1500; single-file halves so
    # "disjoint DML" provably touches disjoint FILES
    t = catalog.create_table("db.mergey", orders)
    t.append(orders.filter(F.col("o_orderkey") < 750).coalesce(1))
    t.append(orders.filter(F.col("o_orderkey") >= 750).coalesce(1))
    return t, orders


def _keys(h):
    return sorted(r["o_orderkey"]
                  for r in h.to_df().select("o_orderkey").collect())


def test_fast_forward_case_delegates(table):
    t, _ = table
    t.create_branch("ff")
    b = t.branch("ff")
    b.delete_where(lt("o_orderkey", 100))
    t.merge_branch("ff")  # main never diverged -> fast-forward
    assert min(_keys(t)) >= 100
    assert t.metadata.current_snapshot_id == t.metadata.refs["ff"]


def test_disjoint_dml_series_merges_clean(table, spark):
    t, orders = table
    before = _keys(t)
    t.create_branch("dev")
    dev = t.branch("dev")
    # branch: two exclusive commits on the LOW half (one file)
    dev.delete_where(lt("o_orderkey", 500))
    extra = orders.filter(F.col("o_orderkey") < 50) \
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    dev.append(extra.coalesce(1))
    # main diverges on the HIGH half (the other file)
    t.delete_where(gt_eq("o_orderkey", 1200))

    n_snaps_before = len(t.metadata.ancestry())
    seq_before = t.metadata.last_sequence_number
    t.merge_branch("dev")
    got = _keys(t)
    want = sorted([k for k in before if 500 <= k < 1200] +
                  [k + 1_000_000 for k in before if k < 50])
    assert got == want
    # the whole series lands as ONE atomic commit (r6) that consumes one
    # sequence number per merged branch commit, so per-entry delete
    # scoping replays exactly
    assert len(t.metadata.ancestry()) == n_snaps_before + 1
    snap = t.metadata.current_snapshot
    assert snap.summary["merged-branch"] == "dev"
    assert snap.summary["merged-commits"] == "2"
    assert t.metadata.last_sequence_number == seq_before + 2


def test_overlapping_dml_raises_before_any_commit(table):
    t, _ = table
    t.create_branch("clash")
    b = t.branch("clash")
    b.delete_where(lt("o_orderkey", 500))     # rewrites the low files
    t.delete_where(lt("o_orderkey", 200))     # main rewrites them TOO
    head_before = t.metadata.current_snapshot_id
    with pytest.raises(ValidationException, match="overlapping DML"):
        t.merge_branch("clash")
    t.refresh()
    assert t.metadata.current_snapshot_id == head_before  # nothing landed


def test_branch_delete_hitting_main_data_raises(table, spark):
    t, orders = table
    t.create_branch("ed")
    b = t.branch("ed")
    # branch eq-deletes keys 100..150
    keys = spark.createDataFrame([(k,) for k in range(100, 150)],
                                 "o_orderkey bigint")
    b.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    # main appends NEW rows in that key range after divergence — the
    # re-applied delete would outrank and kill them
    t.append(orders.filter(F.col("o_orderkey").between(100, 149))
             .coalesce(1))
    with pytest.raises(ValidationException, match="may hit"):
        t.merge_branch("ed")


def test_within_branch_delete_scoping_survives_merge(table, spark):
    t, orders = table
    t.create_branch("seq")
    b = t.branch("seq")
    # branch: append dup rows, THEN eq-delete the originals+dups of a key
    # range far from main's divergence
    dup = orders.filter(F.col("o_orderkey").between(1000, 1019))
    b.append(dup)
    keys = spark.createDataFrame([(k,) for k in range(1000, 1010)],
                                 "o_orderkey bigint")
    b.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    # main diverges with an unrelated append (disjoint key bounds)
    t.append(orders.filter(F.col("o_orderkey") >= 1400)
             .withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000)
             .coalesce(1))
    t.merge_branch("seq")
    got = t.to_df().filter(F.col("o_orderkey").between(1000, 1019))
    # 1000..1009 fully dead (orig + dup); 1010..1019 doubled
    assert got.filter(F.col("o_orderkey") < 1010).count() == 0
    assert got.filter(F.col("o_orderkey") >= 1010).count() == \
        2 * dup.filter(F.col("o_orderkey") >= 1010).count()


def test_concurrent_commit_mid_merge_never_partial(table, catalog, spark,
                                                   monkeypatch):
    """A commit landing between merge validation and publish triggers the
    retry loop's re-validation: the merge raises (or fully applies) —
    main NEVER holds a partial prefix of the branch series (r6)."""
    t, orders = table
    t.create_branch("dev")
    dev = t.branch("dev")
    dev.delete_where(lt("o_orderkey", 500))
    extra = orders.filter(F.col("o_orderkey") < 50) \
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    dev.append(extra.coalesce(1))
    # main diverges (disjoint file) so the merge path engages, not
    # fast-forward
    t.delete_where(gt_eq("o_orderkey", 1200))
    before = _keys(t)

    other = catalog.load_table("db.mergey")
    sneak = orders.filter(F.col("o_orderkey") < 30) \
        .withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000) \
        .coalesce(1)
    orig = t.ops.commit
    fired = {}

    def sneaky(version, md):
        if not fired:
            fired["x"] = True
            other.append(sneak)  # lands first -> CAS fails -> retry
        return orig(version, md)

    monkeypatch.setattr(t.ops, "commit", sneaky)
    with pytest.raises(ValidationException, match="concurrent commit"):
        t.merge_branch("dev")
    t.refresh()
    # main holds EXACTLY pre-merge rows + the concurrent append: none of
    # the branch's delete/append effects leaked
    assert _keys(t) == sorted(before + [k + 2_000_000
                                        for k in before if k < 30])
