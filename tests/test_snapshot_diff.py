"""snapshot_diff: net row delta between arbitrary refs, metadata-only
skip of unchanged files (catalog/diff.py)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.diff import _state, snapshot_diff
from linkedin_iceberg_spark.expressions import lt


@pytest.fixture()
def t(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    tbl = catalog.create_table("db.diffy", orders)
    tbl.append(orders.filter(F.col("o_orderkey") < 750).coalesce(1))
    tbl.append(orders.filter(F.col("o_orderkey") >= 750).coalesce(1))
    tbl.create_tag("v1")
    return tbl, orders


def _rows(df, col="o_orderkey"):
    return sorted((r[col], r["_diff_type"])
                  for r in df.select(col, "_diff_type").collect())


def test_dml_diff_exact(t, spark):
    tbl, orders = t
    tbl.delete_where(lt("o_orderkey", 100))
    extra = orders.filter(F.col("o_orderkey") < 50) \
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    tbl.append(extra.coalesce(1))

    d = snapshot_diff(tbl, "v1")
    got = _rows(d)
    want = sorted([(k + 1_000_000, "added")
                   for k in range(50)] +
                  [(r["o_orderkey"], "removed")
                   for r in orders.filter(F.col("o_orderkey") < 100)
                   .collect()])
    assert got == want


def test_compaction_diffs_empty_and_skips_unchanged(t):
    tbl, _ = t
    # DML one half; the other half's file is untouched
    tbl.delete_where(lt("o_orderkey", 100))
    tbl.rewrite_data_files(min_input_files=1)

    snap = tbl.metadata.snapshot_by_id(tbl.metadata.refs["v1"])
    # after compaction NO file is shared -> full read, but the diff is
    # exactly the DML effect (rows that only moved files cancel out)
    d = snapshot_diff(tbl, "v1")
    assert d.filter(F.col("_diff_type") == "added").count() == 0
    assert sorted(r["o_orderkey"] for r in
                  d.filter(F.col("_diff_type") == "removed").collect()) == \
        sorted(range(100))


def test_unchanged_files_skipped_metadata_only(t):
    tbl, orders = t
    tbl.append(orders.filter(F.col("o_orderkey") < 10)
               .withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000)
               .coalesce(1))
    # both original files are live in both states with no deletes ->
    # the candidate sets contain ONLY the appended file
    a_snap = tbl.metadata.snapshot_by_id(tbl.metadata.refs["v1"])
    a_data, _, a_map = _state(tbl, a_snap)
    b_data, _, b_map = _state(tbl, tbl.metadata.current_snapshot)
    same = {p for p, ds in a_map.items() if b_map.get(p) == ds}
    assert len(same) == len(a_data) == 2
    assert len([e for e in b_data
                if e.data_file.file_path not in same]) == 1
    got = _rows(snapshot_diff(tbl, "v1"))
    assert got == [(k + 2_000_000, "added") for k in range(10)]


def test_diff_between_branches(t, spark):
    tbl, orders = t
    tbl.create_branch("dev")
    dev = tbl.branch("dev")
    dev.delete_where(lt("o_orderkey", 50))
    tbl.append(orders.filter(F.col("o_orderkey") < 5)
               .withColumn("o_orderkey", F.col("o_orderkey") + 3_000_000)
               .coalesce(1))
    # non-ancestor pair: main head vs branch head
    d = snapshot_diff(tbl, "main", "dev")
    got = _rows(d)
    want = sorted([(k, "removed") for k in range(50)] +
                  [(k + 3_000_000, "removed") for k in range(5)])
    assert got == want


def test_duplicate_rows_diff_as_multiset(t, spark):
    tbl, orders = t
    dup = orders.filter(F.col("o_orderkey") < 5)
    tbl.append(dup.coalesce(1))  # second copy of keys 0..4
    d = snapshot_diff(tbl, "v1")
    got = _rows(d)
    assert got == [(k, "added") for k in range(5)]  # ONE added per key


def test_diff_on_branch_handle_resolves_branch_head(t, spark):
    tbl, orders = t
    tbl.create_branch("work")
    dev = tbl.branch("work")
    dev.delete_where(lt("o_orderkey", 25))
    # on the BRANCH handle, None = the branch head (like every read);
    # v1 -> branch-head diff shows the branch's delete, though main
    # still holds the rows
    got = _rows(dev.diff("v1"))
    assert got == [(k, "removed") for k in range(25)]
    assert tbl.to_df().filter(F.col("o_orderkey") < 25).count() == 25
