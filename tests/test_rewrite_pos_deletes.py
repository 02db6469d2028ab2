"""rewrite_position_deletes: merge + dedupe + purge of pos-delete files."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import gt_eq

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.maintenance import (
    rewrite_position_deletes,
)


def _pos_delete_entries(t):
    _, dels = t._live_data_and_deletes()
    return [d for d in dels
            if d.data_file.content == M.CONTENT_POSITION_DELETES]


@pytest.fixture()
def two_file_table(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    a = orders.filter(F.col("o_orderkey") < 1000).orderBy("o_orderkey") \
        .coalesce(1)
    b = orders.filter(F.col("o_orderkey") >= 1000).orderBy("o_orderkey") \
        .coalesce(1)
    t = catalog.create_table("db.rposdel", orders)
    t.append(a)
    t.append(b)
    files = sorted(task.file.file_path for task in t.new_scan().plan_files())
    assert len(files) == 2
    n_a = a.count()
    # file order on disk is append order: resolve which path is which
    fa = next(task.file.file_path for task in t.new_scan().plan_files()
              if task.file.record_count == n_a)
    fb = next(f for f in files if f != fa)
    return t, fa, fb


def test_merge_dedupe_and_purge(two_file_table, spark):
    t, fa, fb = two_file_table
    total = t.to_df().count()
    # commit 1: positions 0,1 of A and 0,1 of B (one delete file, two paths)
    t.row_delta(position_deletes=spark.createDataFrame(
        [(fa, 0), (fa, 1), (fb, 0), (fb, 1)],
        "file_path string, pos bigint").coalesce(1))
    # commit 2: A pos 1 again (duplicate) + A pos 2
    t.row_delta(position_deletes=spark.createDataFrame(
        [(fa, 1), (fa, 2)], "file_path string, pos bigint").coalesce(1))
    assert len(_pos_delete_entries(t)) == 2
    assert t.to_df().count() == total - 5  # 0,1,2 of A + 0,1 of B

    # drop B entirely (whole-file metadata delete) -> B's delete rows die
    t.delete_where(gt_eq("o_orderkey", 1000))
    visible_before = sorted(
        r["o_orderkey"] for r in t.to_df().select("o_orderkey").collect())

    out = rewrite_position_deletes(t)
    assert out["rewritten_delete_files"] == 2
    assert out["added_delete_files"] == 1
    # purged: 1 duplicate (fa,1) + 2 rows referencing dead file B
    assert out["purged_rows"] == 3

    visible_after = sorted(
        r["o_orderkey"] for r in t.to_df().select("o_orderkey").collect())
    assert visible_after == visible_before

    ents = _pos_delete_entries(t)
    assert len(ents) == 1
    # tight referenced-path bounds: only A remains referenced
    lo = ents[0].data_file.lower_bounds[M.DELETE_FILE_PATH_FID]
    hi = ents[0].data_file.upper_bounds[M.DELETE_FILE_PATH_FID]
    assert lo == fa and hi == fa

    # idempotence: single compacted file, nothing to purge -> no-op
    again = rewrite_position_deletes(t)
    assert again == {"rewritten_delete_files": 0,
                     "added_delete_files": 0, "purged_rows": 0}


def test_all_rows_purged_removes_without_adding(two_file_table, spark):
    t, fa, fb = two_file_table
    t.row_delta(position_deletes=spark.createDataFrame(
        [(fb, 3), (fb, 4)], "file_path string, pos bigint").coalesce(1))
    t.row_delta(position_deletes=spark.createDataFrame(
        [(fb, 5)], "file_path string, pos bigint").coalesce(1))
    # kill B: every delete row now references a dead file
    t.delete_where(gt_eq("o_orderkey", 1000))
    before = t.to_df().count()
    out = rewrite_position_deletes(t)
    assert out["rewritten_delete_files"] == 2
    assert out["added_delete_files"] == 0
    assert out["purged_rows"] == 3
    assert not _pos_delete_entries(t)
    assert t.to_df().count() == before


def test_below_threshold_is_noop(two_file_table, spark):
    t, fa, _fb = two_file_table
    t.row_delta(position_deletes=spark.createDataFrame(
        [(fa, 0)], "file_path string, pos bigint").coalesce(1))
    before = t.to_df().count()
    out = rewrite_position_deletes(t)  # one file, nothing purgeable
    assert out == {"rewritten_delete_files": 0,
                   "added_delete_files": 0, "purged_rows": 0}
    assert len(_pos_delete_entries(t)) == 1
    assert t.to_df().count() == before
