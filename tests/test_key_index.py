"""Secondary key index: build / lookup / append-tail catch-up /
staleness guards (catalog/key_index.py)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.key_index import (
    StaleKeyIndexError,
    build_key_index,
    lookup_files,
    read_by_keys,
    refresh_key_index,
)
from linkedin_iceberg_spark.expressions import lt


@pytest.fixture()
def indexed(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.kidx", orders)
    t.append(orders.filter(F.col("o_orderkey") < 1000))
    meta = build_key_index(t, "o_orderkey")
    return t, orders, meta


def _keys(df):
    return sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())


def test_lookup_matches_full_scan_and_prunes(indexed):
    t, orders, meta = indexed
    assert meta["indexed_files"] >= 1
    probe = [3, 7, 500, 999]
    got = read_by_keys(t, "o_orderkey", probe)
    want = t.to_df().filter(F.col("o_orderkey").isin(probe))
    assert _keys(got) == _keys(want)
    # the point of the index: the planned read touches FEWER files than
    # the table holds (each key lives in exactly one file here)
    n_total = len(t._live_data_and_deletes()[0])
    n_hit = len(lookup_files(t, "o_orderkey", probe))
    assert 1 <= n_hit <= min(len(probe), n_total)
    if n_total > len(probe):
        assert n_hit < n_total


def test_append_tail_served_then_folded_in(indexed):
    t, orders, _ = indexed
    t.append(orders.filter(F.col("o_orderkey") >= 1000))  # unindexed tail
    probe = [500, 1200]
    got = read_by_keys(t, "o_orderkey", probe)
    assert _keys(got) == _keys(
        t.to_df().filter(F.col("o_orderkey").isin(probe)))

    # tail files are planned wholesale until refresh folds them in
    tail_before = len(lookup_files(t, "o_orderkey", [500]))
    meta = refresh_key_index(t, "o_orderkey")
    assert meta["snapshot_id"] == t.metadata.current_snapshot_id
    tail_after = len(lookup_files(t, "o_orderkey", [500]))
    assert tail_after <= tail_before
    got2 = read_by_keys(t, "o_orderkey", probe)
    assert _keys(got2) == _keys(got)


def test_non_append_history_raises(indexed):
    t, _, _ = indexed
    t.delete_where(lt("o_orderkey", 100))
    with pytest.raises(StaleKeyIndexError, match="row-changing"):
        read_by_keys(t, "o_orderkey", [500])
    # rebuild restores service and never serves deleted rows
    build_key_index(t, "o_orderkey")
    got = read_by_keys(t, "o_orderkey", [50, 500])
    assert _keys(got) == _keys(
        t.to_df().filter(F.col("o_orderkey").isin([50, 500])))
    assert all(k >= 100 for k in _keys(got))


def test_lookup_survives_compaction(indexed):
    """Compaction is a row-preserving replace: lookups remap hits on
    rewritten files to the rewrite's added files — no rebuild (r6)."""
    from linkedin_iceberg_spark.catalog.maintenance import rewrite_data_files

    t, orders, _ = indexed
    t.append(orders.filter((F.col("o_orderkey") >= 1000)
                           & (F.col("o_orderkey") < 2000)))
    res = rewrite_data_files(t, min_input_files=1)
    assert res["rewritten_files"] >= 1
    probe = [3, 500, 1500]
    got = read_by_keys(t, "o_orderkey", probe)
    want = t.to_df().filter(F.col("o_orderkey").isin(probe))
    assert _keys(got) == _keys(want)
    # candidates are live files only (the rewritten originals are gone)
    live = {e.data_file.file_path for e in t._live_data_and_deletes()[0]}
    assert set(lookup_files(t, "o_orderkey", probe)) <= live


def test_compaction_then_append_then_refresh(indexed):
    """Replace + later appends chain correctly, and refresh folds the
    leading append prefix while leaving the replace lookup-time."""
    from linkedin_iceberg_spark.catalog.maintenance import rewrite_data_files

    t, orders, _ = indexed
    rewrite_data_files(t, min_input_files=1)
    t.append(orders.filter((F.col("o_orderkey") >= 1000)
                           & (F.col("o_orderkey") < 1500)))
    probe = [10, 1100]
    got = read_by_keys(t, "o_orderkey", probe)
    assert _keys(got) == _keys(
        t.to_df().filter(F.col("o_orderkey").isin(probe)))
    # refresh stops at the replace event (no appends precede it), so the
    # watermark must not move past it
    meta = refresh_key_index(t, "o_orderkey")
    got2 = read_by_keys(t, "o_orderkey", probe)
    assert _keys(got2) == _keys(got)
    assert meta["snapshot_id"] != t.metadata.current_snapshot_id


def test_refresh_folds_append_prefix_before_compaction(indexed):
    from linkedin_iceberg_spark.catalog.maintenance import rewrite_data_files

    t, orders, _ = indexed
    t.append(orders.filter((F.col("o_orderkey") >= 1000)
                           & (F.col("o_orderkey") < 1500)))
    appended_at = t.metadata.current_snapshot_id
    rewrite_data_files(t, min_input_files=1)
    meta = refresh_key_index(t, "o_orderkey")
    assert meta["snapshot_id"] == appended_at  # prefix folded, replace not
    probe = [10, 1100]
    got = read_by_keys(t, "o_orderkey", probe)
    assert _keys(got) == _keys(
        t.to_df().filter(F.col("o_orderkey").isin(probe)))


def test_missing_index_raises(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.kidx2", orders)
    t.append(orders)
    with pytest.raises(StaleKeyIndexError, match="build_key_index"):
        lookup_files(t, "o_orderkey", [1])
    with pytest.raises(ValueError, match="no such column"):
        build_key_index(t, "nope")
