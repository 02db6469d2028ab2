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
    with pytest.raises(StaleKeyIndexError, match="non-append"):
        read_by_keys(t, "o_orderkey", [500])
    # rebuild restores service and never serves deleted rows
    build_key_index(t, "o_orderkey")
    got = read_by_keys(t, "o_orderkey", [50, 500])
    assert _keys(got) == _keys(
        t.to_df().filter(F.col("o_orderkey").isin([50, 500])))
    assert all(k >= 100 for k in _keys(got))


def test_missing_index_raises(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.kidx2", orders)
    t.append(orders)
    with pytest.raises(StaleKeyIndexError, match="build_key_index"):
        lookup_files(t, "o_orderkey", [1])
    with pytest.raises(ValueError, match="no such column"):
        build_key_index(t, "nope")
