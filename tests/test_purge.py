"""purge_where: no physical trace of purged rows anywhere under the table."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.maintenance import purge_where
from linkedin_iceberg_spark.expressions import lt


def _key_traces(location, key_col, keys):
    """Every parquet under the table whose `key_col` column contains any
    of `keys` (data files AND eq-delete files both carry the column)."""
    hits = []
    for root, _d, files in os.walk(location):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(root, fn)
            try:
                t = pq.read_table(p)
            except Exception:
                continue
            if key_col not in t.column_names:
                continue
            vals = set(t[key_col].to_pylist())
            if vals & keys:
                hits.append(p)
    return hits


def test_purge_erases_bytes_and_history(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.purge", orders)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    # an upsert writes an eq-delete file CONTAINING key values — purge
    # must erase those too
    t.upsert(orders.filter(F.col("o_orderkey") < 500)
             .withColumn("o_comment", F.lit("updated")),
             key_cols=["o_orderkey"])
    doomed = {r["o_orderkey"] for r in
              orders.filter(F.col("o_orderkey") < 500)
              .select("o_orderkey").collect()}
    assert _key_traces(t.location, "o_orderkey", doomed)  # traces exist now

    out = purge_where(t, lt("o_orderkey", 500))

    # current view correct
    visible = {r["o_orderkey"] for r in
               t.to_df().select("o_orderkey").collect()}
    assert not (visible & doomed)
    assert len(visible) == orders.count() - len(doomed)
    # only the purge commit's lineage remains
    assert len(t.snapshots()) == 1
    # and NO parquet anywhere under the table still holds a purged key
    assert _key_traces(t.location, "o_orderkey", doomed) == []
    assert out["expire"]["expired_snapshots"] >= 3


def test_purge_respects_clone_fence(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.purge_src", orders)
    t.append(orders)
    catalog.snapshot_table(t, "db.purge_clone")
    t.refresh()
    with pytest.raises(ValueError, match="clones"):
        purge_where(t, lt("o_orderkey", 100))


def test_purge_refuses_pinned_refs_then_drops_them(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.purge_refs", orders)
    t.append(orders)
    t.create_tag("keepme")          # pins the pre-purge snapshot
    t.create_branch("dev")
    doomed = {r["o_orderkey"] for r in
              orders.filter(F.col("o_orderkey") < 200)
              .select("o_orderkey").collect()}
    with pytest.raises(ValueError, match="pin history"):
        purge_where(t, lt("o_orderkey", 200))
    # nothing was mutated by the refusal
    assert t.to_df().count() == orders.count()
    # explicit opt-in drops every ref, then the erasure is total
    purge_where(t, lt("o_orderkey", 200), drop_refs=True)
    t.refresh()
    assert not t.metadata.refs
    assert len(t.snapshots()) == 1
    assert _key_traces(t.location, "o_orderkey", doomed) == []
