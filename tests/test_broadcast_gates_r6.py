"""Round-6 broadcast-gate sweeps: the two remaining forced broadcasts
(incremental_view's touched-key set, the upsert sink's per-batch key set)
are now size-gated through catalog/deletes._maybe_broadcast — past the
gate the joins shuffle instead of driving executors off the broadcast
cliff, and the results are identical either way."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.incremental_view import (
    _changed_rows_bound,
    create_agg_view,
    refresh_agg_view,
)
from linkedin_iceberg_spark.streaming.sink import upsert_batch_idempotent


def _minmax_roundtrip(catalog, spark, sf_dir, suffix):
    """create view over a HIGH-CARDINALITY key -> delete + append ->
    refresh -> return the view's final state."""
    from linkedin_iceberg_spark.expressions import lt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 800)
    base = catalog.create_table(f"db.bg_base_{suffix}", o)
    base.append(o)
    # one group per o_custkey: the touched-key set after a wide delete is
    # ~every group — exactly the shape the forced broadcast regressed on
    aggs = {"min_key": ("min", F.col("o_orderkey")),
            "max_key": ("max", F.col("o_orderkey"))}
    view = create_agg_view(catalog, f"db.bg_view_{suffix}", base,
                           keys=["o_custkey"], aggs=aggs)
    base.delete_where(lt("o_orderkey", 300))
    refresh_agg_view(view, base, ["o_custkey"], aggs)
    return {r.o_custkey: (r.n_rows, r.min_key, r.max_key)
            for r in view.to_df().collect()}, base


def test_minmax_refresh_gated_shuffle_path_matches(catalog, spark, sf_dir,
                                                   monkeypatch):
    """With the gate forced shut (limit 0) the semi-join takes the
    shuffle path; the refreshed view matches the broadcast path exactly
    and a from-scratch recompute."""
    from linkedin_iceberg_spark.catalog import deletes

    got_bcast, _ = _minmax_roundtrip(catalog, spark, sf_dir, "b")
    monkeypatch.setattr(deletes, "BROADCAST_DELETE_ROW_LIMIT", 0)
    got_shuffle, base = _minmax_roundtrip(catalog, spark, sf_dir, "s")
    assert got_shuffle == got_bcast
    want = {r.o_custkey: (r.n_rows, r.min_key, r.max_key)
            for r in base.to_df().groupBy("o_custkey").agg(
                F.count("*").cast("long").alias("n_rows"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key")).collect()}
    assert got_shuffle == want


def test_changed_rows_bound_from_summaries(catalog, spark, sf_dir):
    from linkedin_iceberg_spark.expressions import lt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 400)
    t = catalog.create_table("db.bg_bound", o)
    t.append(o)
    first = t.metadata.current_snapshot_id
    n = t.to_df().count()
    t.delete_where(lt("o_orderkey", 100))
    cur = t.metadata.current_snapshot_id
    bound = _changed_rows_bound(t, first, cur)
    # the CoW delete removed files and re-added survivors: the bound
    # covers every changelog row (deleted + re-added records)
    assert bound is not None
    assert bound >= t.changes(from_snapshot_id=first,
                              to_snapshot_id=cur).count()
    # unknown-range fallback: a snapshot id not on the ancestry
    assert _changed_rows_bound(t, -12345, cur) is None


def test_upsert_sink_gated_path_matches(catalog, spark, sf_dir,
                                        monkeypatch):
    """Same rows through the gated (shuffle) and default (broadcast)
    version-guard lookups."""
    from linkedin_iceberg_spark.catalog import deletes

    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .filter(F.col("user_id") <= 20)
         .select("user_id", "event_id", "ts", "value"))
    b0 = e.filter(F.col("event_id") % 2 == 0)
    b1 = e.filter(F.col("event_id") % 2 == 1)

    def run(name):
        t = catalog.create_table(name, e)
        upsert_batch_idempotent(t, b0, epoch_id=0, key_cols=["user_id"],
                                version_cols=["ts", "event_id"])
        upsert_batch_idempotent(t, b1, epoch_id=1, key_cols=["user_id"],
                                version_cols=["ts", "event_id"])
        t.refresh()
        return {(r.user_id, r.event_id, r.ts, r.value)
                for r in t.to_df().collect()}

    want = run("db.bg_cdc_b")
    monkeypatch.setattr(deletes, "BROADCAST_DELETE_ROW_LIMIT", 0)
    assert run("db.bg_cdc_s") == want


@pytest.mark.parametrize("limit,hinted", [(10_000_000, True), (0, False)])
def test_gate_threads_through_plan(catalog, spark, sf_dir, monkeypatch,
                                   limit, hinted):
    """The physical plan flips with the gate: broadcast hint under the
    limit, none above it (AQE may still choose one from observed sizes —
    we assert on the HINTED logical plan, which we control)."""
    from linkedin_iceberg_spark.catalog import deletes
    from linkedin_iceberg_spark.catalog.deletes import _maybe_broadcast

    monkeypatch.setattr(deletes, "BROADCAST_DELETE_ROW_LIMIT", limit)
    df = spark.range(10)
    out = _maybe_broadcast(df, 1000)
    plan = out._jdf.queryExecution().logical().toString()
    assert ("Hint broadcast" in plan) == hinted
