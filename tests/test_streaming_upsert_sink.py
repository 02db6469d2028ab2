"""Epoch-idempotent streaming upsert sink (CDC apply)."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.streaming.sink import upsert_batch_idempotent


def test_upsert_batch_replay_is_noop(catalog, spark, sf_dir):
    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .filter(F.col("user_id") <= 20)
         .select("user_id", "event_id", "ts", "value"))
    t = catalog.create_table("db.cdc", e)
    b0 = e.filter(F.col("event_id") % 2 == 0)
    upsert_batch_idempotent(t, b0, epoch_id=0, key_cols=["user_id"],
                            version_cols=["ts", "event_id"])
    t.refresh()
    snap0 = t.metadata.current_snapshot_id
    n0 = t.to_df().count()
    # one row per key (last version wins within the batch)
    assert n0 == b0.select("user_id").distinct().count()

    # replay of epoch 0: dropped
    upsert_batch_idempotent(t, b0, epoch_id=0, key_cols=["user_id"],
                            version_cols=["ts", "event_id"])
    t.refresh()
    assert t.metadata.current_snapshot_id == snap0

    # epoch 1 carries the other half of the events, unordered relative to
    # epoch 0: the version guard keeps the GLOBALLY newest row per key
    # (a late batch can only overwrite with strictly newer versions)
    b1 = e.filter(F.col("event_id") % 2 == 1)
    upsert_batch_idempotent(t, b1, epoch_id=1, key_cols=["user_id"],
                            version_cols=["ts", "event_id"])
    t.refresh()
    got = {r.user_id: r.event_id for r in t.to_df().collect()}
    from pyspark.sql import Window as W
    want = {r.user_id: r.event_id for r in
            e.withColumn("_rn", F.row_number().over(
                W.partitionBy("user_id")
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())))
            .filter(F.col("_rn") == 1).collect()}
    assert got == want
