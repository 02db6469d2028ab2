"""Streaming: epoch-idempotent sink (S17) + table-as-stream source (S8/S9)
+ native Structured Streaming windows over the engine's tables."""

import os
import time

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.streaming import (
    append_batch_idempotent,
    foreach_batch_writer,
    micro_batches,
)
from linkedin_iceberg_spark.streaming.source import read_stream


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_sink_epoch_idempotent(catalog, orders_df):
    t = catalog.create_table("db.sink", orders_df)
    batch = orders_df.limit(100)
    append_batch_idempotent(t, batch, epoch_id=0)
    assert t.to_df().count() == 100
    # replay of the same epoch must be a no-op (restart semantics)
    append_batch_idempotent(t, batch, epoch_id=0)
    assert t.to_df().count() == 100
    append_batch_idempotent(t, batch, epoch_id=1)
    assert t.to_df().count() == 200


def test_streaming_file_source_to_table_sink(catalog, spark, sf_dir,
                                             tmp_path, orders_df):
    """Real Structured Streaming run: file stream -> foreachBatch -> table."""
    t = catalog.create_table("db.stream_sink", orders_df)
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    import shutil
    shutil.copy(os.path.join(sf_dir, "orders.parquet"),
                src_dir / "orders.parquet")
    src = spark.readStream.schema(orders_df.schema).parquet(str(src_dir))
    q = (src.writeStream
         .foreachBatch(foreach_batch_writer(t, query_id="q1"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    t.refresh()
    assert t.to_df().count() == orders_df.count()
    assert any("streaming-epoch-id" in s.summary for s in t.snapshots())


def test_micro_batches_deterministic(catalog, orders_df):
    t = catalog.create_table("db.micro", orders_df)
    for i in range(3):
        t.append(orders_df.filter(F.col("o_orderkey") % 3 == i))
    b1 = micro_batches(t, max_files_per_batch=2)
    b2 = micro_batches(t, max_files_per_batch=2)
    assert b1 == b2  # deterministic ordering contract (MicroBatches)
    n_files = len(t.new_scan().plan_files())
    assert sum(len(b) for b in b1) == n_files
    # resume mid-stream
    b_rest = micro_batches(t, start_file_index=2, max_files_per_batch=2)
    assert sum(len(b) for b in b_rest) == n_files - 2


def test_table_stream_source(catalog, spark, orders_df, tmp_path):
    """readStream over an engine table via the Python DataSource API."""
    t = catalog.create_table("db.stream_src", orders_df)
    t.append(orders_df.limit(500))

    stream = read_stream(spark, t)
    q = (stream.writeStream.format("memory").queryName("src_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM src_sink").first().n
    assert got == 500


def test_table_stream_source_from_branch(catalog, spark, orders_df,
                                         tmp_path):
    """Streaming a BRANCH head: a branch handle streams its own commits
    (staged-data consumption) while a main stream never sees them."""
    t = catalog.create_table("db.stream_br", orders_df)
    t.append(orders_df.limit(300))
    t.create_branch("dev")
    t.branch("dev").append(orders_df.limit(120))

    q = (read_stream(spark, t.branch("dev"))
         .writeStream.format("memory").queryName("br_sink")
         .option("checkpointLocation", str(tmp_path / "ckb"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) AS n FROM br_sink").first().n == 420

    q2 = (read_stream(spark, t)
          .writeStream.format("memory").queryName("main_sink")
          .option("checkpointLocation", str(tmp_path / "ckm"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert spark.sql("SELECT count(*) AS n FROM main_sink").first().n == 300
