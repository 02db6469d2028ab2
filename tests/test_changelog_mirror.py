"""mirror_changelog: exactly-once CDC mirror table, streamable through
the table stream source (catalog/changelog.py)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.changelog import (
    MIRROR_PROP,
    mirror_changelog,
)
from linkedin_iceberg_spark.expressions import lt


@pytest.fixture()
def src(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.cm_src", orders)
    t.append(orders.coalesce(1))
    return t, orders


def _events(m):
    return sorted((r["o_orderkey"], r["_change_type"])
                  for r in m.to_df()
                  .select("o_orderkey", "_change_type").collect())


def test_mirror_captures_and_is_exactly_once(src, catalog, spark):
    t, orders = src
    n = orders.count()
    t.delete_where(lt("o_orderkey", 100))

    m = mirror_changelog(t, catalog, "db.cm_dst")
    want = sorted([(r["o_orderkey"], "insert") for r in orders.collect()]
                  + [(k, "delete") for k in range(100)])
    assert _events(m) == want
    assert m.metadata.properties[MIRROR_PROP] == \
        str(t.metadata.current_snapshot_id)

    # idempotent: nothing new -> NO new snapshot, no duplicate events
    snaps = len(m.snapshots())
    m = mirror_changelog(t, catalog, "db.cm_dst")
    assert len(m.snapshots()) == snaps
    assert len(_events(m)) == n + 100

    # incremental: one more commit mirrors ONLY its delta
    extra = orders.filter(F.col("o_orderkey") < 50) \
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    t.append(extra.coalesce(1))
    m = mirror_changelog(t, catalog, "db.cm_dst")
    assert _events(m) == sorted(
        want + [(k + 1_000_000, "insert") for k in range(50)])


def test_mirror_streams_through_table_source(src, catalog, spark, tmp_path):
    t, orders = src
    t.delete_where(lt("o_orderkey", 10))
    m = mirror_changelog(t, catalog, "db.cm_stream")

    from linkedin_iceberg_spark.streaming.source import read_stream
    stream = read_stream(spark, m)
    q = (stream.writeStream.format("memory").queryName("cm_sink")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["o_orderkey"], r["_change_type"])
                 for r in spark.sql("SELECT * FROM cm_sink").collect())
    assert got == sorted(
        [(r["o_orderkey"], "insert") for r in orders.collect()]
        + [(k, "delete") for k in range(10)])
