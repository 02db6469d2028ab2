"""Size-gated delete application: attached pos/eq delete rows broadcast
for the anti-join only while the manifest record counts stay under
BROADCAST_DELETE_ROW_LIMIT; past it the join degrades to a shuffled
anti-join with byte-identical results (no broadcast cliff on
long-unmaintained tables)."""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import deletes as D


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


@pytest.fixture()
def laden_table(catalog, orders_df, spark):
    """A table carrying BOTH a position-delete and an equality-delete
    file against its initial data."""
    t = catalog.create_table("db.bc_gate", orders_df)
    t.append(orders_df)
    entries, _ = t._live_data_and_deletes()
    some_file = entries[0].data_file.file_path
    pos = spark.createDataFrame([(some_file, i) for i in range(0, 30)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    keys = spark.createDataFrame([(k,) for k in range(100, 160)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    return t


def _rows(t):
    return sorted(map(tuple, t.to_df().collect()))


def _plan(t):
    buf = io.StringIO()
    with redirect_stdout(buf):
        t.to_df().explain("formatted")
    return buf.getvalue()


def test_gated_path_matches_broadcast_path(laden_table, spark, monkeypatch):
    t = laden_table
    broadcast_rows = _rows(t)
    plan = _plan(t)
    assert "BroadcastHashJoin" in plan  # small delete set: hint applies

    # force the gate: every delete set is now "too big to broadcast", and
    # the session threshold is disabled so AQE cannot re-pick broadcast —
    # the worst case the gate exists for
    monkeypatch.setattr(D, "BROADCAST_DELETE_ROW_LIMIT", 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated_plan = _plan(t)
        assert "BroadcastHashJoin" not in gated_plan
        assert _rows(t) == broadcast_rows  # byte-for-byte identical result
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unknown_record_count_is_never_force_broadcast():
    class FakeFile:
        record_count = None
    assert D._total_records([FakeFile()]) is None

    class Sentinel:
        pass
    df = Sentinel()
    # unknown count -> no hint (the df passes through untouched)
    assert D._maybe_broadcast(df, None) is df
    assert D._maybe_broadcast(df, D.BROADCAST_DELETE_ROW_LIMIT + 1) is df
