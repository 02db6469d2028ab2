"""v2 row-level deletes (W7-W8): position + equality delete files written,
committed, and applied on read with sequence-number scoping."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_position_deletes(catalog, orders_df, spark):
    # single sorted file so row positions are deterministic
    one = orders_df.orderBy("o_orderkey").coalesce(1)
    t = catalog.create_table("db.posdel", orders_df)
    t.append(one)
    task = t.new_scan().plan_files()[0]
    # delete positions 0..9 (the 10 lowest order keys)
    pos = spark.createDataFrame([(task.file.file_path, i) for i in range(10)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)

    total = orders_df.count()
    assert t.to_df().count() == total - 10
    lowest = [r.o_orderkey for r in
              orders_df.orderBy("o_orderkey").limit(10).collect()]
    remaining = t.to_df().filter(F.col("o_orderkey").isin(lowest)).count()
    # the 10 lowest keys may repeat in later rows; only file-positions 0-9 die
    dup_of_lowest = orders_df.orderBy("o_orderkey").collect()[10:]
    expected_remaining = sum(1 for r in dup_of_lowest
                             if r.o_orderkey in set(lowest))
    assert remaining == expected_remaining


def test_equality_deletes_scoped_by_sequence(catalog, orders_df, spark):
    t = catalog.create_table("db.eqdel", orders_df)
    t.append(orders_df)
    keys = spark.createDataFrame([(k,) for k in range(0, 50)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    deleted = orders_df.filter(F.col("o_orderkey") < 50).count()
    assert t.to_df().count() == orders_df.count() - deleted

    # rows appended AFTER the delete survive (sequence scoping)
    t.append(orders_df.filter(F.col("o_orderkey") < 50))
    assert t.to_df().count() == orders_df.count()


def test_upsert_one_snapshot(catalog, orders_df):
    t = catalog.create_table("db.upsert", orders_df)
    t.append(orders_df)
    n_snaps = len(t.snapshots())

    changed = (orders_df.filter(F.col("o_orderkey") < 100)
               .withColumn("o_totalprice", F.lit(999.0)))
    t.upsert(changed, key_cols=["o_orderkey"])

    assert len(t.snapshots()) == n_snaps + 1  # single atomic snapshot
    df = t.to_df()
    assert df.count() == orders_df.count()
    updated = df.filter(F.col("o_orderkey") < 100)
    assert updated.filter(F.col("o_totalprice") != 999.0).count() == 0
    untouched = df.filter(F.col("o_orderkey") >= 100)
    orig = orders_df.filter(F.col("o_orderkey") >= 100)
    assert untouched.agg(F.sum("o_totalprice")).first()[0] == \
        pytest.approx(orig.agg(F.sum("o_totalprice")).first()[0])
