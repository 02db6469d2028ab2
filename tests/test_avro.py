"""Avro data files (S15): pure-Python container codec + distributed
mapInPandas read/write through the full engine-table lifecycle."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.schema import Schema
from linkedin_iceberg_spark.sources.avro_codec import (
    count_avro_records,
    read_avro,
    write_avro,
)


def _schema():
    from pyspark.sql import types as T
    return Schema.from_spark(T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("day", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("blob", T.BinaryType())]))


def test_codec_roundtrip(tmp_path):
    sch = _schema()
    rows = [
        (1, "alpha", 1.5, True, dt.date(2020, 5, 17),
         dt.datetime(2021, 3, 4, 5, 6, 7, 123456), b"\x00\xff"),
        (2, None, None, None, None, None, None),
        (3, "émoji🪣", -0.0, False, dt.date(1969, 12, 31),
         dt.datetime(1969, 12, 31, 23, 59, 59), b""),
    ]
    p = str(tmp_path / "t.avro")
    assert write_avro(p, rows, sch) == 3
    assert count_avro_records(p) == 3
    back = read_avro(p, sch)
    assert back == rows


def test_codec_empty_file(tmp_path):
    sch = _schema()
    p = str(tmp_path / "e.avro")
    assert write_avro(p, [], sch) == 0
    assert count_avro_records(p) == 0
    assert read_avro(p, sch) == []


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_avro_table_roundtrip(catalog, orders_df):
    t = catalog.create_table("db.avro1", orders_df,
                             properties={"write.format-default": "avro"})
    t.append(orders_df)
    fmts = {x.file.file_format for x in t.new_scan().plan_files()}
    assert fmts == {"avro"}
    got = t.to_df()
    assert got.count() == orders_df.count()
    a = sorted(got.select("o_orderkey", "o_totalprice", "o_orderdate")
               .collect())
    b = sorted(orders_df.select("o_orderkey", "o_totalprice", "o_orderdate")
               .collect())
    assert a == b


def test_avro_partitioned_pruning(catalog, orders_df, spark):
    from linkedin_iceberg_spark import PartitionSpec
    from linkedin_iceberg_spark.expressions import eq
    spec = PartitionSpec.builder_for(Schema.from_spark(orders_df.schema)) \
        .identity("o_orderstatus").build()
    t = catalog.create_table("db.avro2", orders_df, spec=spec,
                             properties={"write.format-default": "avro"})
    t.append(orders_df)
    n_all = len(t.new_scan().plan_files())
    pruned = t.new_scan().filter(eq("o_orderstatus", "F")).plan_files()
    assert 0 < len(pruned) < n_all
    got = t.scan(row_filter=eq("o_orderstatus", "F")).count()
    assert got == orders_df.filter(F.col("o_orderstatus") == "F").count()


def test_avro_schema_evolution_and_eq_deletes(catalog, orders_df, spark):
    t = catalog.create_table("db.avro3", orders_df,
                             properties={"write.format-default": "avro"})
    t.append(orders_df)
    t.update_schema().rename_column("o_totalprice", "price") \
        .add_column("note", "string").commit()
    keys = spark.createDataFrame([(k,) for k in range(0, 50)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    n = orders_df.count()
    n50 = orders_df.filter(F.col("o_orderkey") < 50).count()
    out = t.to_df()
    assert out.count() == n - n50
    assert out.filter(F.col("o_orderkey") < 50).count() == 0
    row = out.filter(F.col("o_orderkey") == 100).select("price", "note") \
        .head()
    want = orders_df.filter(F.col("o_orderkey") == 100) \
        .select("o_totalprice").head()[0]
    assert row.price == want and row.note is None


def test_avro_position_deletes_apply(catalog, orders_df, spark):
    """r10: position deletes are format-agnostic — Avro files ride the
    codec reader's exact per-file row counter (they were rejected with
    NotImplementedError before)."""
    t = catalog.create_table("db.avro4", orders_df,
                             properties={"write.format-default": "avro"})
    t.append(orders_df)
    victim = t._live_data_and_deletes()[0][0].data_file.file_path
    pos = spark.createDataFrame([(victim, p) for p in (0, 1, 2)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    assert t.refresh().to_df().count() == orders_df.count() - 3
