"""Multi-format data files (S14-S16): ORC tables end-to-end — write, stats,
scan, schema evolution, equality deletes, streaming source."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_orc_table_roundtrip(catalog, orders_df):
    t = catalog.create_table("db.orc1", orders_df,
                             properties={"write.format-default": "orc"})
    t.append(orders_df)
    files = t.new_scan().plan_files()
    assert all(x.file.file_format == "orc" for x in files)
    assert all(x.file.file_path.endswith(".orc") for x in files)
    assert t.to_df().count() == orders_df.count()
    # counts-mode stats: exact record counts, no bounds
    assert sum(x.file.record_count for x in files) == orders_df.count()

    # filters still correct (no stats pruning, conservative keep-all)
    got = t.scan(row_filter=__import__(
        "linkedin_iceberg_spark").expressions.gt_eq("o_totalprice", 100000.0)
    ).count()
    expected = orders_df.filter(F.col("o_totalprice") >= 100000.0).count()
    assert got == expected


def test_orc_equality_deletes(catalog, orders_df, spark):
    t = catalog.create_table("db.orc2", orders_df,
                             properties={"write.format-default": "orc"})
    t.append(orders_df)
    keys = spark.range(0, 30).select(F.col("id").alias("o_orderkey"))
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    deleted = orders_df.filter(F.col("o_orderkey") < 30).count()
    assert t.to_df().count() == orders_df.count() - deleted


def test_orc_position_deletes_apply(catalog, orders_df, spark):
    """r10: position deletes are format-agnostic — ORC files ride the
    whole-file pyarrow reader's exact per-file row counter (they were
    rejected with NotImplementedError before)."""
    t = catalog.create_table("db.orc3", orders_df,
                             properties={"write.format-default": "orc"})
    t.append(orders_df)
    victim = t._live_data_and_deletes()[0][0].data_file.file_path
    pos = spark.createDataFrame([(victim, p) for p in (0, 1, 2)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    assert t.refresh().to_df().count() == orders_df.count() - 3


def test_orc_stream_source(catalog, orders_df, spark, tmp_path):
    from linkedin_iceberg_spark.streaming.source import read_stream
    t = catalog.create_table("db.orc4", orders_df,
                             properties={"write.format-default": "orc"})
    t.append(orders_df.limit(300))
    q = (read_stream(spark, t).writeStream.format("memory")
         .queryName("orc_sink")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) n FROM orc_sink").first().n == 300


def test_mixed_format_table(catalog, orders_df):
    """Format evolution: parquet files + orc files in one table."""
    t = catalog.create_table("db.mixed", orders_df)
    t.append(orders_df.filter(F.col("o_orderkey") % 2 == 0))
    t.update_properties(set_props={"write.format-default": "orc"})
    t.append(orders_df.filter(F.col("o_orderkey") % 2 == 1))
    fmts = {x.file.file_format for x in t.new_scan().plan_files()}
    assert fmts == {"parquet", "orc"}
    assert t.to_df().count() == orders_df.count()


def test_avro_append_via_python_codec(catalog, orders_df):
    # spark-avro is absent; the engine's own container codec handles avro
    # (full lifecycle coverage in tests/test_avro.py)
    t = catalog.create_table("db.avro1", orders_df,
                             properties={"write.format-default": "avro"})
    t.append(orders_df.limit(10))
    assert t.to_df().count() == 10