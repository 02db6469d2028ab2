"""Native Structured Streaming semantics over engine data (SURVEY.md M6:
watermarks, windowed aggs with late data, stateful dedupe — Spark-native,
tests only) plus nested-type round-trips through the table format."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_watermark_drops_late_data(spark, tmp_path):
    """Events later than watermark - delay are dropped from completed
    windows: run a rate-less deterministic micro-batch stream from files."""
    src = tmp_path / "late_src"
    src.mkdir()
    rows1 = [("2024-01-01 10:00:30", "a"), ("2024-01-01 10:01:10", "a"),
             ("2024-01-01 10:05:00", "a")]  # advances watermark past 10:02
    rows2 = [("2024-01-01 10:00:40", "a")]  # late by > 2 min: dropped
    schema = "ts_s string, k string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1"))

    collected = []

    def run(name):
        stream = (spark.readStream.schema("ts_s string, k string")
                  .parquet(str(src / "*"))
                  .withColumn("ts", F.col("ts_s").cast("timestamp"))
                  .withWatermark("ts", "2 minutes")
                  .groupBy(F.window("ts", "1 minute"), "k")
                  .agg(F.count("*").alias("n")))
        q = (stream.writeStream
             .foreachBatch(lambda df, eid: collected.extend(df.collect()))
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return {(r["window"]["start"].strftime("%H:%M"), r["n"])
                for r in collected}

    # run 1 ingests b1, persisting watermark 10:03 in the checkpoint
    run("late_run1")
    # b2's event (10:00:40) is now older than the watermark -> dropped
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2"))
    got = run("late_run2")
    # finalized windows carry the pre-late counts; the late event never
    # appears
    assert ("10:00", 1) in got
    assert ("10:01", 1) in got
    assert ("10:00", 2) not in got


def test_stateful_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dd_src"
    src.mkdir()
    rows = [("2024-01-01 10:00:00", 1), ("2024-01-01 10:00:05", 1),
            ("2024-01-01 10:00:10", 2)]
    spark.createDataFrame(rows, "ts_s string, id int").coalesce(1) \
        .write.parquet(str(src / "b1"))
    stream = (spark.readStream.schema("ts_s string, id int")
              .parquet(str(src / "*"))
              .withColumn("ts", F.col("ts_s").cast("timestamp"))
              .withWatermark("ts", "10 minutes")
              .dropDuplicates(["id"]))
    q = (stream.writeStream.format("memory").queryName("dd_sink")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert spark.sql("SELECT count(*) n FROM dd_sink").first().n == 2


NESTED_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("s", T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
    ])),
    T.StructField("arr", T.ArrayType(T.DoubleType())),
    T.StructField("m", T.MapType(T.StringType(), T.LongType())),
])


def test_nested_types_roundtrip_table(catalog, spark):
    """struct/list/map columns survive the table write/read path with
    field-id projection (SURVEY.md §1.2)."""
    rows = [(1, (10, "x"), [1.5, 2.5], {"k": 7}),
            (2, (20, "y"), [], {}),
            (3, None, None, None)]
    df = spark.createDataFrame(rows, NESTED_SCHEMA)
    t = catalog.create_table("db.nested", df)
    t.append(df)
    back = t.to_df().orderBy("id").collect()
    assert [r.id for r in back] == [1, 2, 3]
    assert back[0].s.a == 10 and back[0].s.b == "x"
    assert back[0].arr == [1.5, 2.5]
    assert back[0].m == {"k": 7}
    assert back[2].s is None

    # time travel still exact
    v1 = t.current_snapshot().snapshot_id
    t.append(df)
    assert t.scan(snapshot_id=v1).count() == 3
    # metadata tables work for nested tables too
    assert t.metadata_table("files").count() >= 1