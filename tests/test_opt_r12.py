"""Round-12 optimization regression tests: equivalence checks for paths
whose internals changed this round, plus the ADVICE r11 correctness fixes."""

import os

from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema


def test_add_files_partition_col_not_last(catalog, spark, tmp_path):
    """ADVICE r11 (high): imported Hive-layout groups are read with basePath,
    and Spark appends the path-reconstructed partition column at the END of
    the read schema even when an explicit schema is passed — so imported
    groups must ALWAYS go through align_columns, even at the current schema.
    Regression: a table whose partition column is NOT last in the schema."""
    src = str(tmp_path / "hive_mid")
    data = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("day"),
        (F.col("id") * 10).alias("v"))
    data.write.partitionBy("day").parquet(src)

    schema = Schema.from_spark(data.schema)  # (k, day, v) — day in the middle
    spec = PartitionSpec.builder_for(schema).identity("day").build()
    t = catalog.create_table("db.mid_part", schema, spec=spec)
    t.add_files(src)

    df = t.to_df()
    assert df.columns == ["k", "day", "v"]
    got = sorted(df.collect(), key=lambda r: r["k"])
    exp = sorted(data.collect(), key=lambda r: r["k"])
    assert got == exp


def test_ld_memo_invalidated_on_overwrite(spark, tmp_path):
    """ADVICE r11 / VERDICT item 8: the base-relation memo must not serve a
    stale file listing/schema after the input file is regenerated in the
    same session (key now includes st_mtime_ns)."""
    import shutil
    import time

    from linkedin_iceberg_spark import queries as Q

    sf = str(tmp_path / "sfdir")
    os.makedirs(sf)
    path = os.path.join(sf, "orders.parquet")

    spark.range(0, 10).selectExpr("id AS o_orderkey").toPandas() \
        .to_parquet(path)
    first = Q.ld(spark, sf, "orders")
    assert first.count() == 10

    time.sleep(0.01)  # ensure a distinct mtime_ns
    spark.range(0, 25).selectExpr(
        "id AS o_orderkey", "id * 2 AS o_extra").toPandas().to_parquet(path)
    second = Q.ld(spark, sf, "orders")
    assert second.count() == 25
    assert "o_extra" in second.columns
    shutil.rmtree(sf)


def test_cosine_topk_quoting_and_nonfinite_guard(spark):
    """ADVICE r11 (low): cosine_topk must quote the vector column (names
    needing backticks) and reject non-finite query elements instead of
    emitting unparsable SQL."""
    import pytest

    from linkedin_iceberg_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])],
        "vec_id int, `my vec` array<double>")
    got = cosine_topk(df, [1.0, 0.0], k=2, vec_col="my vec").collect()
    assert [r["vec_id"] for r in got] == [1, 2]
    assert got[0]["cos_sim"] == 1.0

    with pytest.raises(ValueError, match="finite"):
        cosine_topk(df, [float("nan"), 1.0], k=1, vec_col="my vec")
    with pytest.raises(ValueError, match="finite"):
        cosine_topk(df, [float("inf"), 1.0], k=1, vec_col="my vec")
