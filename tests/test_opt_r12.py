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
