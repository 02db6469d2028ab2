"""SparkSession factory with the engine's required configuration.

UTC session timezone is mandatory: Iceberg timestamps are UTC-normalized
micros (ref: api/.../types/Types.java:210-236) and the DuckDB oracle compares
naive-UTC values."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "linkedin_iceberg_spark",
              cpus: int = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark cannot
        # read natively; read as long and convert (sources/testdata.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
