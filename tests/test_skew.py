"""Skew helpers (operators/skew.py): salted join/agg equal their plain
counterparts and actually spread hot keys."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 10k rows, 90% on one hot key
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") % 1000).alias("v"))


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k5", 2), ("k13", 3), ("missing", 4)], ["k", "tag"])
    plain = big.join(small, "k", "inner")
    salted = salted_join(big, small, "k", salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("HOT", 1)], ["k", "tag"])
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", salt=4, how="left")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"))
    salted = salted_agg(df, "k", {
        "s": ("sum", "v"), "n": ("count", "v"),
        "lo": ("min", "v"), "hi": ("max", "v")}, salt=8)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_agg_spreads_partials(spark):
    """Phase-1 output has multiple rows for the hot key — the skew spread."""
    df = _skewed(spark)
    salted = df.withColumn("_salt", (F.rand() * 8).cast("int"))
    partial = salted.groupBy("k", "_salt").count()
    hot = partial.filter(F.col("k") == "HOT").count()
    assert hot > 1
