"""RTAS / CREATE OR REPLACE TABLE AS SELECT (ref:
Transactions.replaceTableTransaction): atomic schema+content swap that
preserves table identity and history."""

from pyspark.sql import functions as F


def test_rtas_replaces_contents_and_schema(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    t = catalog.create_table_as_select("db.r", o)
    v1 = t.current_snapshot().snapshot_id

    newdf = (o.limit(40)
             .drop("o_comment")
             .withColumn("flagged", F.col("o_totalprice") > 100000))
    t2 = catalog.replace_table_as_select("db.r", newdf)

    df = t2.to_df()
    assert df.count() == 40
    assert "flagged" in df.columns and "o_comment" not in df.columns
    # single atomic publish: one metadata version bump visible to reloaders
    again = catalog.load_table("db.r")
    assert again.to_df().count() == 40
    # history preserved: the pre-replace snapshot is still reachable
    old = t2.scan(snapshot_id=v1)
    assert old.count() == 100


def test_rtas_creates_when_absent(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(10)
    t = catalog.replace_table_as_select("db.fresh", o)
    assert t.to_df().count() == 10


def test_rtas_common_columns_keep_field_ids(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20)
    t = catalog.create_table_as_select("db.ids", o)
    fid_before = t.schema.find_field("o_orderkey").field_id
    t2 = catalog.replace_table_as_select(
        "db.ids", o.select("o_orderkey", "o_totalprice"))
    assert t2.schema.find_field("o_orderkey").field_id == fid_before
