"""Local generic read (S10, ref: data/.../IcebergGenerics.java): a scan
executed with pyarrow only must produce the same rows as the Spark path —
including pruning, residual filters, schema evolution, and v2 deletes."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.expressions import and_, eq, gt, gt_eq, lt


def _sorted_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = (pd.to_datetime(out[c]).dt.tz_localize(None)
                      .astype("datetime64[us]"))
    return out.sort_values(by=cols, ignore_index=True)


def assert_matches_spark(scan):
    local = _sorted_pdf(scan.to_arrow().to_pandas())
    spark_side = _sorted_pdf(scan.to_df().toPandas())
    pd.testing.assert_frame_equal(local, spark_side, check_dtype=False)


def test_local_read_full_table(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.lr_orders", orders)
    t.append(orders)
    tbl = t.new_scan().to_arrow()
    assert len(tbl) == orders.count()
    assert tbl.column_names == orders.columns
    assert_matches_spark(t.new_scan())


def test_local_read_filter_and_select(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.lr_orders_p", orders, spec=spec)
    t.append(orders)
    scan = (t.new_scan()
            .filter(and_(gt_eq("o_orderdate", "1996-01-01"),
                         lt("o_orderdate", "1996-06-01"),
                         gt("o_totalprice", 10000.0)))
            .select(["o_orderkey", "o_totalprice", "o_orderdate"]))
    assert_matches_spark(scan)
    # and the residual really ran (price predicate enforced)
    pdf = scan.to_arrow().to_pandas()
    assert len(pdf) and (pdf["o_totalprice"] > 10000.0).all()


def test_local_read_after_schema_evolution(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.lr_evo", orders)
    t.append(orders)
    t.update_schema().rename_column("o_totalprice", "price") \
        .add_column("note", "string").commit()
    tbl = t.new_scan().to_arrow()
    assert "price" in tbl.column_names and "note" in tbl.column_names
    assert tbl["note"].null_count == len(tbl)
    assert_matches_spark(t.new_scan())


def test_local_read_with_delete_where(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.lr_del", orders)
    t.append(orders)
    n0 = len(t.new_scan().to_arrow())
    t.delete_where(lt("o_orderdate", "1996-01-01"))
    tbl = t.new_scan().to_arrow()
    want = orders.filter(F.col("o_orderdate") >= "1996-01-01").count()
    assert len(tbl) == want < n0
    assert_matches_spark(t.new_scan())


def test_local_read_with_row_delta_deletes(catalog, spark, sf_dir):
    """Position + equality delete files applied locally."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.lr_v2", orders)
    t.append(orders)
    some_keys = [r[0] for r in
                 orders.select("o_orderkey").orderBy("o_orderkey")
                 .limit(5).collect()]
    t.row_delta(equality_delete_keys=orders.filter(
        F.col("o_orderkey").isin(some_keys)).select("o_orderkey"),
        key_cols=["o_orderkey"])
    tbl = t.new_scan().to_arrow()
    assert len(tbl) == orders.count() - 5
    keys = set(tbl["o_orderkey"].to_pylist())
    assert not (keys & set(some_keys))
    assert_matches_spark(t.new_scan())
