"""r7: ALTER TABLE ... RENAME TO — metadata-only logical-name remap
(the reference's directory catalog throws on rename because manifests
hold absolute paths, HadoopCatalog.java:219; we remap the NAME in a
warehouse-level catalog.json and leave the location untouched)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.orders", orders).append(orders)
    return catalog


def test_rename_roundtrip(cat):
    n = cat.load_table("db.orders").to_df().count()
    out = cat.sql("ALTER TABLE db.orders RENAME TO db.orders2"
                  ).collect()[0]
    assert "renamed" in out["detail"]
    assert not cat.table_exists("db.orders")
    t = cat.load_table("db.orders2")
    assert t.to_df().count() == n  # absolute paths still valid
    shown = {r["tableName"] for r in cat.sql("SHOW TABLES IN db"
                                             ).collect()}
    assert shown == {"orders2"}
    # rename back
    cat.sql("ALTER TABLE db.orders2 RENAME TO db.orders")
    assert cat.table_exists("db.orders")
    assert not cat.table_exists("db.orders2")
    assert cat.load_table("db.orders").to_df().count() == n


def test_rename_then_recreate_old_name(cat, spark):
    cat.sql("ALTER TABLE db.orders RENAME TO db.archive")
    # the old name is free again even though its default dir holds the
    # renamed table's files: a new table allocates a fresh location
    kv = spark.createDataFrame([(1, "a")], "k bigint, v string")
    cat.create_table("db.orders", kv).append(kv)
    assert cat.load_table("db.orders").to_df().count() == 1
    assert cat.load_table("db.archive").to_df().count() > 1
    shown = {r["tableName"] for r in cat.sql("SHOW TABLES IN db"
                                             ).collect()}
    assert shown == {"orders", "archive"}
    # drops resolve through the mapping and clean it up
    cat.drop_table("db.orders")
    assert not cat.table_exists("db.orders")
    assert cat.load_table("db.archive").to_df().count() > 1


def test_rename_guards(cat, spark):
    with pytest.raises(Exception, match="no such table"):
        cat.sql("ALTER TABLE db.nope RENAME TO db.x")
    kv = spark.createDataFrame([(1,)], "k bigint")
    cat.create_table("db.other", kv)
    with pytest.raises(Exception, match="exists"):
        cat.sql("ALTER TABLE db.other RENAME TO db.orders")


def test_renamed_table_dml_and_sql(cat):
    cat.sql("ALTER TABLE db.orders RENAME TO db.o2")
    before = cat.sql("SELECT count(*) AS n FROM db.o2"
                     ).collect()[0]["n"]
    cat.sql("DELETE FROM db.o2 WHERE o_orderkey < 100")
    after = cat.sql("SELECT count(*) AS n FROM db.o2"
                    ).collect()[0]["n"]
    assert after == before - 100


def test_inflight_writer_survives_rename(cat, spark):
    """The name-mapping design means a rename never moves the location:
    a handle loaded BEFORE the rename keeps committing (its CAS runs on
    per-table version files at the unchanged location), and readers
    under the NEW name see those commits."""
    t = cat.load_table("db.orders")  # pre-rename handle
    n0 = t.to_df().count()
    cat.sql("ALTER TABLE db.orders RENAME TO db.moved")
    extra = spark.createDataFrame(
        [(99999991, 1, "O", 1.0, None, "1-URGENT")],
        t.to_df().schema)
    t.append(extra)  # old handle commits after the rename
    assert cat.load_table("db.moved").to_df().count() == n0 + 1
