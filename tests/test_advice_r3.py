"""Round-3 ADVICE fixes, each with the failure scenario the advisor named.

1. overwrite_partitions must not let stale old-spec rows silently survive
   a dynamic overwrite.  (r3 fenced this by refusing mixed-spec tables;
   r4 upgraded the fence to a copy-on-write fallback that serves the
   request — see test_advice_r4.py for the surgical per-partition case.)
2. add_files must reject re-imports of already-referenced files
   (double-counted rows otherwise; ref: SparkTableUtil importSparkTable
   rejects duplicates by default).
3. CreateSnapshotEvent fires on DURABLE commits only: staged transaction
   snapshots emit nothing until Transaction.commit publishes; abandoned
   transactions emit nothing ever.
4. Local Arrow read injects identity-partition constants from the FILE's
   spec, not the default spec (spec evolution would null them otherwise).
5. Partitioned ORC import reads physical columns from the ORC footer, so
   Hive partition columns are recovered just like parquet.
"""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import events as EV


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_overwrite_partitions_handles_mixed_specs(catalog, spark, orders):
    # r4: instead of refusing, old-spec files go copy-on-write — no row
    # written before the spec evolution may survive in an overwritten
    # logical partition
    t = catalog.create_table("db.owp", orders)
    t.append(orders.filter(F.col("o_orderkey") <= 500))       # spec 0 ({})
    t.update_spec(lambda b: b.month("o_orderdate"))
    t.append(orders.filter(F.col("o_orderkey") > 500))        # spec 1
    repl = orders.filter(F.col("o_orderkey") > 500) \
        .withColumn("o_totalprice", F.lit(0.0))
    t = t.overwrite_partitions(repl)
    got = t.to_df()
    months = {r[0] for r in repl.select(
        F.date_trunc("month", "o_orderdate")).distinct().collect()}
    in_touched = F.date_trunc("month", "o_orderdate").isin(list(months))
    # every row in an overwritten month is a replacement row
    assert got.filter(in_touched & (F.col("o_totalprice") != 0.0)) \
        .count() == 0
    assert got.filter(in_touched).count() == repl.count()
    # rows of untouched months (only spec-0 batch has any) are intact
    want_rest = orders.filter(F.col("o_orderkey") <= 500) \
        .filter(~in_touched).count()
    assert got.filter(~in_touched).count() == want_rest


def test_overwrite_partitions_ok_when_all_current_spec(catalog, spark,
                                                       orders):
    t = catalog.create_table(
        "db.owp2", orders,
        spec=None)
    t.append(orders.limit(100))
    # single (unpartitioned) spec: dynamic overwrite still works
    t.overwrite_partitions(orders.limit(10))
    assert t.to_df().count() == 10


def test_add_files_rejects_duplicate_import(catalog, spark, tmp_path):
    src = str(tmp_path / "flat")
    spark.range(0, 50).select(F.col("id"), (F.col("id") * 2).alias("v")) \
        .write.parquet(src)
    t = catalog.create_table("db.dup", spark.read.parquet(src))
    t.add_files(src)
    assert t.to_df().count() == 50
    with pytest.raises(ValueError, match="already referenced"):
        t.add_files(src)
    # state unchanged: no double counting
    assert t.to_df().count() == 50


def test_txn_snapshot_events_fire_only_on_publish(catalog, spark, orders):
    snaps = []
    EV.register(EV.CreateSnapshotEvent, snaps.append)
    try:
        t = catalog.create_table("db.txev", orders)
        t.append(orders.limit(100))
        assert len(snaps) == 1  # plain append: immediate durable commit

        txn = (t.new_transaction()
               .append(orders.filter(F.col("o_orderkey") <= 50))
               .update_properties({"k": "v"}))
        # staged only — no events yet
        assert len(snaps) == 1
        txn.commit()
        # published: the staged append's event fires now
        assert len(snaps) == 2
        assert snaps[-1].operation == "append"
    finally:
        EV._listeners.clear()


def test_abandoned_txn_emits_no_events(catalog, spark, orders):
    snaps = []
    EV.register(EV.CreateSnapshotEvent, snaps.append)
    try:
        t = catalog.create_table("db.txev2", orders)
        txn = t.new_transaction().append(orders.limit(10))
        del txn  # never committed
        assert snaps == []
        assert t.current_snapshot() is None
    finally:
        EV._listeners.clear()


@pytest.fixture()
def hive_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(0, 90).select(
        F.col("id"), (F.col("id") % 7).alias("val"),
        F.when(F.col("id") % 3 == 0, "emea")
         .when(F.col("id") % 3 == 1, "apac")
         .otherwise("amer").alias("region"))
    df.write.partitionBy("region").parquet(src)
    return src


def test_local_read_partition_constants_survive_spec_evolution(
        catalog, spark, hive_dir):
    from linkedin_iceberg_spark.catalog.local_read import scan_to_arrow
    t = catalog.import_table("db.lr_ev", hive_dir)
    # evolve the default spec so it no longer carries identity(region)
    t.update_spec(lambda b: b.identity("val"))
    atbl = scan_to_arrow(t.new_scan())
    pdf = atbl.to_pandas()
    assert len(pdf) == 90
    # imported files were planned under their own (old) spec: the region
    # identity constant is injected, never null
    assert pdf["region"].notna().all()
    assert set(pdf["region"]) == {"emea", "apac", "amer"}
    # and values line up with the original data
    exp = spark.read.parquet(hive_dir).select("id", "region").toPandas()
    merged = pdf[["id", "region"]].merge(exp, on="id",
                                         suffixes=("_got", "_exp"))
    assert (merged["region_got"] == merged["region_exp"]).all()


def test_import_table_orc_partitioned(catalog, spark, tmp_path):
    src = str(tmp_path / "orcsrc")
    df = spark.range(0, 60).select(
        F.col("id"), (F.col("id") * 3).alias("v"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("par"))
    df.write.partitionBy("par").orc(src)

    t = catalog.import_table("db.orcp", src, fmt="orc")
    assert [f.source_name for f in t.spec.fields] == ["par"]
    got = t.to_df()
    assert got.count() == 60
    assert dict(got.groupBy("par").count().collect()) == \
        {"even": 30, "odd": 30}
    # metadata-only: files still under the source dir
    assert all(e.data_file.file_path.startswith(os.path.abspath(src))
               for e in t._live_entries())
