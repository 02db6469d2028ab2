"""Per-file value histograms (catalog/analyze.py analyze_histogram +
histogram_fold, consulted by scan.count_rows_grouped): GROUP BY a
low-NDV column answers from metadata with zero data I/O on covered
files — poison-proven — and degrades per file (covered files fold,
everything else is actually read; counts are additive so the mix is
exact)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (analyze_histogram,
                                                    histogram_fold)

from conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _want(o, col="o_orderpriority"):
    return {(r[col],): r["count"]
            for r in o.groupBy(col).count().collect()}


def test_fold_matches_and_is_poison_proven(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    t.append(o.repartition(5))
    assert analyze_histogram(t, "o_orderpriority") == 5
    assert analyze_histogram(t, "o_orderpriority") == 0  # incremental
    want = _want(o)
    assert t.new_scan().count_rows_grouped(["o_orderpriority"]) == want
    live = [e.data_file.file_path
            for e in t._live_data_and_deletes()[0]]
    for p in live:
        shutil.move(p, p + ".poison")
    try:
        got = t.new_scan().count_rows_grouped(["o_orderpriority"])
        assert got == want  # zero data input
    finally:
        for p in live:
            shutil.move(p + ".poison", p)


def test_partial_coverage_mixes_fold_and_read(spark, catalog):
    """Files appended after the analyze are READ; covered files fold —
    the sum is exact."""
    o = _orders(spark)
    t = catalog.create_table("db.mix", o)
    t.append(o.filter(F.col("o_orderkey") % 2 == 0).repartition(3))
    analyze_histogram(t, "o_orderpriority")
    t.append(o.filter(F.col("o_orderkey") % 2 == 1).coalesce(1))
    got = t.new_scan().count_rows_grouped(["o_orderpriority"])
    assert got == _want(o)


def test_overflow_files_never_fold_but_stay_exact(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.ovf", o)
    t.append(o.repartition(2))
    analyze_histogram(t, "o_custkey", max_ndv=10)  # 1500 NDV: overflow
    got = t.new_scan().count_rows_grouped(["o_custkey"])
    assert got == _want(o, "o_custkey")


def test_null_group_and_all_null_file(spark, catalog):
    o = _orders(spark).withColumn(
        "maybe", F.when(F.col("o_orderkey") % 3 == 0,
                        F.col("o_orderpriority")))
    t = catalog.create_table("db.n", o)
    t.append(o.filter(F.col("o_orderkey") % 3 != 0)
             .withColumn("maybe", F.lit(None).cast("string"))
             .coalesce(1))
    t.append(o.filter(F.col("o_orderkey") % 3 == 0).coalesce(1))
    analyze_histogram(t, "maybe")
    want = {(r["maybe"],): r["count"]
            for r in (o.withColumn(
                "maybe", F.when(F.col("o_orderkey") % 3 == 0,
                                F.col("o_orderpriority")))
                .groupBy("maybe").count().collect())}
    assert t.new_scan().count_rows_grouped(["maybe"]) == want


def test_deletes_force_reads_counts_stay_right(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.del", o)
    t.append(o.repartition(4))
    analyze_histogram(t, "o_orderpriority")
    dead = o.filter(F.col("o_orderkey") < 200).select("o_orderkey")
    t.row_delta(equality_delete_keys=dead, key_cols=["o_orderkey"])
    t = t.refresh()
    got = t.new_scan().count_rows_grouped(["o_orderpriority"])
    assert got == _want(o.filter(~(F.col("o_orderkey") < 200)))


def test_where_pruning_composes(spark, catalog):
    """A WHERE that partition-prunes decides the surviving files fully,
    so they still fold from the store."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import eq
    o = _orders(spark)
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderstatus").build()
    t = catalog.create_table("db.pp", o, spec=spec)
    t.append(o)
    analyze_histogram(t, "o_orderpriority")
    st = o.select("o_orderstatus").first()[0]
    got = (t.new_scan().filter(eq("o_orderstatus", st))
           .count_rows_grouped(["o_orderpriority"]))
    assert got == _want(o.filter(F.col("o_orderstatus") == st))


def test_store_duplication_invariance(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.dup", o)
    t.append(o.repartition(3))
    analyze_histogram(t, "o_orderpriority")
    fid = t.schema.id_for_name("o_orderpriority")
    d = os.path.join(t.location, "stats_hist", str(fid))
    spark.read.parquet(d).write.mode("append").parquet(d)
    assert t.new_scan().count_rows_grouped(["o_orderpriority"]) == \
        _want(o)


def test_rename_keeps_store(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.ren", o)
    t.append(o.repartition(3))
    analyze_histogram(t, "o_orderpriority")
    t.update_schema().rename_column("o_orderpriority", "prio").commit()
    t = t.refresh()
    live = [e.data_file.file_path
            for e in t._live_data_and_deletes()[0]]
    for p in live:
        shutil.move(p, p + ".poison")
    try:
        got = t.new_scan().count_rows_grouped(["prio"])
        assert got == _want(o)
    finally:
        for p in live:
            shutil.move(p + ".poison", p)


def test_sql_group_by_and_heavy_hitters(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.sql", o)
    t.append(o.repartition(4))
    analyze_histogram(t, "o_orderpriority")
    want = _want(o)
    live = [e.data_file.file_path
            for e in t._live_data_and_deletes()[0]]
    for p in live:
        shutil.move(p, p + ".poison")
    try:
        df = catalog.sql("SELECT o_orderpriority, count(*) AS n "
                         "FROM db.sql GROUP BY o_orderpriority")
        assert {(r["o_orderpriority"],): r["n"]
                for r in df.collect()} == want
        top = catalog.sql(
            "SELECT o_orderpriority, count(*) AS n FROM db.sql "
            "GROUP BY o_orderpriority "
            "ORDER BY n DESC, o_orderpriority LIMIT 2").collect()
        expect = sorted(((k[0], v) for k, v in want.items()),
                        key=lambda x: (-x[1], x[0]))[:2]
        assert [(r["o_orderpriority"], r["n"]) for r in top] == expect
    finally:
        for p in live:
            shutil.move(p + ".poison", p)
    # unordered LIMIT must NOT take the metadata route (arbitrary rows
    # are the generic semantics) — just assert it still answers
    n = catalog.sql("SELECT o_orderpriority, count(*) AS n FROM db.sql "
                    "GROUP BY o_orderpriority LIMIT 2").count()
    assert n == 2


def test_bad_args(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.bad", o)
    t.append(o.coalesce(1))
    with pytest.raises(ValueError):
        analyze_histogram(t, "nope")
    with pytest.raises(ValueError):
        analyze_histogram(t, "o_totalprice")  # double: unsupported
    with pytest.raises(ValueError):
        histogram_fold(t, "nope", ["x"])
