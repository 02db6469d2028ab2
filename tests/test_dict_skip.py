"""Dictionary file skipping (catalog/analyze.py analyze_dictionary +
dictionary_prune wired into plan_files): per-file exact distinct-value
sets prune eq/IN point lookups that min/max bounds cannot, proven by
physically removing the pruned files (poison) and by an equivalence
sweep against raw-DataFrame answers."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import analyze_dictionary
from linkedin_iceberg_spark.expressions import and_, eq, gt, in_, or_

from conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _clustered(catalog, o, name="db.o"):
    """Files clustered by o_orderpriority: o_orderkey bounds overlap in
    every file (useless for pruning) while the priority dictionaries
    are near-disjoint — the dictionary's home turf."""
    t = catalog.create_table(name, o)
    t.append(o.repartition(5, "o_orderpriority"))
    return t


def test_eq_prunes_files_poison_proven(spark, catalog):
    o = _orders(spark)
    t = _clustered(catalog, o)
    prio = o.select("o_orderpriority").first()[0]
    before = len(t.new_scan().filter(eq("o_orderpriority", prio))
                 .plan_files())
    analyze_dictionary(t, "o_orderpriority")
    tasks = t.new_scan().filter(eq("o_orderpriority", prio)).plan_files()
    assert len(tasks) < before
    kept = {x.file.file_path for x in tasks}
    live = {e.data_file.file_path for e in t._live_data_and_deletes()[0]}
    moved = []
    for p in live - kept:
        shutil.move(p, p + ".poison")
        moved.append(p)
    try:
        got = t.new_scan().filter(eq("o_orderpriority", prio)) \
            .to_df().count()
        assert got == o.filter(F.col("o_orderpriority") == prio).count()
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)


def test_equivalence_sweep(spark, catalog):
    """Every value (and IN sets, and conjuncts with ranges) answers
    identically with and without the store."""
    o = _orders(spark)
    t = _clustered(catalog, o)
    analyze_dictionary(t, "o_orderpriority")
    prios = [r[0] for r in o.select("o_orderpriority").distinct().collect()]
    for p in prios + ["9-NOSUCH"]:
        got = t.new_scan().filter(eq("o_orderpriority", p)).to_df().count()
        assert got == o.filter(F.col("o_orderpriority") == p).count()
    f = and_(in_("o_orderpriority", prios[:2]), gt("o_orderkey", 100))
    got = t.new_scan().filter(f).to_df().count()
    assert got == o.filter(F.col("o_orderpriority").isin(prios[:2]) &
                           (F.col("o_orderkey") > 100)).count()


def test_or_and_negations_do_not_prune_unsoundly(spark, catalog):
    """Predicates under OR are not top-level conjuncts — the walker must
    ignore them (pruning on one OR branch would drop the other's rows)."""
    o = _orders(spark)
    t = _clustered(catalog, o)
    analyze_dictionary(t, "o_orderpriority")
    prios = sorted(r[0] for r in
                   o.select("o_orderpriority").distinct().collect())
    f = or_(eq("o_orderpriority", prios[0]), gt("o_orderkey", 100))
    got = t.new_scan().filter(f).to_df().count()
    assert got == o.filter((F.col("o_orderpriority") == prios[0]) |
                           (F.col("o_orderkey") > 100)).count()


def test_unanalyzed_tail_is_kept(spark, catalog):
    """Files appended after analyze are missing from the store and must
    survive pruning (no info = keep)."""
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    prios = sorted(r[0] for r in
                   o.select("o_orderpriority").distinct().collect())
    t.append(o.filter(F.col("o_orderpriority") == prios[0]))
    analyze_dictionary(t, "o_orderpriority")
    # the tail contains prios[1] — the store knows nothing about it
    t.append(o.filter(F.col("o_orderpriority") == prios[1]))
    got = t.new_scan().filter(eq("o_orderpriority", prios[1])) \
        .to_df().count()
    assert got == o.filter(F.col("o_orderpriority") == prios[1]).count()


def test_overflow_files_never_prune(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    t.append(o.coalesce(1))
    # o_custkey NDV (150) > max_ndv=16 -> overflow marker, no pruning
    assert analyze_dictionary(t, "o_custkey", max_ndv=16) == 1
    ck = o.select("o_custkey").first()[0]
    tasks = t.new_scan().filter(eq("o_custkey", ck)).plan_files()
    assert len(tasks) == 1
    got = t.new_scan().filter(eq("o_custkey", ck)).to_df().count()
    assert got == o.filter(F.col("o_custkey") == ck).count()
    # incremental: nothing to re-analyze (overflow is recorded, not retried)
    assert analyze_dictionary(t, "o_custkey", max_ndv=16) == 0


def test_all_null_file_prunes(spark, catalog):
    o = _orders(spark).limit(50)
    nulled = o.withColumn(
        "o_orderpriority",
        F.lit(None).cast("string"))
    t = catalog.create_table("db.o", o)
    t.append(nulled.coalesce(1))
    t.append(o.coalesce(1))
    analyze_dictionary(t, "o_orderpriority")
    prio = o.select("o_orderpriority").first()[0]
    tasks = t.new_scan().filter(eq("o_orderpriority", prio)).plan_files()
    # eq can never match NULL: the all-null file is pruned outright
    assert len(tasks) == 1
    got = t.new_scan().filter(eq("o_orderpriority", prio)).to_df().count()
    assert got == o.filter(F.col("o_orderpriority") == prio).count()


def test_time_travel_uses_immutable_entries(spark, catalog):
    o = _orders(spark)
    t = _clustered(catalog, o)
    snap = t.current_snapshot().snapshot_id
    analyze_dictionary(t, "o_orderpriority")
    t.append(o.limit(10).coalesce(1))
    prio = o.select("o_orderpriority").first()[0]
    got = (t.new_scan().use_snapshot(snap)
           .filter(eq("o_orderpriority", prio)).to_df().count())
    assert got == o.filter(F.col("o_orderpriority") == prio).count()


def test_type_gate(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    t.append(o)
    with pytest.raises(ValueError, match="dictionary stats support"):
        analyze_dictionary(t, "o_totalprice")  # double: excluded
    with pytest.raises(ValueError, match="no such column"):
        analyze_dictionary(t, "nope")


def test_incremental_tail_only(spark, catalog):
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    t.append(o.repartition(3))
    assert analyze_dictionary(t, "o_orderpriority") == 3
    t.append(o.limit(20).coalesce(1))
    assert analyze_dictionary(t, "o_orderpriority") == 1
    assert analyze_dictionary(t, "o_orderpriority") == 0


def test_exact_count_distinct_from_dict(spark, catalog):
    """count(DISTINCT col) answers EXACTLY from the dictionary store
    (poison: data files moved away); any coverage gap falls back to the
    generic route with the same value."""
    o = _orders(spark)
    t = catalog.create_table("db.o", o)
    t.append(o.repartition(4))
    analyze_dictionary(t, "o_orderpriority")
    exact = o.select("o_orderpriority").distinct().count()
    moved = []
    for e in t._live_data_and_deletes()[0]:
        p = e.data_file.file_path
        shutil.move(p, p + ".poison")
        moved.append(p)
    try:
        got = catalog.sql(
            "SELECT count(DISTINCT o_orderpriority) AS d, count(*) AS n "
            "FROM db.o").head()
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)
    assert got["d"] == exact
    assert got["n"] == o.count()
    # pushable WHERE fully decided by metrics: still store-served
    t2 = catalog.create_table("db.o2", o)
    t2.append(o.filter(F.col("o_orderkey") < 500).coalesce(1))
    t2.append(o.filter(F.col("o_orderkey") >= 500).coalesce(1))
    analyze_dictionary(t2, "o_orderpriority")
    got2 = catalog.sql(
        "SELECT count(DISTINCT o_orderpriority) AS d FROM db.o2 "
        "WHERE o_orderkey < 500").head()["d"]
    assert got2 == (o.filter(F.col("o_orderkey") < 500)
                    .select("o_orderpriority").distinct().count())
    # uncovered tail -> generic route, identical value
    t2.append(o.limit(20).coalesce(1))
    got3 = catalog.sql(
        "SELECT count(DISTINCT o_orderpriority) AS d FROM db.o2"
    ).head()["d"]
    assert got3 == exact
    # overflow store -> generic route, identical value
    t3 = catalog.create_table("db.o3", o)
    t3.append(o.coalesce(1))
    analyze_dictionary(t3, "o_custkey", max_ndv=8)
    got4 = catalog.sql(
        "SELECT count(DISTINCT o_custkey) AS d FROM db.o3").head()["d"]
    assert got4 == o.select("o_custkey").distinct().count()


def test_grouped_count_distinct_from_dict(spark, catalog):
    """GROUP BY identity partition + count(DISTINCT col) from the
    per-partition dictionary unions (poison: data files moved away)."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    o = _orders(spark)
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .identity("o_orderstatus").build()
    t = catalog.create_table("db.og", o, spec=spec)
    t.append(o)
    analyze_dictionary(t, "o_orderpriority")
    want = {(r["o_orderstatus"], r["d"]) for r in
            o.groupBy("o_orderstatus")
            .agg(F.count_distinct("o_orderpriority").alias("d"))
            .collect()}
    moved = []
    for e in t._live_data_and_deletes()[0]:
        p = e.data_file.file_path
        shutil.move(p, p + ".poison")
        moved.append(p)
    try:
        got = {(r["st"], r["d"]) for r in catalog.sql(
            "SELECT o_orderstatus AS st, "
            "count(DISTINCT o_orderpriority) AS d "
            "FROM db.og GROUP BY o_orderstatus").collect()}
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)
    assert got == want
    # unanalyzed tail -> generic route, identical values
    t.append(o.limit(30).coalesce(1))
    got2 = {(r["st"], r["d"]) for r in catalog.sql(
        "SELECT o_orderstatus AS st, "
        "count(DISTINCT o_orderpriority) AS d "
        "FROM db.og GROUP BY o_orderstatus").collect()}
    assert got2 == want
