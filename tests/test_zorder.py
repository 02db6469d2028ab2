"""Z-order clustering: predicates on EVERY z-column prune files."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


def _planned(t, col, lo, hi):
    return len(t.new_scan().filter(and_(gt_eq(col, lo), lt(col, hi)))
               .plan_files())


def test_zorder_prunes_on_both_columns(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    t = catalog.create_table(
        "db.zord", o,
        properties={"write.target-max-records-per-file": "100"})
    for i in range(4):
        t.append(o.filter(F.col("o_orderkey") % 4 == i)
                 .orderBy(F.rand(seed=i)))
    n = t.to_df().count()
    ck_lo, ck_hi = o.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    ok_lo, ok_hi = o.agg(F.min("o_orderkey"),
                         F.max("o_orderkey")).collect()[0]

    res = t.rewrite_data_files(target_size_bytes=8 * 1024,
                               min_input_files=1,
                               zorder_by=["o_orderkey", "o_custkey"])
    assert res["added_files"] >= 3
    assert t.to_df().count() == n
    assert t.to_df().agg(F.sum("o_orderkey")).collect()[0][0] == \
        o.agg(F.sum("o_orderkey")).collect()[0][0]

    total = res["added_files"]
    # a narrow band on EACH z-column scans a strict subset of files
    ok_band = _planned(t, "o_orderkey",
                       int(ok_lo), int(ok_lo + (ok_hi - ok_lo) // 8))
    ck_band = _planned(t, "o_custkey",
                       int(ck_lo), int(ck_lo + (ck_hi - ck_lo) // 8))
    assert ok_band < total
    assert ck_band < total

    # results stay correct under the pruned scan
    got = sorted(r.o_orderkey for r in
                 t.new_scan().filter(and_(gt_eq("o_orderkey", 100),
                                          lt("o_orderkey", 200)))
                 .to_df().collect())
    want = sorted(r.o_orderkey for r in
                  o.filter((F.col("o_orderkey") >= 100)
                           & (F.col("o_orderkey") < 200)).collect())
    assert got == want


def test_zorder_within_partitions(catalog, spark, sf_dir):
    # r4 (verdict #6): z-order on a PARTITIONED table — the interleave
    # applies within each partition's rewrite group, so a band predicate
    # on each z-column prunes files INSIDE a partition
    import datetime

    from linkedin_iceberg_spark import PartitionSpec, Schema
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.year("o_orderdate") == 1995)
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .month("o_orderdate").build())
    t = catalog.create_table(
        "db.zordp", o, spec=spec,
        properties={"write.target-max-records-per-file": "8"})
    for i in range(2):
        t.append(o.filter(F.col("o_orderkey") % 2 == i)
                 .orderBy(F.rand(seed=i)))
    n = t.to_df().count()
    res = t.rewrite_data_files(target_size_bytes=8 * 1024,
                               min_input_files=1,
                               zorder_by=["o_orderkey", "o_custkey"])
    assert t.to_df().count() == n

    # pick the busiest month and check per-partition z-pruning
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")) \
        .count().orderBy(F.desc("count")).first()["m"]
    m0 = datetime.date(m.year, m.month, 1)
    m1 = datetime.date(m.year + m.month // 12, m.month % 12 + 1, 1)
    month_pred = and_(gt_eq("o_orderdate", m0), lt("o_orderdate", m1))
    files_in_month = len(t.new_scan().filter(month_pred).plan_files())
    assert files_in_month >= 3  # several files: pruning is observable
    ck_lo, ck_hi = o.agg(F.min("o_custkey"), F.max("o_custkey")) \
        .collect()[0]
    band = and_(month_pred,
                and_(gt_eq("o_custkey", int(ck_lo)),
                     lt("o_custkey", int(ck_lo + (ck_hi - ck_lo) // 8))))
    assert len(t.new_scan().filter(band).plan_files()) < files_in_month

    # results stay correct under the pruned scan
    got = sorted(r.o_orderkey for r in
                 t.new_scan().filter(band).to_df().collect())
    want = sorted(
        r.o_orderkey for r in
        o.filter((F.col("o_orderdate") >= F.lit(m0))
                 & (F.col("o_orderdate") < F.lit(m1))
                 & (F.col("o_custkey") >= int(ck_lo))
                 & (F.col("o_custkey")
                    < int(ck_lo + (ck_hi - ck_lo) // 8))).collect())
    assert got == want


def test_zorder_sort_by_conflict(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t2 = catalog.create_table("db.zordc", o)
    t2.append(o.limit(100))
    with pytest.raises(ValueError, match="mutually exclusive"):
        t2.rewrite_data_files(min_input_files=1, sort_by=["o_orderkey"],
                              zorder_by=["o_orderkey", "o_custkey"])
