"""r7: table write order — ALTER TABLE ... WRITE ORDERED BY +
DISTRIBUTED BY RANGE globally range-clusters every write, so file
min/max bounds are disjoint and metrics skipping prunes key-range scans
on UNPARTITIONED tables (the write-order story of the Spark SQL
extensions; ref: TableProperties write.distribution-mode /
default-sort-order consumption in SparkWriteBuilder)."""

import os

from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


def _key_span_files(t, lo, hi):
    return t.new_scan().filter(
        and_(gt_eq("o_orderkey", lo), lt("o_orderkey", hi))).plan_files()


def test_range_ordered_writes_prune_key_scans(catalog, spark, sf_dir):
    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .orderBy(F.rand(seed=7)))  # arrive shuffled

    # baseline: default write (hash-less unpartitioned, no sort) —
    # every file overlaps the probed key range
    base = catalog.create_table("db.wo_base", o)
    base.append(o.repartition(8))
    assert len(base._live_data_and_deletes()[0]) >= 8
    n_base = len(_key_span_files(base, 100, 200))
    assert n_base >= 8  # shuffled layout defeats min/max skipping

    t = catalog.create_table("db.wo_rng", o)
    catalog.sql("ALTER TABLE db.wo_rng WRITE ORDERED BY (o_orderkey)")
    catalog.sql("ALTER TABLE db.wo_rng WRITE DISTRIBUTED BY RANGE")
    # bound file size so the range-clustered write splits into several
    # files (AQE coalesces the tiny test shuffle to one partition;
    # sorted data keeps each split file's bounds disjoint)
    catalog.sql("ALTER TABLE db.wo_rng SET TBLPROPERTIES "
                "('write.target-max-records-per-file'='200')")
    t.refresh()
    assert t.properties["write.sort-by"] == "o_orderkey"
    assert t.properties["write.distribution-mode"] == "range"
    t.append(o.repartition(8))
    files = t._live_data_and_deletes()[0]
    assert len(files) > 1
    pruned = _key_span_files(t, 100, 200)
    # range clustering: the probed span lives in very few files
    assert len(pruned) <= 2, (len(pruned), len(files))
    # and the data is identical
    got = t.to_df().count()
    assert got == o.count()


def test_write_ordered_by_validates_columns(catalog, spark, sf_dir):
    import pytest
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.wo_bad", o)
    with pytest.raises(ValueError, match="no such"):
        catalog.sql("ALTER TABLE db.wo_bad WRITE ORDERED BY (nope)")
    out = catalog.sql("ALTER TABLE db.wo_bad WRITE DISTRIBUTED BY "
                      "PARTITION").collect()[0]
    assert "hash" in out["detail"]


def test_zorder_write_order(catalog, spark, sf_dir):
    """zorder(...) write order: multi-dim clustering at write time —
    range predicates on EITHER z-column prune files."""
    import pytest
    from linkedin_iceberg_spark.expressions import and_, gt_eq, lt

    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .select("o_orderkey", "o_custkey", "o_totalprice")
         .orderBy(F.rand(seed=3)))
    t = catalog.create_table("db.wo_z", o)
    catalog.sql("ALTER TABLE db.wo_z WRITE ORDERED BY "
                "zorder(o_orderkey, o_custkey)")
    catalog.sql("ALTER TABLE db.wo_z WRITE DISTRIBUTED BY RANGE")
    catalog.sql("ALTER TABLE db.wo_z SET TBLPROPERTIES "
                "('write.target-max-records-per-file'='200')")
    t.refresh()
    assert t.properties["write.sort-by"] == "zorder(o_orderkey,o_custkey)"
    t.append(o)
    files = t._live_data_and_deletes()[0]
    assert len(files) > 3
    # the z column never lands in the data
    assert "_liceberg_z" not in t.to_df().columns
    n_all = len(files)
    for col, lo, hi in (("o_orderkey", 0, 150), ("o_custkey", 0, 15)):
        n = len(t.new_scan().filter(
            and_(gt_eq(col, lo), lt(col, hi))).plan_files())
        assert n < n_all, (col, n, n_all)
    assert t.to_df().count() == o.count()
    with pytest.raises(ValueError, match="interleave"):
        catalog.sql("CREATE TABLE db.zs (a INT, s STRING)")
        catalog.sql("ALTER TABLE db.zs WRITE ORDERED BY zorder(a, s)")
