"""Partition-spec evolution (ref: core/.../TableMetadata.java:416
updatePartitionSpec + specsById): new default spec for new writes, old
files stay scannable and DML-able under their own spec."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import and_, eq, gt_eq, lt


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _mk(catalog, spark, orders):
    """Table starting unpartitioned, evolved to month partitioning."""
    t = catalog.create_table("db.ev", orders)
    t.append(orders.filter(F.col("o_orderkey") <= 500))        # spec 0
    t.update_spec(lambda b: b.month("o_orderdate"))
    t.append(orders.filter(F.col("o_orderkey") > 500))         # spec 1
    return t


def test_mixed_spec_scan_complete(catalog, spark, orders):
    t = _mk(catalog, spark, orders)
    assert len(t.metadata.specs) == 2
    assert t.spec.fields[0].transform_str == "month"
    assert t.to_df().count() == orders.count()
    # both specs present among live files
    sids = {e.data_file.spec_id for e in t._live_entries()
            if e.data_file.content == 0}
    assert sids == {0, 1}


def test_pruning_per_spec(catalog, spark, orders):
    """A date filter prunes new-spec files by month but must NOT prune
    old-spec (unpartitioned) files."""
    t = _mk(catalog, spark, orders)
    flt = and_(gt_eq("o_orderdate", "1996-01-01"),
               lt("o_orderdate", "1996-03-01"))
    tasks = t.new_scan().filter(flt).plan_files()
    sids = {tk.file.spec_id for tk in tasks}
    assert 0 in sids  # unpartitioned old files always planned
    # new-spec files got month-pruned: fewer spec-1 tasks than total spec-1
    all_s1 = [e for e in t._live_entries()
              if e.data_file.content == 0 and e.data_file.spec_id == 1]
    planned_s1 = [tk for tk in tasks if tk.file.spec_id == 1]
    assert 0 < len(planned_s1) < len(all_s1)
    # and the rows are exactly right
    got = t.scan(flt).count()
    exp = orders.filter((F.col("o_orderdate") >= "1996-01-01")
                        & (F.col("o_orderdate") < "1996-03-01")).count()
    assert got == exp


def test_delete_where_across_specs(catalog, spark, orders):
    t = _mk(catalog, spark, orders)
    n0 = t.to_df().count()
    flt = lt("o_orderdate", "1995-01-01")
    n_match = orders.filter(F.col("o_orderdate") < "1995-01-01").count()
    t.delete_where(flt)
    assert t.refresh().to_df().count() == n0 - n_match
    assert t.to_df().filter(F.col("o_orderdate") < "1995-01-01").count() == 0


def test_time_travel_across_spec_change(catalog, spark, orders):
    t = catalog.create_table("db.ev_tt", orders)
    t.append(orders.filter(F.col("o_orderkey") <= 500))
    v1 = t.current_snapshot().snapshot_id
    t.update_spec(lambda b: b.month("o_orderdate"))
    t.append(orders.filter(F.col("o_orderkey") > 500))
    old = t.scan(snapshot_id=v1)
    assert old.count() == orders.filter(F.col("o_orderkey") <= 500).count()


def test_spec_evolution_with_identity_rename(catalog, spark, orders):
    """Evolve to identity partitioning, then rename the source column —
    reads must survive both (spec binds by source id at build time)."""
    t = catalog.create_table("db.ev_id", orders)
    t.append(orders.limit(100))
    t.update_spec(lambda b: b.identity("o_orderstatus"))
    t.append(orders.limit(200))
    assert t.to_df().count() == 300
    t.update_schema().rename_column("o_orderstatus", "status").commit()
    df = t.refresh().to_df()
    assert df.filter(F.col("status").isNotNull()).count() == 300
    assert t.scan(eq("status", "O")).count() == \
        df.filter(F.col("status") == "O").count()


def test_metadata_tables_after_spec_evolution(catalog, spark, orders):
    t = _mk(catalog, spark, orders)
    parts = t.metadata_table("partitions")
    assert parts.count() > 1  # unpartitioned root + month partitions
    files = t.metadata_table("files")
    assert files.count() == len([e for e in t._live_entries()
                                 if e.data_file.content == 0])
    snaps = t.metadata_table("snapshots")
    assert snaps.count() == len(t.snapshots())
