"""Metadata-only COUNT(*): counts come from manifest record_counts, data
is read only for files the metadata cannot decide."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.expressions import and_, eq, gt_eq, lt


@pytest.fixture()
def part_table(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .month("o_orderdate").build())
    t = catalog.create_table("db.cnt", o, spec=spec)
    t.append(o)
    return t, o


def test_count_without_filter_is_metadata_only(part_table, monkeypatch):
    t, o = part_table
    scan = t.new_scan()

    def no_read(tasks=None):  # pragma: no cover - trip wire
        raise AssertionError("metadata-only count read data files")
    monkeypatch.setattr(scan, "_to_df_default", no_read)
    assert scan.count_rows() == o.count()


def test_partition_aligned_filter_is_metadata_only(part_table, spark,
                                                   monkeypatch):
    import datetime
    t, o = part_table
    m0, m1 = datetime.date(1995, 3, 1), datetime.date(1995, 4, 1)
    scan = t.new_scan().filter(and_(gt_eq("o_orderdate", m0),
                                    lt("o_orderdate", m1)))

    def no_read(tasks=None):  # pragma: no cover - trip wire
        raise AssertionError("partition-aligned count read data files")
    monkeypatch.setattr(scan, "_to_df_default", no_read)
    want = o.filter((F.col("o_orderdate") >= F.lit(m0))
                    & (F.col("o_orderdate") < F.lit(m1))).count()
    assert scan.count_rows() == want


def test_partial_filter_reads_only_undecided_files(part_table):
    t, o = part_table
    # a key predicate decides nothing at partition level: counting reads
    # data, but the answer must still be exact
    got = t.new_scan().filter(lt("o_orderkey", 500)).count_rows()
    assert got == o.filter(F.col("o_orderkey") < 500).count()


def test_count_respects_deletes(part_table):
    t, o = part_table
    n = o.count()
    t.delete_where(lt("o_orderkey", 300))
    t.refresh()
    dropped = o.filter(F.col("o_orderkey") < 300).count()
    assert t.new_scan().count_rows() == n - dropped


def test_count_respects_pending_equality_deletes(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1000)
    t = catalog.create_table("db.cnt2", o)
    t.append(o)
    # v2 equality deletes stay PENDING (no rewrite): the fast path must
    # not trust record_count for delete-laden files
    keys = o.select("o_orderkey").limit(50)
    from linkedin_iceberg_spark.catalog.row_delta import row_delta
    row_delta(t, equality_delete_keys=keys, key_cols=["o_orderkey"])
    t.refresh()
    assert t.new_scan().count_rows() == 950


def test_agg_minmax_metadata_only(part_table, monkeypatch):
    t, o = part_table
    scan = t.new_scan()

    def no_read(tasks=None):  # pragma: no cover - trip wire
        raise AssertionError("metadata-only min/max read data files")
    monkeypatch.setattr(scan, "_to_df_default", no_read)
    # long column: doubles are excluded from the fast path (NaN hazard)
    lo, hi = scan.agg_minmax("o_orderkey")
    row = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).head()
    assert (lo, hi) == (row[0], row[1])


def test_agg_minmax_falls_back_on_partial_filter(part_table):
    t, o = part_table
    lo, hi = t.new_scan().filter(lt("o_orderkey", 500)) \
        .agg_minmax("o_custkey")
    row = o.filter(F.col("o_orderkey") < 500) \
        .agg(F.min("o_custkey"), F.max("o_custkey")).head()
    assert (lo, hi) == (row[0], row[1])


def test_agg_minmax_string_falls_back(part_table):
    t, o = part_table
    lo, hi = t.new_scan().agg_minmax("o_orderstatus")
    row = o.agg(F.min("o_orderstatus"), F.max("o_orderstatus")).head()
    assert (lo, hi) == (row[0], row[1])


def test_agg_minmax_respects_deletes(part_table):
    t, o = part_table
    t.delete_where(gt_eq("o_orderkey", 14000))
    t.refresh()
    lo, hi = t.new_scan().agg_minmax("o_orderkey")
    row = o.filter(F.col("o_orderkey") < 14000) \
        .agg(F.min("o_orderkey"), F.max("o_orderkey")).head()
    assert (lo, hi) == (row[0], row[1])


def test_agg_minmax_hybrid_scans_only_undecided(catalog, spark, sf_dir):
    """Pending eq-deletes poison one file's bounds: the aggregate folds
    metadata for the clean files and scans ONLY the delete-laden one."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy("o_orderkey")
    t = catalog.create_table("db.cnt3", o)
    t.append(o.filter(F.col("o_orderkey") <= 500))
    # eq-delete lands BEFORE the second append: it targets only the
    # strictly older first file (sequence scoping), the later file is
    # clean and its bounds can be folded from metadata
    from linkedin_iceberg_spark.catalog.row_delta import row_delta
    row_delta(t, equality_delete_keys=o.filter(F.col("o_orderkey") <= 5)
              .select("o_orderkey"), key_cols=["o_orderkey"])
    t.refresh()
    t.append(o.filter(F.col("o_orderkey") > 500))
    t.refresh()
    scan = t.new_scan()
    orig = scan._to_df_default
    seen = {}

    def spy(tasks=None):
        seen["n"] = len(tasks)
        return orig(tasks=tasks)
    scan._to_df_default = spy
    lo, hi = scan.agg_minmax("o_orderkey")
    want = o.filter(F.col("o_orderkey") > 5) \
        .agg(F.min("o_orderkey"), F.max("o_orderkey")).head()
    assert (lo, hi) == (want[0], want[1])
    total_files = len(t.new_scan().plan_files())
    assert 0 < seen["n"] < total_files  # scanned a strict subset
