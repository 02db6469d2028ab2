"""Regression tests for the round-8 ADVICE items.

1. (high) incremental reads must survive in-range/after-range rewrites:
   compaction (replace) and commit-time manifest merging rewrite live
   entries as STATUS_EXISTING or swap files entirely — the old live-view
   walk silently dropped appended rows (ref contract:
   core/.../IncrementalDataTableScan.java reads each append snapshot's own
   immutable manifests and throws on OVERWRITE in range).
2. (high) analyze_bloom / analyze_histogram / analyze_topk must resolve
   each file's WRITTEN column name per its schema_id — reading pre-rename
   files by the current name yields all-NULL columns, i.e. "always prunes"
   blooms (silently lost rows) and NULL-group histogram corruption.
3. (medium) colocated count(DISTINCT k) GROUP BY k — duplicated pandas
   key crashed the executor for valid SQL.
4. (low) count-only GROUP BY on a histogram-covered bucket column should
   take the zero-data-I/O metadata fold, not the co-located read.
5. (low) count_distinct-only colocated aggs must keep groups whose rows
   are all-NULL in the counted column (SQL returns them with count 0).
"""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.expressions import eq, gt
from linkedin_iceberg_spark.sources.batch_source import read_table


def _keys(df):
    return sorted(r[0] for r in df.select("o_orderkey").collect())


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


# ---------------------------------------------------------------- item 1


def test_incremental_survives_compaction_in_range(catalog, spark, orders):
    """Files appended in (start, end] and then compacted away (replace)
    must still be returned — the reference reads the append snapshots' own
    manifests, which compaction never touches."""
    t = catalog.create_table("db.inc_compact", orders)
    t.append(orders.filter("o_orderkey <= 100"))
    t = t.refresh()
    s0 = t.metadata.current_snapshot_id
    mid = orders.filter("o_orderkey > 100 AND o_orderkey <= 200")
    t.append(mid)
    t = t.refresh()
    # compaction rewrites everything into new files under a replace snapshot
    t.rewrite_data_files(target_size_bytes=1 << 30)
    t = t.refresh()
    end = t.metadata.current_snapshot_id
    from linkedin_iceberg_spark.catalog.incremental import appends_between
    got = appends_between(t, s0, end)
    assert _keys(got) == _keys(mid)
    # and through the DataSource read-option path
    got2 = read_table(spark, t, start_snapshot_id=s0, end_snapshot_id=end)
    assert _keys(got2) == _keys(mid)


def test_incremental_survives_manifest_merge(catalog, spark, orders):
    """Commit-time manifest merging rewrites surviving entries as
    STATUS_EXISTING (snapshot_id preserved) — selection must key on
    snapshot_id, not ADDED status."""
    t = catalog.create_table("db.inc_merge", orders)
    t.update_properties(set_props={"commit.manifest.min-count-to-merge": "2"})
    t = t.refresh()
    t.append(orders.filter("o_orderkey <= 50"))
    t = t.refresh()
    s0 = t.metadata.current_snapshot_id
    a = orders.filter("o_orderkey > 50 AND o_orderkey <= 120")
    b = orders.filter("o_orderkey > 120 AND o_orderkey <= 180")
    t.append(a)          # merge fires: prior manifests rewritten EXISTING
    t = t.refresh()
    t.append(b)          # merge fires again — 'a' entries now EXISTING too
    t = t.refresh()
    end = t.metadata.current_snapshot_id
    from linkedin_iceberg_spark.catalog.incremental import appends_between
    got = appends_between(t, s0, end)
    assert _keys(got) == _keys(a.union(b))
    got2 = read_table(spark, t, start_snapshot_id=s0)
    assert _keys(got2) == _keys(a.union(b))
    # filters still prune + re-apply correctly on the incremental path
    got3 = read_table(spark, t, start_snapshot_id=s0) \
        .filter(F.col("o_orderkey") > 130)
    assert _keys(got3) == _keys(b.filter("o_orderkey > 130"))


def test_incremental_raises_on_overwrite_in_range(catalog, spark, orders):
    """ref: IncrementalDataTableScan.snapshotsWithin throws on OVERWRITE
    inside the range instead of silently returning fewer rows."""
    t = catalog.create_table("db.inc_ovr", orders)
    t.append(orders.filter("o_orderkey <= 100"))
    t = t.refresh()
    s0 = t.metadata.current_snapshot_id
    t.append(orders.filter("o_orderkey > 100 AND o_orderkey <= 150"))
    t = t.refresh()
    t.overwrite_where(
        orders.filter("o_orderkey > 500 AND o_orderkey <= 520"),
        gt("o_orderkey", 120))
    t = t.refresh()
    end = t.metadata.current_snapshot_id
    from linkedin_iceberg_spark.catalog.incremental import appends_between
    with pytest.raises(ValueError, match="overwrite"):
        appends_between(t, s0, end)
    # a delete in range is skipped (reference parity), not an error
    t2 = catalog.create_table("db.inc_del", orders)
    t2.append(orders.filter("o_orderkey <= 100"))
    t2 = t2.refresh()
    s0 = t2.metadata.current_snapshot_id
    add = orders.filter("o_orderkey > 100 AND o_orderkey <= 150")
    t2.append(add)
    t2 = t2.refresh()
    t2.delete_where(gt("o_orderkey", 140))
    t2 = t2.refresh()
    got = appends_between(t2, s0, t2.metadata.current_snapshot_id)
    assert _keys(got) == _keys(add)  # append-only: delete NOT applied


# ---------------------------------------------------------------- item 2


def _rename_fixture(catalog, spark, name):
    """Two files written under column name 'v', then rename v->val, then
    one file written under 'val'."""
    df1 = spark.createDataFrame([(i, i % 7) for i in range(500)],
                                "id bigint, v bigint")
    t = catalog.create_table(name, df1)
    t.append(df1)
    t = t.refresh()
    t.append(spark.createDataFrame(
        [(1000 + i, 7 + i % 3) for i in range(500)], "id bigint, v bigint"))
    t = t.refresh()
    up = t.update_schema()
    up.rename_column("v", "val")
    up.commit()
    t = t.refresh()
    t.append(spark.createDataFrame(
        [(2000 + i, 42) for i in range(100)], "id bigint, val bigint"))
    return t.refresh()


def test_bloom_after_rename_keeps_matching_rows(catalog, spark):
    t = _rename_fixture(catalog, spark, "db.bloom_ren")
    from linkedin_iceberg_spark.catalog.bloom import analyze_bloom
    analyze_bloom(t, "val")
    # value 3 only exists in PRE-rename files; empty blooms would prune them
    got = t.new_scan().filter(eq("val", 3)).to_df()
    want = t.to_df().filter("val = 3").count()
    assert want > 0
    assert got.count() == want


def test_histogram_after_rename_counts_correctly(catalog, spark):
    t = _rename_fixture(catalog, spark, "db.hist_ren")
    from linkedin_iceberg_spark.catalog.analyze import analyze_histogram
    analyze_histogram(t, "val")
    want = {(r["val"],): r["c"] for r in
            t.to_df().groupBy("val").agg(F.count("*").alias("c")).collect()}
    got = t.new_scan().count_rows_grouped(["val"])
    assert got == want


def test_topk_after_rename(catalog, spark):
    t = _rename_fixture(catalog, spark, "db.topk_ren")
    from linkedin_iceberg_spark.catalog.analyze import (analyze_topk,
                                                        approx_top_k)
    analyze_topk(t, "val", m=64)
    got = {v: (lo, hi, g) for v, lo, hi, g in approx_top_k(t, "val", 5, m=64)}
    # pre-rename: 0..6 ~71x (file 1), 7/8/9 ~167x (file 2); post-rename:
    # 42 100x.  An all-NULL misread of the pre-rename files would surface
    # 42 as top-1 and lose 7/8/9 entirely.
    assert got[7] == (167, 167, True)
    assert got[8] == (167, 167, True)
    assert got[9] == (166, 166, True)
    assert got[42] == (100, 100, True)


# ------------------------------------------------------------ items 3-5


@pytest.fixture()
def bucketed(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 10, (None if i % 10 == 3 else f"u{i % 4}"))
         for i in range(1000)],
        "id bigint, k bigint, u string")
    sch = Schema.from_spark(df.schema)
    spec = PartitionSpec.builder_for(sch).bucket("k", 8).build()
    t = catalog.create_table("db.cd_buckets", df, spec=spec)
    t.append(df)
    return t.refresh()


def test_colocated_count_distinct_of_group_key(catalog, bucketed):
    """SELECT k, count(DISTINCT k) ... GROUP BY k is valid SQL and must not
    crash the pandas executor with a duplicated grouper."""
    got = {r["k"]: r["cd"] for r in catalog.sql(
        "SELECT k, count(DISTINCT k) AS cd FROM db.cd_buckets GROUP BY k"
    ).collect()}
    assert got == {k: 1 for k in range(10)}


def test_colocated_count_distinct_keeps_all_null_groups(catalog, bucketed):
    """Groups whose rows are NULL in every counted column must appear with
    count 0, matching SQL GROUP BY."""
    got = {r["k"]: r["cd"] for r in catalog.sql(
        "SELECT k, count(DISTINCT u) AS cd FROM db.cd_buckets GROUP BY k"
    ).collect()}
    # i%10 and i%4 are coupled mod 20: each non-null group sees exactly
    # the two values {u(k%4), u((k+2)%4)}
    want = {k: (0 if k == 3 else 2) for k in range(10)}
    assert got == want


def test_group_count_prefers_metadata_fold_on_bucketed_column(
        catalog, spark, monkeypatch):
    """A count-only GROUP BY on a histogram-covered bucketed column should
    answer from the histogram store (zero data I/O), not the co-located
    per-bucket read."""
    df = spark.createDataFrame([(i, i % 5) for i in range(2000)],
                               "id bigint, g bigint")
    sch = Schema.from_spark(df.schema)
    spec = PartitionSpec.builder_for(sch).bucket("g", 4).build()
    t = catalog.create_table("db.gc_hist", df, spec=spec)
    t.append(df)
    t = t.refresh()
    from linkedin_iceberg_spark.catalog.analyze import analyze_histogram
    analyze_histogram(t, "g")
    # poison the co-located route: if it runs, the test fails loudly
    from linkedin_iceberg_spark.catalog import colocated as CO

    def boom(*a, **kw):
        raise AssertionError("co-located route taken for a histogram-"
                             "covered count-only GROUP BY")

    monkeypatch.setattr(CO, "colocated_groupby", boom)
    got = {r["g"]: r["c"] for r in catalog.sql(
        "SELECT g, count(*) AS c FROM db.gc_hist GROUP BY g").collect()}
    assert got == {g: 400 for g in range(5)}
