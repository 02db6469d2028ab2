"""Regression tests for the round-3 code-review findings."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.streaming.sink import upsert_batch_idempotent


def test_drop_recreate_does_not_serve_stale_metadata(catalog, spark):
    """Process-wide metadata cache must be invalidated on drop: a
    recreated table restarts at v1 and would otherwise read the dropped
    table's schema."""
    df1 = spark.range(0, 10).select(F.col("id").alias("first_col"))
    t1 = catalog.create_table("db.recreate", df1)
    t1.append(df1)
    assert catalog.drop_table("db.recreate")
    df2 = spark.range(0, 5).select(F.col("id").alias("second_col"))
    t2 = catalog.create_table("db.recreate", df2)
    t2.append(df2)
    t2.refresh()
    assert t2.schema.column_names() == ["second_col"]
    assert catalog.load_table("db.recreate").schema.column_names() == \
        ["second_col"]


def test_upsert_version_guard_rejects_older_cross_batch(catalog, spark):
    """A late-arriving OLDER version in a later epoch must not overwrite
    the newer row the table already holds."""
    rows = spark.createDataFrame(
        [(1, 10, "new"), (2, 10, "n2")], "k long, v long, tag string")
    t = catalog.create_table("db.vguard", rows)
    upsert_batch_idempotent(t, rows, epoch_id=0, key_cols=["k"],
                            version_cols=["v"])
    late = spark.createDataFrame(
        [(1, 5, "old"), (3, 1, "fresh")], "k long, v long, tag string")
    upsert_batch_idempotent(t, late, epoch_id=1, key_cols=["k"],
                            version_cols=["v"])
    t.refresh()
    got = {r.k: (r.v, r.tag) for r in t.to_df().collect()}
    assert got[1] == (10, "new")    # older version dropped
    assert got[2] == (10, "n2")
    assert got[3] == (1, "fresh")   # new key inserted


def test_clustering_rewrite_covers_right_sized_files(catalog, spark,
                                                     sf_dir):
    """sort_by/zorder_by rewrites must re-sort files regardless of size —
    a right-sized file still has loose bounds until resorted."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    t = catalog.create_table("db.bigsort", o)
    t.append(o.orderBy(F.rand(seed=5)).repartition(2))
    # target of 1 byte: every live file is "right-sized" (>= target)
    res = t.rewrite_data_files(target_size_bytes=1, min_input_files=1,
                               sort_by=["o_orderkey"])
    assert res["rewritten_files"] == 2
    assert res["added_files"] >= 1
    assert t.to_df().count() == o.count()


def test_changelog_unknown_to_snapshot_raises(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(50)
    t = catalog.create_table("db.clerr", o)
    t.append(o)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.changes(to_snapshot_id=42)


def test_explicit_sort_rewrite_overrides_table_sort_property(
        catalog, spark, sf_dir):
    """A zorder/sort rewrite must not be re-sorted by write.sort-by."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    t = catalog.create_table(
        "db.zprop", o, properties={"write.sort-by": "o_totalprice"})
    t.append(o.coalesce(1))
    t.rewrite_data_files(target_size_bytes=1, min_input_files=1,
                         sort_by=["o_orderkey"])
    # one read job over ALL rewritten files (a per-file read+collect loop
    # was a Spark job + footer inference per tiny file — 169 s for the
    # same assertions); rows stream in in-file order within each task, so
    # grouping sequentially by _metadata.file_path preserves file order
    files = [task.file.file_path for task in t.new_scan().plan_files()]
    rows = (spark.read.parquet(*files)
            .select("o_orderkey",
                    F.col("_metadata.file_path").alias("_f")).collect())
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["_f"], []).append(r["o_orderkey"])
    assert len(by_file) == len(files)
    for vals in by_file.values():
        assert vals == sorted(vals)  # rewrite's order, not the property's


def test_changelog_after_parent_expiry_diffs_against_empty(catalog, spark,
                                                           sf_dir):
    """The oldest surviving snapshot's parent may be expired: its diff
    base is EMPTY (expired history collapses into it) — never the
    table's CURRENT state."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") < 300)
    t = catalog.create_table("db.clexp", o)
    t.append(o.filter(F.col("o_orderkey") < 100))
    t.append(o.filter((F.col("o_orderkey") >= 100)
                      & (F.col("o_orderkey") < 200)))
    t.append(o.filter(F.col("o_orderkey") >= 200))
    t.expire_snapshots(retain_last=2)
    t.refresh()
    ch = t.changes()
    rows = ch.collect()
    # every surviving row appears exactly once, as an insert
    assert all(r["_change_type"] == "insert" for r in rows)
    assert sorted(r.o_orderkey for r in rows) == \
        sorted(r.o_orderkey for r in o.collect())


def test_upsert_null_version_never_overwrites(catalog, spark):
    from linkedin_iceberg_spark.streaming.sink import upsert_batch_idempotent
    rows = spark.createDataFrame([(1, 10, "keep")],
                                 "k long, v long, tag string")
    t = catalog.create_table("db.vnull", rows)
    upsert_batch_idempotent(t, rows, epoch_id=0, key_cols=["k"],
                            version_cols=["v"])
    nulls = spark.createDataFrame([(1, None, "null-upd"), (2, None, "new")],
                                  "k long, v long, tag string")
    upsert_batch_idempotent(t, nulls, epoch_id=1, key_cols=["k"],
                            version_cols=["v"])
    t.refresh()
    got = {r.k: r.tag for r in t.to_df().collect()}
    assert got[1] == "keep"   # null version cannot overwrite
    assert got[2] == "new"    # but may insert a new key


def test_incremental_view_null_sums_do_not_poison(catalog, spark):
    from linkedin_iceberg_spark.catalog.incremental_view import (
        create_agg_view, refresh_agg_view)
    rows = spark.createDataFrame(
        [(1, "g", 100), (2, "g", None), (3, "h", 5)],
        "id long, grp string, v long")
    base = catalog.create_table("db.ivnull", rows)
    base.append(rows)
    aggs = {"sv": ("sum", "v"), "nv": ("count", "v")}
    view = create_agg_view(catalog, "db.ivnull_v", base, ["grp"], aggs)
    st = {r.grp: (r.n_rows, r.sv, r.nv) for r in view.to_df().collect()}
    assert st["g"] == (2, 100, 1)  # COUNT(v) skips the NULL
    # delete the NULL-valued row: sum must stay 100, not become NULL
    from linkedin_iceberg_spark.expressions import eq
    base.delete_where(eq("id", 2))
    refresh_agg_view(view, base, ["grp"], aggs)
    st = {r.grp: (r.n_rows, r.sv, r.nv) for r in view.to_df().collect()}
    assert st["g"] == (1, 100, 1)
    # insert a NULL-valued row into an existing group
    base.append(spark.createDataFrame([(9, "h", None)],
                                      "id long, grp string, v long"))
    refresh_agg_view(view, base, ["grp"], aggs)
    st = {r.grp: (r.n_rows, r.sv, r.nv) for r in view.to_df().collect()}
    assert st["h"] == (2, 5, 1)


def test_resize_null_payload_keeps_meta(spark, sf_dir):
    from linkedin_iceberg_spark.operators.multimodal import (
        attach_payload, resize_image)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    d = d.withColumn("text", F.when(F.col("doc_id") % 2 == 0,
                                    F.col("text")))
    out = resize_image(attach_payload(d, "text", name="img"), name="img",
                       width=8, height=4)
    for r in out.select("doc_id", "img", "img_meta").collect():
        if r.doc_id % 2 == 0:
            assert len(r.img) == 32 and r.img_meta.width == 8
        else:
            assert r.img is None
            assert r.img_meta.width is None  # meta untouched for NULLs
