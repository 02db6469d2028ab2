"""Round-7 ADVICE regressions:

1. MERGE three-valued logic — a clause condition that evaluates to NULL
   does not fire its clause, and in particular can never silently flip
   an UPDATE into a DELETE (row_delta.merge coalesces conditions).
2. MERGE first-matching-clause-wins ordering — when both UPDATE and
   DELETE matched clauses are present, the clause declared FIRST wins
   (the SQL route passes the parsed order through).
3. interval_join requires disjoint column names (a shared name would be
   ambiguous inner / silently NULLed left).
4. The DSv2 stream writer's abort deletes the staged files carried in
   the task messages (the runner builds a fresh writer per abort call,
   so the instance staging dir is never where the epoch wrote).
5. INSERT INTO ... SELECT without a column list binds POSITIONALLY
   (Spark/SQL ordinal semantics), never silently remapped by name.
6. create_table refuses a name an existing view holds (views shadow
   tables in Catalog.sql resolution).
"""

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- merge 3VL

def _mk_target(catalog, spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    t = catalog.create_table("db.advice_t", df)
    t.append(df)
    return t


def test_merge_null_delete_cond_updates_not_deletes(catalog, spark):
    """DELETE cond NULL + UPDATE cond true -> row must be UPDATED.

    Before the fix the affected-keys filter saw NULL|true=true (key
    deleted) while the re-append filter saw true & ~NULL = NULL (row
    dropped) — a silent delete."""
    t = _mk_target(catalog, spark, [(1, 10), (2, 20), (3, 30)])
    # s.flag is NULL for k=1/2, 1 for k=3 -> delete cond is NULL/NULL/true
    src = spark.createDataFrame([(1, None), (2, None), (3, 1)],
                                "k long, flag int")
    t.merge(src, key_cols=["k"],
            matched_delete_cond=F.col("s.flag") == 1,
            matched_update={"v": F.col("t.v") + 100},
            insert_unmatched=False)
    got = {r.k: r.v for r in t.to_df().collect()}
    assert got == {1: 110, 2: 120}  # 3 deleted; 1,2 updated NOT deleted


def test_merge_null_update_cond_does_not_fire(catalog, spark):
    t = _mk_target(catalog, spark, [(1, 10), (2, 20)])
    src = spark.createDataFrame([(1, None), (2, 5)], "k long, flag int")
    t.merge(src, key_cols=["k"],
            matched_update={"v": F.lit(-1)},
            matched_update_cond=F.col("s.flag") > 0,
            insert_unmatched=False)
    got = {r.k: r.v for r in t.to_df().collect()}
    assert got == {1: 10, 2: -1}  # NULL cond -> k=1 untouched


def test_merge_sql_update_first_wins_over_delete(catalog, spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t = catalog.create_table("db.ord_t", df)
    t.append(df)
    src = spark.createDataFrame([(1,), (2,)], "k long")
    src.createOrReplaceTempView("ord_src")
    catalog.sql("""
        MERGE INTO db.ord_t t USING ord_src s ON t.k = s.k
        WHEN MATCHED AND t.v > 15 THEN UPDATE SET v = t.v + 1
        WHEN MATCHED THEN DELETE
    """)
    got = {r.k: r.v for r in catalog.load_table("db.ord_t")
           .to_df().collect()}
    # UPDATE declared first: k=2 (cond true) updates; k=1 falls through
    # to the unconditioned DELETE
    assert got == {2: 21}


def test_merge_sql_delete_first_wins_over_update(catalog, spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t = catalog.create_table("db.ord_t2", df)
    t.append(df)
    src = spark.createDataFrame([(1,), (2,)], "k long")
    src.createOrReplaceTempView("ord_src2")
    catalog.sql("""
        MERGE INTO db.ord_t2 t USING ord_src2 s ON t.k = s.k
        WHEN MATCHED AND t.v > 15 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = t.v + 1
    """)
    got = {r.k: r.v for r in catalog.load_table("db.ord_t2")
           .to_df().collect()}
    assert got == {1: 11}  # k=2 deleted (first clause), k=1 updated


def test_merge_by_source_null_delete_cond_updates(catalog, spark):
    """NOT MATCHED BY SOURCE: NULL delete cond + update clause ->
    updated, not silently deleted (the exact ADVICE scenario)."""
    t = _mk_target(catalog, spark, [(1, 10), (2, None), (3, 30)])
    src = spark.createDataFrame([(3,)], "k long")  # 1,2 unmatched
    t.merge(src, key_cols=["k"],
            matched_update={"v": F.col("t.v")},  # no-op keep
            insert_unmatched=False,
            # NULL for k=2 (v is NULL): must NOT delete it
            unmatched_source_delete_cond=F.col("t.v") < 0,
            unmatched_source_update={"v": F.lit(99)})
    got = {r.k: r.v for r in t.to_df().collect()}
    assert got == {1: 99, 2: 99, 3: 30}


# ------------------------------------------------------ interval_join names

def test_interval_join_rejects_shared_column_names(spark):
    from linkedin_iceberg_spark.operators.joins import interval_join
    pts = spark.createDataFrame([(1, 5.0, "a")], "pid long, ts double, tag string")
    ivs = spark.createDataFrame([(10, 0.0, 9.0, "b")],
                                "iid long, lo double, hi double, tag string")
    with pytest.raises(ValueError, match="disjoint.*tag"):
        interval_join(pts, ivs, "ts", "lo", "hi", bucket_width=4.0)


# --------------------------------------------------------- stream abort leak

def test_stream_writer_abort_removes_staged_files(catalog, spark, tmp_path):
    """abort() must delete the staged paths from the task MESSAGES —
    the runner instantiates a fresh writer per abort call, so the
    instance's own staging dir is never where the epoch's tasks wrote."""
    from linkedin_iceberg_spark.sources.batch_source import (
        _FileCommit, _TableStreamWriter)
    df = spark.createDataFrame([(1,)], "a long")
    t = catalog.create_table("db.abort_t", df)
    # simulate a PRIOR writer instance's staged epoch output
    staged_dir = os.path.join(t.location, "data", "dsv2-deadbeef")
    os.makedirs(staged_dir)
    p1 = os.path.join(staged_dir, "part-1.parquet")
    p2 = os.path.join(staged_dir, "part-2.parquet")
    for p in (p1, p2):
        with open(p, "wb") as f:
            f.write(b"x")
    # a FRESH writer (new uuid staging dir, as the runner would build)
    w = _TableStreamWriter({"location": t.location})
    assert os.path.abspath(w.staging) != os.path.abspath(staged_dir)
    w.abort([_FileCommit([(p1, {}), (p2, {})]), None], batchId=7)
    assert not os.path.exists(p1) and not os.path.exists(p2)
    assert not os.path.exists(staged_dir)  # emptied dir swept too


# ------------------------------------------------------- INSERT positional

def test_insert_select_binds_positionally(catalog, spark):
    df = spark.createDataFrame([], "a long, b long")
    catalog.create_table("db.pos_t", df)
    # aliases match target names but REVERSED: SQL ordinal semantics
    # bind SELECT's first output to column a, second to b
    catalog.sql("INSERT INTO db.pos_t SELECT 2 AS b, 1 AS a")
    rows = catalog.load_table("db.pos_t").to_df().collect()
    assert [(r.a, r.b) for r in rows] == [(2, 1)]


def test_insert_explicit_column_list_still_positional_to_list(catalog, spark):
    df = spark.createDataFrame([], "a long, b long, c long")
    catalog.create_table("db.pos_t2", df)
    catalog.sql("INSERT INTO db.pos_t2 (b, a) SELECT 7, 8")
    rows = catalog.load_table("db.pos_t2").to_df().collect()
    assert [(r.a, r.b, r.c) for r in rows] == [(8, 7, None)]


def test_insert_static_partition_unaffected(catalog, spark):
    """The static PARTITION path name-binds internally (its frame is
    already target-named with partition columns appended last)."""
    catalog.sql("CREATE TABLE db.pos_t3 (a bigint, p string, b bigint) "
                "PARTITIONED BY (p)")
    catalog.sql("INSERT INTO db.pos_t3 PARTITION (p = 'x') VALUES (1, 2)")
    rows = catalog.load_table("db.pos_t3").to_df().collect()
    assert [(r.a, r.p, r.b) for r in rows] == [(1, "x", 2)]


# ------------------------------------------------------ create over a view

def test_create_table_over_view_raises(catalog, spark):
    from linkedin_iceberg_spark.catalog.catalog import AlreadyExistsError
    df = spark.createDataFrame([(1,)], "a long")
    t = catalog.create_table("db.base_v", df)
    t.append(df)
    catalog.create_view("db.shadow", "SELECT * FROM db.base_v")
    with pytest.raises(AlreadyExistsError, match="view"):
        catalog.create_table("db.shadow", df)
