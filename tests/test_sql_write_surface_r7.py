"""Round-7 SQL write/DDL surface: plain CREATE TABLE (cols), INSERT
INTO ... VALUES, INSERT OVERWRITE routed by table shape, MERGE INSERT
(cols) VALUES / UPDATE SET *, and the namespace/introspection
statements (ref: spark3/src/test/.../sql/TestCreateTable.java:54,99,
TestPartitionedWrites.java:62,77, TestNamespaceSQL.java shapes)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.orders", orders).append(orders)
    return catalog


# -- plain CREATE TABLE --------------------------------------------------

def test_create_table_columns(cat):
    out = cat.sql(
        "CREATE TABLE db.items (id BIGINT NOT NULL, name STRING, "
        "price DECIMAL(10,2), ts TIMESTAMP)").collect()[0]
    assert out["operation"] == "create_table"
    t = cat.load_table("db.items")
    assert [f.name for f in t.schema.fields] == \
        ["id", "name", "price", "ts"]
    assert t.schema.fields[0].required is True
    assert t.schema.fields[1].required is False
    assert t.schema.fields[2].type == "decimal(10,2)"
    # fresh sequential field ids
    assert [f.field_id for f in t.schema.fields] == [1, 2, 3, 4]


def test_create_table_partitioned_and_props(cat):
    cat.sql(
        "CREATE TABLE db.ev (id BIGINT, cat STRING, ts TIMESTAMP) "
        "USING iceberg PARTITIONED BY (month(ts), bucket(4, id)) "
        "TBLPROPERTIES ('write.format'='parquet', 'owner'='r7')")
    t = cat.load_table("db.ev")
    specs = [(f.transform_str, f.source_name) for f in t.spec.fields]
    assert specs == [("month", "ts"), ("bucket[4]", "id")]
    assert t.properties["owner"] == "r7"


def test_create_table_if_not_exists(cat):
    cat.sql("CREATE TABLE db.x (a INT)")
    out = cat.sql("CREATE TABLE IF NOT EXISTS db.x (a INT)").collect()[0]
    assert "skipped" in out["detail"]
    with pytest.raises(Exception):
        cat.sql("CREATE TABLE db.x (a INT)")


def test_create_table_comment_and_malformed(cat):
    cat.sql("CREATE TABLE db.c (a INT COMMENT 'the ''a'' column')")
    t = cat.load_table("db.c")
    assert t.schema.fields[0].doc == "the 'a' column"
    with pytest.raises(ValueError):
        cat.sql("CREATE TABLE db.bad (a)")


# -- INSERT INTO ... VALUES ----------------------------------------------

def test_insert_values(cat):
    cat.sql("CREATE TABLE db.kv (k BIGINT, v STRING)")
    out = cat.sql(
        "INSERT INTO db.kv VALUES (1, 'a'), (2, 'b'), (3, NULL)"
    ).collect()[0]
    assert (out["operation"], out["rows_affected"]) == ("insert", 3)
    rows = sorted(cat.sql("SELECT * FROM db.kv").collect())
    assert [(r["k"], r["v"]) for r in rows] == \
        [(1, "a"), (2, "b"), (3, None)]


def test_insert_values_column_list_fills_nulls(cat):
    cat.sql("CREATE TABLE db.kv3 (k BIGINT, v STRING, w DOUBLE)")
    cat.sql("INSERT INTO db.kv3 (v, k) VALUES ('z', 9)")
    r = cat.sql("SELECT * FROM db.kv3").collect()[0]
    assert (r["k"], r["v"], r["w"]) == (9, "z", None)
    with pytest.raises(ValueError):
        cat.sql("INSERT INTO db.kv3 (nope) VALUES (1)")
    with pytest.raises(ValueError):
        cat.sql("INSERT INTO db.kv3 (k, v) VALUES (1)")


def test_insert_values_casts_to_target_types(cat):
    cat.sql("CREATE TABLE db.typed (k BIGINT, p DECIMAL(10,2))")
    cat.sql("INSERT INTO db.typed VALUES (1, 2.5)")
    f = dict(cat.load_table("db.typed").to_df().dtypes)
    assert f == {"k": "bigint", "p": "decimal(10,2)"}


def test_insert_select_still_works(cat):
    cat.sql("CREATE TABLE db.top (o_orderkey BIGINT, "
            "o_totalprice DOUBLE)")
    out = cat.sql(
        "INSERT INTO db.top SELECT o_orderkey, o_totalprice "
        "FROM db.orders WHERE o_orderkey < 100").collect()[0]
    assert out["operation"] == "insert"
    n = cat.sql("SELECT count(*) AS n FROM db.top").collect()[0]["n"]
    assert n == out["rows_affected"] and n > 0


# -- INSERT OVERWRITE ----------------------------------------------------

def test_insert_overwrite_unpartitioned_full_replace(cat):
    cat.sql("CREATE TABLE db.fw (k BIGINT, v STRING)")
    cat.sql("INSERT INTO db.fw VALUES (1, 'old'), (2, 'old')")
    out = cat.sql(
        "INSERT OVERWRITE db.fw VALUES (7, 'new')").collect()[0]
    assert out["operation"] == "insert_overwrite"
    rows = cat.sql("SELECT * FROM db.fw").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(7, "new")]
    t = cat.load_table("db.fw")
    assert t.metadata.current_snapshot.operation == "overwrite"


def test_insert_overwrite_partitioned_is_dynamic(cat):
    cat.sql("CREATE TABLE db.pw (k BIGINT, part STRING) "
            "PARTITIONED BY (part)")
    cat.sql("INSERT INTO db.pw VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    # overwrite ONLY partition 'a'; partition 'b' must survive
    cat.sql("INSERT OVERWRITE db.pw VALUES (9, 'a')")
    rows = sorted((r["k"], r["part"])
                  for r in cat.sql("SELECT * FROM db.pw").collect())
    assert rows == [(3, "b"), (9, "a")]


def test_insert_overwrite_select(cat):
    cat.sql("CREATE TABLE db.ow (o_orderkey BIGINT, o_custkey BIGINT)")
    cat.sql("INSERT INTO db.ow VALUES (999999999, 0)")
    cat.sql("INSERT OVERWRITE TABLE db.ow "
            "SELECT o_orderkey, o_custkey FROM db.orders "
            "WHERE o_orderkey < 50")
    df = cat.load_table("db.ow").to_df()
    assert df.filter(F.col("o_orderkey") == 999999999).count() == 0
    want = cat.sql("SELECT count(*) AS n FROM db.orders "
                   "WHERE o_orderkey < 50").collect()[0]["n"]
    assert df.count() == want


# -- MERGE grammar width -------------------------------------------------

def test_merge_insert_column_list_values(cat, spark):
    cat.sql("CREATE TABLE db.m (k BIGINT, v STRING, n BIGINT)")
    cat.sql("INSERT INTO db.m VALUES (1, 'one', 10)")
    spark.createDataFrame([(1, "ONE"), (2, "TWO")],
                          "k bigint, txt string") \
        .createOrReplaceTempView("msrc")
    cat.sql(
        "MERGE INTO db.m t USING msrc s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.txt "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, lower(s.txt))")
    rows = sorted((r["k"], r["v"], r["n"])
                  for r in cat.load_table("db.m").to_df().collect())
    assert rows == [(1, "ONE", 10), (2, "two", None)]


def test_merge_update_set_star(cat, spark):
    cat.sql("CREATE TABLE db.m2 (k BIGINT, v STRING)")
    cat.sql("INSERT INTO db.m2 VALUES (1, 'old'), (2, 'keep')")
    spark.createDataFrame([(1, "new")], "k bigint, v string") \
        .createOrReplaceTempView("m2src")
    cat.sql("MERGE INTO db.m2 t USING m2src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET *")
    rows = sorted((r["k"], r["v"])
                  for r in cat.load_table("db.m2").to_df().collect())
    assert rows == [(1, "new"), (2, "keep")]


def test_merge_insert_values_count_mismatch_raises(cat, spark):
    cat.sql("CREATE TABLE db.m3 (k BIGINT, v STRING)")
    spark.createDataFrame([(1, "x")], "k bigint, v string") \
        .createOrReplaceTempView("m3src")
    with pytest.raises(ValueError, match="columns"):
        cat.sql("MERGE INTO db.m3 t USING m3src s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)")


# -- namespaces / introspection ------------------------------------------

def test_show_tables_and_namespaces(cat):
    cat.sql("CREATE TABLE db.extra (a INT)")
    rows = {(r["namespace"], r["tableName"])
            for r in cat.sql("SHOW TABLES").collect()}
    assert ("db", "orders") in rows and ("db", "extra") in rows
    in_db = {r["tableName"]
             for r in cat.sql("SHOW TABLES IN db").collect()}
    assert {"orders", "extra"} <= in_db
    ns = {r["namespace"] for r in cat.sql("SHOW NAMESPACES").collect()}
    assert "db" in ns


def test_create_drop_namespace(cat):
    cat.sql("CREATE NAMESPACE staging")
    ns = {r["namespace"] for r in cat.sql("SHOW NAMESPACES").collect()}
    assert "staging" in ns
    out = cat.sql("CREATE NAMESPACE IF NOT EXISTS staging").collect()[0]
    assert "skipped" in out["detail"]
    with pytest.raises(Exception):
        cat.sql("CREATE NAMESPACE staging")
    # non-empty namespace refuses the drop
    with pytest.raises(ValueError, match="not empty"):
        cat.sql("DROP NAMESPACE db")
    cat.sql("DROP NAMESPACE staging")
    ns = {r["namespace"] for r in cat.sql("SHOW NAMESPACES").collect()}
    assert "staging" not in ns
    out = cat.sql("DROP NAMESPACE IF EXISTS staging").collect()[0]
    assert "skipped" in out["detail"]


def test_describe_table(cat):
    cat.sql("CREATE TABLE db.d (id BIGINT NOT NULL, s STRING "
            "COMMENT 'note', ts TIMESTAMP) PARTITIONED BY (day(ts)) "
            "TBLPROPERTIES ('k'='v')")
    plain = cat.sql("DESCRIBE db.d").collect()
    assert [(r["col_name"], r["data_type"]) for r in plain] == \
        [("id", "long"), ("s", "string"), ("ts", "timestamp")]
    assert plain[1]["comment"] == "note"
    ext = {r["col_name"]: r["data_type"]
           for r in cat.sql("DESCRIBE EXTENDED db.d").collect()}
    assert ext["Part 0"] == "day(ts)"
    assert ext["prop:k"] == "v"
    assert "Location" in ext and "Current Snapshot" in ext


# -- SELECT count(*) metadata pushdown -----------------------------------

def test_sql_count_star_metadata_path(cat, spark, monkeypatch):
    # full-table count: must short-circuit to manifest record counts —
    # poison the slow path to prove no data files are read
    from linkedin_iceberg_spark.catalog import scan as scan_mod
    t = cat.load_table("db.orders")
    want = t.to_df().count()

    called = []
    orig = scan_mod.TableScan._to_df_default

    def spy(self, tasks=None):
        called.append(len(tasks) if tasks is not None else -1)
        return orig(self, tasks=tasks)
    monkeypatch.setattr(scan_mod.TableScan, "_to_df_default", spy)
    n = cat.sql("SELECT count(*) AS n FROM db.orders").collect()[0]["n"]
    assert n == want
    assert called == []  # zero data-file input

    # filtered count matches the generic route's answer
    got = cat.sql("SELECT count(*) AS n FROM db.orders "
                  "WHERE o_orderkey < 500").collect()[0]["n"]
    assert got == t.to_df().filter(F.col("o_orderkey") < 500).count()


def test_sql_count_star_falls_back_on_unprovable(cat):
    # an expression conjunct cannot be pushed — the generic Spark route
    # must answer (and still be correct)
    t = cat.load_table("db.orders")
    got = cat.sql("SELECT count(*) AS n FROM db.orders "
                  "WHERE o_orderkey % 2 = 0").collect()[0]["n"]
    assert got == t.to_df().filter("o_orderkey % 2 = 0").count()
    # spark-default column name when no alias is given
    row = cat.sql("SELECT count(*) FROM db.orders").collect()[0]
    assert row["count(1)"] == t.to_df().count()


# -- MERGE ... WHEN NOT MATCHED BY SOURCE --------------------------------

def test_merge_not_matched_by_source_delete(cat, spark):
    cat.sql("CREATE TABLE db.sync (k BIGINT, v STRING)")
    cat.sql("INSERT INTO db.sync VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.createDataFrame([(1, "A"), (4, "D")], "k bigint, v string") \
        .createOrReplaceTempView("sync_src")
    # full-sync shape: update matches, insert new, drop rows the source
    # no longer carries
    cat.sql("MERGE INTO db.sync t USING sync_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    rows = sorted((r["k"], r["v"])
                  for r in cat.load_table("db.sync").to_df().collect())
    assert rows == [(1, "A"), (4, "D")]


def test_merge_not_matched_by_source_update(cat, spark):
    cat.sql("CREATE TABLE db.flagged (k BIGINT, v STRING, "
            "stale BOOLEAN)")
    cat.sql("INSERT INTO db.flagged VALUES (1,'a',false), "
            "(2,'b',false), (3,'c',false)")
    spark.createDataFrame([(2,)], "k bigint") \
        .createOrReplaceTempView("flag_src")
    cat.sql("MERGE INTO db.flagged t USING flag_src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE AND t.k > 1 "
            "THEN UPDATE SET stale = true")
    rows = sorted((r["k"], r["v"], r["stale"])
                  for r in cat.load_table("db.flagged").to_df().collect())
    # k=1 unmatched but fails the condition; k=2 matched; k=3 flagged
    assert rows == [(1, "a", False), (2, "b", False), (3, "c", True)]


def test_merge_by_source_conditional_delete_and_insert(cat, spark):
    cat.sql("CREATE TABLE db.mix (k BIGINT, v STRING)")
    cat.sql("INSERT INTO db.mix VALUES (1,'keep'), (2,'drop'), "
            "(3,'keep')")
    spark.createDataFrame([(9, "new")], "k bigint, v string") \
        .createOrReplaceTempView("mix_src")
    cat.sql("MERGE INTO db.mix t USING mix_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE AND t.v = 'drop' THEN DELETE")
    rows = sorted((r["k"], r["v"])
                  for r in cat.load_table("db.mix").to_df().collect())
    assert rows == [(1, "keep"), (3, "keep"), (9, "new")]


def test_merge_by_source_set_star_raises(cat, spark):
    cat.sql("CREATE TABLE db.ss (k BIGINT, v STRING)")
    spark.createDataFrame([(1, "x")], "k bigint, v string") \
        .createOrReplaceTempView("ss_src")
    with pytest.raises(ValueError, match="meaningless"):
        cat.sql("MERGE INTO db.ss t USING ss_src s ON t.k = s.k "
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")


# -- TRUNCATE / static PARTITION / SHOW PARTITIONS / SHOW CREATE ---------

def test_truncate_table(cat):
    cat.sql("CREATE TABLE db.tr (k BIGINT)")
    cat.sql("INSERT INTO db.tr VALUES (1), (2), (3)")
    out = cat.sql("TRUNCATE TABLE db.tr").collect()[0]
    assert (out["operation"], out["rows_affected"]) == ("truncate", 3)
    assert cat.sql("SELECT count(*) AS n FROM db.tr").collect()[0]["n"] == 0
    # metadata-only: the truncate snapshot is a delete
    t = cat.load_table("db.tr")
    assert t.metadata.current_snapshot.operation == "delete"


def test_insert_static_partition(cat):
    cat.sql("CREATE TABLE db.sp (k BIGINT, part STRING) "
            "PARTITIONED BY (part)")
    cat.sql("INSERT INTO db.sp PARTITION (part='a') VALUES (1), (2)")
    cat.sql("INSERT INTO db.sp PARTITION (part='b') VALUES (3)")
    rows = sorted((r["k"], r["part"])
                  for r in cat.load_table("db.sp").to_df().collect())
    assert rows == [(1, "a"), (2, "a"), (3, "b")]
    # static OVERWRITE replaces exactly the named partition
    cat.sql("INSERT OVERWRITE db.sp PARTITION (part='a') VALUES (9)")
    rows = sorted((r["k"], r["part"])
                  for r in cat.load_table("db.sp").to_df().collect())
    assert rows == [(3, "b"), (9, "a")]


def test_insert_static_partition_rejects_non_identity(cat):
    cat.sql("CREATE TABLE db.spb (k BIGINT, ts TIMESTAMP) "
            "PARTITIONED BY (month(ts))")
    with pytest.raises(ValueError, match="identity"):
        cat.sql("INSERT INTO db.spb PARTITION (ts='2024-01-01') "
                "VALUES (1)")


def test_show_partitions(cat):
    cat.sql("CREATE TABLE db.shp (k BIGINT, part STRING) "
            "PARTITIONED BY (part)")
    cat.sql("INSERT INTO db.shp VALUES (1,'a'), (2,'a'), (3,'b')")
    rows = cat.sql("SHOW PARTITIONS db.shp").collect()
    by_part = {r["partition"]: r["record_count"] for r in rows}
    assert len(by_part) == 2 and sum(by_part.values()) == 3
    assert any("a" in k for k in by_part) and \
        any("b" in k for k in by_part)


def test_show_create_table_round_trips(cat):
    cat.sql("CREATE TABLE db.sct (id BIGINT NOT NULL, "
            "v STRING COMMENT 'the ''v''', amt DECIMAL(10,2), "
            "ts TIMESTAMP) "
            "PARTITIONED BY (month(ts), bucket(4, id)) "
            "TBLPROPERTIES ('owner'='r7')")
    stmt = cat.sql("SHOW CREATE TABLE db.sct").collect()[0][
        "createtab_stmt"]
    assert "PARTITIONED BY (month(ts), bucket(4, id))" in stmt
    assert "'owner'='r7'" in stmt
    # the emitted DDL parses back through our own CREATE TABLE route
    cat.sql(stmt.replace("db.sct", "db.sct2"))
    a, b = cat.load_table("db.sct"), cat.load_table("db.sct2")
    assert [(f.name, f.type, f.required, f.doc)
            for f in a.schema.fields] == \
        [(f.name, f.type, f.required, f.doc) for f in b.schema.fields]
    assert [(f.transform_str, f.source_name) for f in a.spec.fields] == \
        [(f.transform_str, f.source_name) for f in b.spec.fields]
    assert b.properties.get("owner") == "r7"


def test_delete_and_update_without_where(cat):
    cat.sql("CREATE TABLE db.all1 (k BIGINT, v STRING)")
    cat.sql("INSERT INTO db.all1 VALUES (1,'a'), (2,'b')")
    out = cat.sql("UPDATE db.all1 SET v = upper(v)").collect()[0]
    assert (out["operation"], out["rows_affected"]) == ("update", 2)
    rows = sorted((r["k"], r["v"])
                  for r in cat.load_table("db.all1").to_df().collect())
    assert rows == [(1, "A"), (2, "B")]
    out = cat.sql("DELETE FROM db.all1").collect()[0]
    assert (out["operation"], out["rows_affected"]) == ("delete", 2)
    assert cat.load_table("db.all1").to_df().count() == 0
    # a literal containing 'where' never splits the SET clause
    cat.sql("INSERT INTO db.all1 VALUES (5, 'x')")
    cat.sql("UPDATE db.all1 SET v = 'where it was'")
    assert cat.load_table("db.all1").to_df().collect()[0]["v"] == \
        "where it was"


def test_sql_min_max_pushdown(cat, spark):
    t = cat.load_table("db.orders")
    df = t.to_df()
    want = df.agg(F.min("o_orderkey"), F.max("o_orderkey"),
                  F.min("o_orderdate"), F.max("o_orderdate"),
                  F.count("*")).head()
    row = cat.sql(
        "SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi, "
        "min(o_orderdate) AS dlo, max(o_orderdate) AS dhi, "
        "count(*) AS n FROM db.orders").collect()[0]
    assert (row["lo"], row["hi"], row["n"]) == \
        (want[0], want[1], want[4])
    assert (row["dlo"], row["dhi"]) == (want[2], want[3])
    # filtered: min/max under a pushable predicate still exact
    row = cat.sql("SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi "
                  "FROM db.orders WHERE o_orderkey >= 100 AND "
                  "o_orderkey < 500").collect()[0]
    assert (row["lo"], row["hi"]) == (100, 499)
    # non-aggregate select list falls through to the generic route
    assert cat.sql("SELECT min(o_orderkey) AS lo, o_custkey "
                   "FROM db.orders GROUP BY o_custkey").count() > 0


def test_sql_min_max_default_names_match_spark(cat):
    got = cat.sql("SELECT min(o_orderkey), max(o_orderkey) "
                  "FROM db.orders")
    assert got.columns == ["min(o_orderkey)", "max(o_orderkey)"]


# -- ALTER COLUMN width (ref: TestAlterTable.java:117-199) ---------------

def test_alter_column_comment_nullability_position(cat):
    cat.sql("CREATE TABLE db.ac (a INT, b STRING, c DOUBLE)")
    cat.sql("ALTER TABLE db.ac ALTER COLUMN b COMMENT 'the ''b'''")
    t = cat.load_table("db.ac")
    assert t.schema.find_field("b").doc == "the 'b'"
    cat.sql("ALTER TABLE db.ac ALTER COLUMN a SET NOT NULL")
    cat.sql("ALTER TABLE db.ac ALTER COLUMN a DROP NOT NULL")
    t = cat.load_table("db.ac")
    assert t.schema.find_field("a").required is False
    cat.sql("ALTER TABLE db.ac ALTER COLUMN c FIRST")
    t = cat.load_table("db.ac")
    assert [f.name for f in t.schema.fields] == ["c", "a", "b"]
    cat.sql("ALTER TABLE db.ac ALTER COLUMN c AFTER a")
    t = cat.load_table("db.ac")
    assert [f.name for f in t.schema.fields] == ["a", "c", "b"]


def test_unset_tblproperties(cat):
    cat.sql("CREATE TABLE db.up (a INT) TBLPROPERTIES "
            "('x'='1', 'y'='2')")
    cat.sql("ALTER TABLE db.up UNSET TBLPROPERTIES ('x', 'zzz')")
    t = cat.load_table("db.up")
    assert "x" not in t.properties and t.properties.get("y") == "2"


def test_append_extra_snapshot_metadata(cat, spark):
    # ref: spark/.../TestDataSourceOptions.java:369 — the
    # snapshot-property.* write-option plane
    kv = spark.createDataFrame([(1, "a")], "k bigint, v string")
    t = cat.create_table("db.meta1", kv)
    t.append(kv, extra_summary={"extra-key": "someValue",
                                "another-key": "anotherValue"})
    summ = t.metadata.current_snapshot.summary
    assert summ["extra-key"] == "someValue"
    assert summ["another-key"] == "anotherValue"
    # and they are visible through the snapshots metadata relation
    row = cat.sql("SELECT summary FROM db.meta1.snapshots").collect()[0]
    assert "extra-key" in str(row["summary"])


def test_create_table_like(cat):
    cat.sql("CREATE TABLE db.proto (id BIGINT NOT NULL, cat STRING, "
            "ts TIMESTAMP) PARTITIONED BY (month(ts), cat) "
            "TBLPROPERTIES ('write.sort-by'='id', 'owner'='x')")
    cat.sql("CREATE TABLE db.copy LIKE db.proto")
    a, b = cat.load_table("db.proto"), cat.load_table("db.copy")
    assert [(f.name, f.type, f.required) for f in a.schema.fields] == \
        [(f.name, f.type, f.required) for f in b.schema.fields]
    assert [(f.transform_str, f.source_name) for f in a.spec.fields] == \
        [(f.transform_str, f.source_name) for f in b.spec.fields]
    assert b.properties.get("write.sort-by") == "id"
    assert b.to_df().count() == 0  # no data transfers
    out = cat.sql("CREATE TABLE IF NOT EXISTS db.copy LIKE db.proto"
                  ).collect()[0]
    assert "skipped" in out["detail"]


def test_show_tblproperties(cat):
    cat.sql("CREATE TABLE db.stp (a INT) TBLPROPERTIES "
            "('p1'='v1', 'p2'='v2')")
    rows = {r["key"]: r["value"]
            for r in cat.sql("SHOW TBLPROPERTIES db.stp").collect()}
    assert rows.get("p1") == "v1" and rows.get("p2") == "v2"
    one = cat.sql("SHOW TBLPROPERTIES db.stp ('p1')").collect()
    assert [(r["key"], r["value"]) for r in one] == [("p1", "v1")]
    missing = cat.sql("SHOW TBLPROPERTIES db.stp ('zz')").collect()[0]
    assert "does not have property" in missing["value"]
