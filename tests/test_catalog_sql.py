"""Catalog.sql: raw SQL over engine tables with auto-registration —
dotted identifiers in FROM/JOIN resolve in the catalog, including
db.t.<metadata> relations (ref: the reference Spark integration's
catalog resolution, spark3/.../SparkCatalog.java:122)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    catalog.create_table("db.orders", orders).append(orders)
    catalog.create_table("db.nation", nation).append(nation)
    return catalog


def test_sql_from_engine_table(cat, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    got = cat.sql(
        "SELECT o_orderpriority, count(*) AS n FROM db.orders "
        "GROUP BY o_orderpriority").collect()
    want = orders.groupBy("o_orderpriority").count().collect()
    assert {(r["o_orderpriority"], r["n"]) for r in got} == \
        {(r["o_orderpriority"], r["count"]) for r in want}


def test_sql_join_two_engine_tables(cat):
    n = cat.sql(
        "SELECT count(*) AS n FROM db.orders o JOIN db.nation "
        "ON o.o_custkey % 25 = db.nation.n_nationkey").collect()[0]["n"]
    assert n == cat.load_table("db.orders").to_df().count()


def test_sql_metadata_relation(cat):
    rows = cat.sql(
        "SELECT snapshot_id, operation FROM db.orders.snapshots").collect()
    assert len(rows) == 1 and rows[0]["operation"] == "append"
    # files relation joins like any other table
    nf = cat.sql("SELECT count(*) AS n FROM db.orders.files").collect()
    assert nf[0]["n"] >= 1


def test_sql_sees_deletes_and_current_snapshot(cat, spark):
    t = cat.load_table("db.orders")
    before = cat.sql("SELECT count(*) AS n FROM db.orders").collect()[0]["n"]
    keys = spark.createDataFrame([(k,) for k in range(0, 30)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    gone = t.to_df().filter(F.col("o_orderkey") < 30).count()
    assert gone == 0
    after = cat.sql("SELECT count(*) AS n FROM db.orders").collect()[0]["n"]
    assert after < before


def test_sql_leaves_unknown_identifiers_alone(cat, spark):
    spark.range(5).selectExpr("id AS x").createOrReplaceTempView("plainv")
    # a plain view name and a non-catalog dotted function call survive
    got = cat.sql("SELECT sum(x) AS s FROM plainv").collect()[0]["s"]
    assert got == 10
    with pytest.raises(Exception):
        cat.sql("SELECT * FROM no.such.table")


def test_sql_comma_join_and_alias(cat):
    n = cat.sql(
        "SELECT count(*) AS n FROM db.orders o, db.nation nn "
        "WHERE o.o_custkey % 25 = nn.n_nationkey").collect()[0]["n"]
    assert n == cat.load_table("db.orders").to_df().count()


def test_sql_time_travel_version_and_ref(cat, spark, sf_dir):
    t = cat.load_table("db.orders")
    n1 = t.to_df().count()
    sid1 = t.metadata.current_snapshot_id
    t.create_tag("v1")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t.append(orders.limit(25))

    cur = cat.sql("SELECT count(*) AS n FROM db.orders").collect()[0]["n"]
    assert cur == n1 + 25
    by_tag = cat.sql("SELECT count(*) AS n FROM db.orders "
                     "VERSION AS OF 'v1'").collect()[0]["n"]
    by_id = cat.sql(f"SELECT count(*) AS n FROM db.orders "
                    f"VERSION AS OF {sid1}").collect()[0]["n"]
    sysv = cat.sql(f"SELECT count(*) AS n FROM db.orders "
                   f"FOR SYSTEM_VERSION AS OF {sid1}").collect()[0]["n"]
    assert by_tag == by_id == sysv == n1


def test_sql_time_travel_timestamp(cat, spark, sf_dir):
    import datetime
    import time

    t = cat.load_table("db.orders")
    n1 = t.to_df().count()
    # the as-of plane resolves against the snapshot LOG's commit times
    ts_log = t.metadata.snapshot_log[-1]["timestamp-ms"]
    time.sleep(1.2)  # give the string form (1 s resolution) a clean gap
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t.append(orders.limit(25))

    by_ms = cat.sql(f"SELECT count(*) AS n FROM db.orders "
                    f"TIMESTAMP AS OF {ts_log}").collect()[0]["n"]
    assert by_ms == n1
    s = datetime.datetime.fromtimestamp(
        ts_log / 1000 + 1, datetime.timezone.utc) \
        .strftime("%Y-%m-%d %H:%M:%S")
    by_str = cat.sql(f"SELECT count(*) AS n FROM db.orders "
                     f"FOR SYSTEM_TIME AS OF '{s}'").collect()[0]["n"]
    assert by_str == n1


# -- DML routing ------------------------------------------------------------

def test_sql_insert_into(cat, spark, sf_dir):
    t = cat.load_table("db.orders")
    before = t.to_df().count()
    st = cat.sql("INSERT INTO db.orders "
                 "SELECT * FROM db.orders WHERE o_orderkey < 20").collect()[0]
    assert st["operation"] == "insert"
    assert st["rows_affected"] == "20" or int(st["rows_affected"]) == 20
    t.refresh()
    assert t.to_df().count() == before + 20


def test_sql_delete_where(cat):
    t = cat.load_table("db.orders")
    before = t.to_df().count()
    n_low = t.to_df().filter("o_orderkey < 30").count()
    st = cat.sql("DELETE FROM db.orders WHERE o_orderkey < 30").collect()[0]
    assert st["operation"] == "delete"
    assert int(st["rows_affected"]) == n_low
    t.refresh()
    assert t.to_df().count() == before - n_low
    assert t.to_df().filter("o_orderkey < 30").count() == 0


def test_sql_update_where(cat, spark):
    t = cat.load_table("db.orders")
    want = {r["o_orderkey"]: round(r["o_totalprice"] * 2, 4)
            for r in t.to_df().filter("o_orderkey < 10").collect()}
    st = cat.sql("UPDATE db.orders "
                 "SET o_totalprice = round(o_totalprice * 2, 4), "
                 "    o_orderpriority = 'BUMPED' "
                 "WHERE o_orderkey < 10").collect()[0]
    assert st["operation"] == "update"
    assert int(st["rows_affected"]) == len(want)
    t.refresh()
    got = t.to_df().filter("o_orderkey < 10").collect()
    assert {r["o_orderkey"]: round(r["o_totalprice"], 4)
            for r in got} == want
    assert all(r["o_orderpriority"] == "BUMPED" for r in got)
    # untouched rows keep their priority values
    assert t.to_df().filter("o_orderkey >= 10 AND "
                            "o_orderpriority = 'BUMPED'").count() == 0


def test_sql_where_pushdown_plans_fewer_files(catalog, spark, sf_dir):
    """The trip-wire for r6's SQL-path predicate pushdown: a selective
    WHERE over a partitioned engine table must reach scan planning —
    the query's input files are strictly fewer than the table's live
    files — while answering exactly."""
    from linkedin_iceberg_spark import PartitionSpec, Schema

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.po", orders, spec=spec)
    t.append(orders)
    n_live = len(t._live_data_and_deletes()[0])
    df = catalog.sql(
        "SELECT o_orderkey, o_totalprice FROM db.po "
        "WHERE o_orderdate >= TIMESTAMP '1997-06-01' "
        "  AND o_orderpriority = '1-URGENT' ORDER BY o_orderkey")
    got = [(r.o_orderkey, round(r.o_totalprice, 2)) for r in df.collect()]
    want = [(r.o_orderkey, round(r.o_totalprice, 2)) for r in
            orders.filter((F.col("o_orderdate") >= "1997-06-01")
                          & (F.col("o_orderpriority") == "1-URGENT"))
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey").collect()]
    assert got == want
    assert 0 < len(df.inputFiles()) < n_live


def test_sql_pushdown_bails_safely(catalog, spark, sf_dir):
    """Every bail path answers exactly: function conjunct (partial
    extraction), subquery, self-join, OR across tables."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bo", orders)
    t.append(orders)
    n = catalog.sql(
        "SELECT count(*) AS n FROM db.bo "
        "WHERE round(o_totalprice) > 100 AND o_orderkey < 50") \
        .collect()[0]["n"]
    assert n == orders.filter((F.round("o_totalprice") > 100)
                              & (F.col("o_orderkey") < 50)).count()
    n2 = catalog.sql(
        "SELECT count(*) AS n FROM db.bo a JOIN db.bo b "
        "ON a.o_orderkey = b.o_orderkey WHERE a.o_orderkey < 20") \
        .collect()[0]["n"]
    assert n2 == orders.filter(F.col("o_orderkey") < 20).count()
    n3 = catalog.sql(
        "SELECT count(*) AS n FROM db.bo WHERE o_orderkey IN "
        "(SELECT o_orderkey FROM db.bo WHERE o_orderkey < 5)") \
        .collect()[0]["n"]
    assert n3 == orders.filter(F.col("o_orderkey") < 5).count()


def test_sql_literal_masking(cat, spark, sf_dir):
    """A table name inside a string literal or comment is never
    rewritten (and never triggers pushdown misparses)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = cat.sql("SELECT count(*) AS n FROM db.orders "
                "WHERE o_orderpriority <> 'db.orders'").collect()[0]["n"]
    assert n == orders.count()
    n2 = cat.sql("SELECT count(*) AS n FROM db.orders "
                 "-- comment mentions db.orders and a ' quote\n"
                 "WHERE o_orderkey >= 0").collect()[0]["n"]
    assert n2 == orders.count()


def test_sql_delete_counts_rows_already_shadowed_once(catalog, spark,
                                                      sf_dir):
    """ADVICE r6: DELETE's rows_affected must not double-count rows that
    pre-existing delete files already shadowed in the rewritten files."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.dc", orders)
    t.append(orders)
    # shadow some rows with row-level deletes first (RowDelta path)
    from linkedin_iceberg_spark.catalog.row_delta import upsert
    hit = orders.filter(F.col("o_orderkey") < 40)
    upsert(t, hit.withColumn("o_orderpriority", F.lit("X")),
           ["o_orderkey"])
    t.refresh()
    visible = t.to_df().filter("o_orderkey < 100").count()
    st = catalog.sql("DELETE FROM db.dc WHERE o_orderkey < 100") \
        .collect()[0]
    assert int(st["rows_affected"]) == visible
    t.refresh()
    assert t.to_df().filter("o_orderkey < 100").count() == 0


def test_sql_merge_into(catalog, spark, sf_dir):
    """MERGE INTO routes to the RowDelta merge operator: conditional
    update + delete + insert in ONE snapshot (r6)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .filter(F.col("o_orderkey") < 400)
    t = catalog.create_table("db.msql", orders)
    t.append(orders)
    src = orders.filter(F.col("o_orderkey") < 120) \
        .withColumn("o_orderkey",
                    F.when(F.col("o_orderkey") < 60,
                           F.col("o_orderkey"))
                    .otherwise(F.col("o_orderkey") + 1_000_000)) \
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 4))
    src.createOrReplaceTempView("msql_src")

    st = catalog.sql("""
        MERGE INTO db.msql AS t USING msql_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_orderpriority = '1-URGENT' THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *
    """).collect()[0]
    assert st["operation"] == "merge"
    t.refresh()
    got = {r.o_orderkey: round(r.o_totalprice, 4)
           for r in t.to_df().collect()}
    # matched urgent rows deleted
    urgent = {r.o_orderkey for r in
              orders.filter((F.col("o_orderkey") < 60)
                            & (F.col("o_orderpriority") == "1-URGENT"))
              .collect()}
    assert urgent and not (urgent & set(got))
    # matched non-urgent rows doubled
    doubled = {r.o_orderkey: round(r.o_totalprice * 2, 4)
               for r in orders.filter((F.col("o_orderkey") < 60)
                                      & (F.col("o_orderpriority")
                                         != "1-URGENT")).collect()}
    assert all(got[k] == v for k, v in doubled.items())
    # unmatched source rows inserted
    assert all(k + 1_000_000 in got for k in range(60, 120)
               if k in {r.o_orderkey for r in orders.collect()})
    # untouched rows intact
    base = {r.o_orderkey: round(r.o_totalprice, 4)
            for r in orders.filter(F.col("o_orderkey") >= 120).collect()}
    assert all(got[k] == v for k, v in base.items())
    assert int(st["rows_affected"]) > 0


def test_sql_merge_rejects_unsupported_shapes(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.msql2", orders)
    t.append(orders.limit(10))
    spark.range(5).withColumnRenamed("id", "o_orderkey") \
        .createOrReplaceTempView("msql_src2")
    with pytest.raises(ValueError, match="equi-conjunction"):
        catalog.sql("MERGE INTO db.msql2 t USING msql_src2 s "
                    "ON t.o_orderkey > s.o_orderkey "
                    "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="INSERT"):
        catalog.sql("MERGE INTO db.msql2 t USING msql_src2 s "
                    "ON t.o_orderkey = s.o_orderkey "
                    "WHEN NOT MATCHED THEN UPDATE SET x = 1")


def test_sql_ddl_ctas_alter_drop(catalog, spark, sf_dir):
    """The DDL surface: CTAS/RTAS, ADD/DROP/RENAME/promote column, SET
    TBLPROPERTIES, DROP TABLE — all through Catalog.sql, all via the
    evolution plane (field ids preserved) (r6)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.dsrc", orders).append(orders)

    st = catalog.sql("CREATE TABLE db.dtab AS "
                     "SELECT o_orderkey, o_totalprice FROM db.dsrc "
                     "WHERE o_orderkey < 100").collect()[0]
    assert st["operation"] == "create_table"
    t = catalog.load_table("db.dtab")
    assert t.to_df().count() == orders.filter("o_orderkey < 100").count()

    catalog.sql("ALTER TABLE db.dtab ADD COLUMNS note STRING, "
                "cents BIGINT")
    t.refresh()
    assert {"note", "cents"} <= set(t.schema.column_names())
    # new columns read as NULL on pre-evolution rows
    assert t.to_df().filter("note IS NOT NULL").count() == 0

    catalog.sql("ALTER TABLE db.dtab RENAME COLUMN note TO remark")
    catalog.sql("ALTER TABLE db.dtab DROP COLUMN cents")
    t.refresh()
    cols = set(t.schema.column_names())
    assert "remark" in cols and "note" not in cols and "cents" not in cols

    # int -> long promotion via SQL (build a table with an int col)
    small = spark.range(5).selectExpr("CAST(id AS INT) AS k")
    catalog.create_table("db.dprom", small).append(small)
    catalog.sql("ALTER TABLE db.dprom ALTER COLUMN k TYPE BIGINT")
    tp = catalog.load_table("db.dprom")
    assert dict(tp.to_df().dtypes)["k"] == "bigint"
    assert tp.to_df().count() == 5

    catalog.sql("ALTER TABLE db.dtab SET TBLPROPERTIES "
                "('owner'='data-eng', 'note'='it''s fine')")
    t.refresh()
    assert t.properties["owner"] == "data-eng"
    assert t.properties["note"] == "it's fine"

    # RTAS preserves identity + history, swaps contents atomically
    st = catalog.sql("CREATE OR REPLACE TABLE db.dtab AS "
                     "SELECT o_orderkey FROM db.dsrc "
                     "WHERE o_orderkey >= 100 AND o_orderkey < 150") \
        .collect()[0]
    assert st["operation"] == "create_table"
    t.refresh()
    assert t.to_df().columns == ["o_orderkey"]

    st = catalog.sql("DROP TABLE db.dtab").collect()[0]
    assert st["detail"] == "dropped=True"
    assert not catalog.table_exists("db.dtab")
    st = catalog.sql("DROP TABLE IF EXISTS db.dtab").collect()[0]
    assert "skipped" in st["detail"]


def test_sql_call_procedures(catalog, spark, sf_dir):
    """CALL routes to the maintenance/snapshot actions (r6): compaction,
    manifest rewrite, snapshot expiry, rollback, analyze."""
    import json

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.proc", orders)
    t.append(orders.filter(F.col("o_orderkey") < 500))
    t.append(orders.filter(F.col("o_orderkey") >= 500))
    before = t.to_df().count()

    st = catalog.sql("CALL rewrite_data_files('db.proc')").collect()[0]
    assert st["operation"] == "rewrite_data_files"
    assert json.loads(st["detail"])["rewritten_files"] >= 2
    t.refresh()
    assert t.to_df().count() == before

    keep_id = t.metadata.current_snapshot_id
    st = catalog.sql("CALL expire_snapshots('db.proc')").collect()[0]
    t.refresh()
    assert t.metadata.current_snapshot_id == keep_id

    st = catalog.sql(
        f"CALL rollback_to_snapshot('db.proc', {keep_id})").collect()[0]
    assert json.loads(st["detail"])["current_snapshot_id"] == keep_id

    st = catalog.sql(
        "CALL analyze_table('db.proc', 'o_orderkey,o_custkey')"
    ).collect()[0]
    out = json.loads(st["detail"])
    assert set(out) == {"o_orderkey", "o_custkey"}

    # the KMV and dictionary stats planes, SQL-reachable (r8): after the
    # CALLs, approx_count_distinct is store-served and eq prunes files
    st = catalog.sql(
        "CALL analyze_kmv('db.proc', 'o_custkey')").collect()[0]
    assert json.loads(st["detail"])["o_custkey"] >= 1
    got = catalog.sql("SELECT approx_count_distinct(o_custkey) AS v "
                      "FROM db.proc").collect()[0]["v"]
    t.refresh()
    assert got == t.new_scan().approx_ndv("o_custkey")
    # a non-default k lands in its own store partition (k is identity)
    st = catalog.sql(
        "CALL analyze_kmv('db.proc', 'o_custkey', k => 64)").collect()[0]
    assert json.loads(st["detail"])["o_custkey"] >= 1
    st = catalog.sql(
        "CALL analyze_dictionary('db.proc', 'o_orderpriority')"
    ).collect()[0]
    assert json.loads(st["detail"])["files_analyzed"] >= 1

    with pytest.raises(ValueError, match="unknown procedure"):
        catalog.sql("CALL no_such_thing('db.proc')")


def test_sql_travel_pushdown(catalog, spark, sf_dir):
    """WHERE conjuncts prune time-travel scans too: a selective query
    over VERSION AS OF plans fewer files than the tagged state holds."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import lt

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.tvp", orders, spec=spec)
    t.append(orders)
    t.create_tag("v1")
    n_at_tag = len(t._live_data_and_deletes()[0])
    t.delete_where(lt("o_orderkey", 10**9))  # current state is empty

    df = catalog.sql(
        "SELECT o_orderkey FROM db.tvp VERSION AS OF 'v1' "
        "WHERE o_orderdate >= TIMESTAMP '1997-06-01' ORDER BY o_orderkey")
    got = [r.o_orderkey for r in df.collect()]
    want = [r.o_orderkey for r in
            orders.filter(F.col("o_orderdate") >= "1997-06-01")
            .select("o_orderkey").orderBy("o_orderkey").collect()]
    assert got == want
    assert 0 < len(df.inputFiles()) < n_at_tag


def test_sql_ddl_partitioned_ctas_and_spec_evolution(catalog, spark,
                                                     sf_dir):
    """CTAS with PARTITIONED BY creates hidden partitioning that the
    SQL-path pushdown then prunes on; ADD/DROP PARTITION FIELD evolve
    the spec while old files stay scannable (r6)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.psrc", orders).append(orders)
    catalog.sql("CREATE TABLE db.ptab PARTITIONED BY (month(o_orderdate)) "
                "AS SELECT * FROM db.psrc")
    t = catalog.load_table("db.ptab")
    assert [f.transform_str for f in t.metadata.spec.fields] == ["month"]
    n_live = len(t._live_data_and_deletes()[0])
    df = catalog.sql("SELECT o_orderkey FROM db.ptab "
                     "WHERE o_orderdate >= TIMESTAMP '1997-06-01'")
    assert df.count() == orders.filter(
        F.col("o_orderdate") >= "1997-06-01").count()
    assert 0 < len(df.inputFiles()) < n_live

    catalog.sql("ALTER TABLE db.ptab ADD PARTITION FIELD "
                "bucket(4, o_custkey)")
    t.refresh()
    assert [f.transform_str for f in t.metadata.spec.fields] == \
        ["month", "bucket[4]"]
    # new writes cluster under the evolved spec; old files still scan
    more = orders.withColumn("o_orderkey",
                             F.col("o_orderkey") + 5_000_000)
    t.append(more)
    assert t.to_df().count() == 2 * orders.count()

    catalog.sql("ALTER TABLE db.ptab DROP PARTITION FIELD "
                "bucket(4, o_custkey)")
    t.refresh()
    assert [f.transform_str for f in t.metadata.spec.fields] == ["month"]
    with pytest.raises(ValueError, match="no partition field"):
        catalog.sql("ALTER TABLE db.ptab DROP PARTITION FIELD nope")


def test_sql_changes_relation(catalog, spark, sf_dir):
    """db.t.changes resolves as a metadata relation: full-history CDC
    rows queryable in SQL, joinable against db.t.snapshots (r6)."""
    from linkedin_iceberg_spark.expressions import lt

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .filter(F.col("o_orderkey") < 300)
    t = catalog.create_table("db.cdcq", orders)
    t.append(orders)
    t.delete_where(lt("o_orderkey", 100))
    got = {(r.ct, r.n) for r in catalog.sql(
        "SELECT _change_type AS ct, count(*) AS n FROM db.cdcq.changes "
        "GROUP BY _change_type").collect()}
    n_all = orders.count()
    n_del = orders.filter("o_orderkey < 100").count()
    assert got == {("insert", n_all), ("delete", n_del)}
    # joins against the snapshots relation resolve in the same query
    ops = {r.operation for r in catalog.sql(
        "SELECT DISTINCT s.operation FROM db.cdcq.changes c "
        "JOIN db.cdcq.snapshots s ON c._commit_snapshot_id = s.snapshot_id"
    ).collect()}
    assert ops == {"append", "delete"}


def test_sql_pushdown_equivalence_sweep(catalog, spark, sf_dir):
    """Equivalence sweep for the WHERE extractor: every clause shape —
    pushable, partially pushable, and unpushable — must answer exactly
    what plain Spark SQL answers on the same rows (the pushdown's
    soundness contract: pruning may only ever remove non-matching
    FILES, never rows)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    from linkedin_iceberg_spark import PartitionSpec, Schema
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.sweep", orders, spec=spec)
    t.append(orders)
    orders.createOrReplaceTempView("sweep_raw")

    clauses = [
        "o_orderkey = 7",
        "o_orderkey != 7 AND o_orderkey < 40",
        "o_orderkey >= 100 AND o_orderkey <= 140",
        "o_orderkey BETWEEN 50 AND 90",
        "o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey < 200",
        "o_orderpriority NOT IN ('1-URGENT') AND o_orderkey < 120",
        "o_orderpriority IS NOT NULL AND o_orderkey < 60",
        "o_orderpriority LIKE '1-%' AND o_orderkey < 300",
        "(o_orderkey < 30 OR o_orderkey > 1400) AND o_totalprice > 0",
        "NOT (o_orderkey >= 25) AND o_orderpriority <> 'none'",
        "o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderkey < 500",
        "o_orderdate >= TIMESTAMP '1996-06-01' "
        "AND o_orderdate < TIMESTAMP '1997-06-01'",
        # partially pushable: function conjunct stays Spark-side
        "round(o_totalprice) > 1000 AND o_orderkey < 250",
        "length(o_orderpriority) > 3 AND o_orderkey BETWEEN 10 AND 400",
        # unpushable entirely
        "o_totalprice > o_orderkey",
        "o_orderkey % 7 = 0",
        # literal containing keywords / quotes
        "o_orderpriority <> 'WHERE AND FROM db.sweep' AND o_orderkey < 80",
        "o_orderpriority <> 'it''s' AND o_orderkey < 95",
    ]
    for cl in clauses:
        got = sorted(r.o_orderkey for r in catalog.sql(
            f"SELECT o_orderkey FROM db.sweep WHERE {cl}").collect())
        want = sorted(r.o_orderkey for r in spark.sql(
            f"SELECT o_orderkey FROM sweep_raw WHERE {cl}").collect())
        assert got == want, f"mismatch for WHERE {cl!r}"


def test_sql_branch_tag_ddl(cat, spark, sf_dir):
    """ALTER TABLE ... CREATE/REPLACE/DROP BRANCH|TAG — the snapshot-ref
    DDL of the Spark SQL extensions, routed to the table's ref plane
    (create_tag/create_branch/drop_*) (r7)."""
    t = cat.load_table("db.orders")
    n0 = t.to_df().count()
    sid0 = t.metadata.current_snapshot_id

    st = cat.sql("ALTER TABLE db.orders CREATE TAG v1").collect()[0]
    assert st["detail"] == "tag_created=v1"
    extra = spark.read.parquet(
        os.path.join(sf_dir, "orders.parquet")).limit(7)
    t.append(extra)
    t.refresh()
    assert t.new_scan().use_ref("v1").to_df().count() == n0
    assert t.to_df().count() == n0 + 7

    # IF NOT EXISTS on an existing tag: no-op, no error
    st = cat.sql("ALTER TABLE db.orders CREATE TAG IF NOT EXISTS v1"
                 ).collect()[0]
    assert st["detail"] == "tag_exists=v1"
    # bare CREATE on an existing tag raises
    with pytest.raises(ValueError):
        cat.sql("ALTER TABLE db.orders CREATE TAG v1")
    # REPLACE needs AS OF VERSION
    with pytest.raises(ValueError, match="AS OF VERSION"):
        cat.sql("ALTER TABLE db.orders REPLACE TAG v1")

    sid1 = t.metadata.current_snapshot_id
    st = cat.sql(f"ALTER TABLE db.orders CREATE OR REPLACE TAG v1 "
                 f"AS OF VERSION {sid1} RETAIN 30 DAYS").collect()[0]
    assert st["detail"] == "tag_replaced=v1"
    t.refresh()
    assert t.new_scan().use_ref("v1").to_df().count() == n0 + 7
    # tags live in refs with no ref_types row (branches only there)
    assert "v1" in t.metadata.refs
    assert t.metadata.ref_types.get("v1") != "branch"

    # branches: create at the OLD snapshot, write to it, then REPLACE
    # resets the head
    st = cat.sql(f"ALTER TABLE db.orders CREATE BRANCH audit "
                 f"AS OF VERSION {sid0} RETAIN 2 HOURS").collect()[0]
    assert st["detail"] == "branch_created=audit"
    t.refresh()
    assert t.metadata.ref_types["audit"] == "branch"
    assert t.new_scan().use_ref("audit").to_df().count() == n0
    t.branch("audit").append(extra.limit(3))
    t.refresh()
    assert t.new_scan().use_ref("audit").to_df().count() == n0 + 3
    st = cat.sql(f"ALTER TABLE db.orders CREATE OR REPLACE BRANCH "
                 f"audit AS OF VERSION {sid1}").collect()[0]
    assert st["detail"] == "branch_replaced=audit"
    t.refresh()
    assert t.new_scan().use_ref("audit").to_df().count() == n0 + 7

    # kind mismatch is refused (a tag cannot be dropped as a branch)
    with pytest.raises(ValueError):
        cat.sql("ALTER TABLE db.orders DROP BRANCH v1")
    st = cat.sql("ALTER TABLE db.orders DROP TAG v1").collect()[0]
    assert st["detail"] == "tag_dropped=v1"
    st = cat.sql("ALTER TABLE db.orders DROP BRANCH audit").collect()[0]
    assert st["detail"] == "branch_dropped=audit"
    t.refresh()
    assert "v1" not in t.metadata.refs and "audit" not in t.metadata.refs
    # IF EXISTS on absent refs: no-op
    assert cat.sql("ALTER TABLE db.orders DROP TAG IF EXISTS v1"
                   ).collect()[0]["detail"] == "tag_absent=v1"
    assert cat.sql("ALTER TABLE db.orders DROP BRANCH IF EXISTS nope"
                   ).collect()[0]["detail"] == "branch_absent=nope"


def test_sql_call_snapshot_lineage_procs(catalog, spark, sf_dir):
    """The r7 procedure additions: rollback_to_timestamp,
    set_current_snapshot, publish_changes (WAP), ancestors_of (rows),
    add_files, migrate, snapshot — each routed to its engine action."""
    import json
    import tempfile

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.proc2", orders)
    t.append(orders.limit(50))
    sid1 = t.metadata.current_snapshot_id
    ts1 = t.metadata.current_snapshot.timestamp_ms
    t.append(orders.limit(10))
    sid2 = t.metadata.current_snapshot_id

    # ancestors_of returns the lineage as ROWS, newest first
    anc = catalog.sql("CALL ancestors_of('db.proc2')").collect()
    assert [r.snapshot_id for r in anc] == [sid2, sid1]
    anc1 = catalog.sql(
        f"CALL ancestors_of('db.proc2', {sid1})").collect()
    assert [r.snapshot_id for r in anc1] == [sid1]

    st = catalog.sql(
        f"CALL rollback_to_timestamp('db.proc2', {ts1})").collect()[0]
    assert json.loads(st.detail)["current_snapshot_id"] == sid1
    st = catalog.sql(
        f"CALL set_current_snapshot('db.proc2', {sid2})").collect()[0]
    assert json.loads(st.detail)["current_snapshot_id"] == sid2

    # WAP: stage under wap.id, then publish via CALL
    t.refresh()
    t.append(orders.limit(5), wap_id="audit9")
    t.refresh()
    n_before = t.to_df().count()
    assert "audit9" in t.metadata.staged_wap
    st = catalog.sql(
        "CALL publish_changes('db.proc2', 'audit9')").collect()[0]
    d = json.loads(st.detail)
    assert d["published_snapshot_id"] == t.metadata.staged_wap["audit9"]
    t.refresh()
    assert t.to_df().count() == n_before + 5
    with pytest.raises(ValueError, match="no staged snapshot"):
        catalog.sql("CALL publish_changes('db.proc2', 'nope')")

    # add_files: import a raw parquet directory into the table
    src = tempfile.mkdtemp(prefix="addfiles_")
    orders.limit(7).write.mode("overwrite").parquet(src)
    st = catalog.sql(
        f"CALL add_files('db.proc2', '{src}')").collect()[0]
    assert json.loads(st.detail)["added_files_count"] >= 1
    t.refresh()
    assert t.to_df().count() == n_before + 5 + 7

    # migrate: adopt a bare parquet dir as a brand-new table
    src2 = tempfile.mkdtemp(prefix="migrate_")
    orders.limit(9).write.mode("overwrite").parquet(src2)
    st = catalog.sql(f"CALL migrate('db.mig2', '{src2}')").collect()[0]
    assert json.loads(st.detail)["migrated_files_count"] >= 1
    assert catalog.load_table("db.mig2").to_df().count() == 9

    # snapshot: zero-copy clone of an existing engine table
    st = catalog.sql(
        "CALL snapshot('db.proc2', 'db.proc2_snap')").collect()[0]
    assert json.loads(st.detail)["imported_files_count"] >= 1
    assert catalog.load_table("db.proc2_snap").to_df().count() == \
        t.to_df().count()


def test_sql_add_column_full_grammar(catalog):
    """The reference's TestAlterTable ADD COLUMN shapes (r7): struct
    types with NOT NULL fields, AFTER/FIRST positions, nested adds with
    COMMENT, and the NOT-NULL-column rejection
    (TestAlterTable.java:60,65,78)."""
    from linkedin_iceberg_spark.schema import StructTypeDef

    catalog.sql("CREATE TABLE db.nt (id BIGINT NOT NULL, data STRING) "
                "USING iceberg")
    t = catalog.load_table("db.nt")
    assert t.schema.fields[0].required
    assert not t.schema.fields[1].required

    catalog.sql("ALTER TABLE db.nt ADD COLUMN point "
                "struct<x: double NOT NULL, y: double NOT NULL> "
                "AFTER id")
    t.refresh()
    names = t.schema.column_names()
    assert names == ["id", "point", "data"]
    point = t.schema.fields[1]
    assert not point.required            # the column itself is optional
    assert isinstance(point.type, StructTypeDef)
    assert [(f.name, f.type, f.required) for f in point.type.fields] \
        == [("x", "double", True), ("y", "double", True)]

    catalog.sql("ALTER TABLE db.nt ADD COLUMN point.z double "
                "COMMENT 'May be null' FIRST")
    t.refresh()
    zf = t.schema.fields[1].type.fields[0]
    assert zf.name == "z" and zf.doc == "May be null" and not zf.required

    with pytest.raises(ValueError, match="required column"):
        catalog.sql("ALTER TABLE db.nt ADD COLUMN c3 INT NOT NULL")

    # unique nested ids: highest id covers every nested field
    ids = []

    def walk(fields):
        for f in fields:
            ids.append(f.field_id)
            if isinstance(f.type, StructTypeDef):
                walk(f.type.fields)
    walk(t.schema.fields)
    assert len(ids) == len(set(ids))


def test_sql_create_table_compound_types(catalog, spark):
    catalog.sql("CREATE TABLE db.ct ("
                "id BIGINT NOT NULL, "
                "tags array<string>, "
                "attrs map<string, bigint>, "
                "pts array<struct<x: double, y: double NOT NULL>>, "
                "meta struct<k: string COMMENT 'key', n: int>"
                ") USING iceberg")
    t = catalog.load_table("db.ct")
    from linkedin_iceberg_spark.schema import (ListTypeDef, MapTypeDef,
                                               StructTypeDef)
    by = {f.name: f for f in t.schema.fields}
    assert isinstance(by["tags"].type, ListTypeDef)
    assert by["tags"].type.element == "string"
    assert isinstance(by["attrs"].type, MapTypeDef)
    assert (by["attrs"].type.key, by["attrs"].type.value) \
        == ("string", "long")
    inner = by["pts"].type.element
    assert isinstance(inner, StructTypeDef)
    assert inner.fields[1].required and not inner.fields[0].required
    assert by["meta"].type.fields[0].doc == "key"
    # the schema round-trips to Spark and accepts a matching write
    rows = spark.createDataFrame(
        [(1, ["a"], {"k": 2}, [(1.0, 2.0)], ("s", 3))],
        t.schema.to_spark())
    t.append(rows)
    got = t.to_df().collect()[0]
    assert got.id == 1 and got.tags == ["a"] and got.attrs == {"k": 2}
    assert got.pts[0].y == 2.0 and got.meta.n == 3


def test_sql_create_table_comment_and_location(catalog, spark, tmp_path):
    """CREATE TABLE ... COMMENT 'Table doc' LOCATION '...' (ref:
    TestCreateTable.java testCreateTableComment/testCreateTableLocation):
    comment lands in properties, the physical dir is the pinned one, and
    the logical name keeps resolving through catalog.json."""
    loc = str(tmp_path / "custom_spot")
    catalog.sql(f"CREATE TABLE db.cl (id BIGINT, data STRING) "
                f"USING iceberg COMMENT 'Table doc' LOCATION '{loc}'")
    t = catalog.load_table("db.cl")
    assert t.properties.get("comment") == "Table doc"
    assert os.path.isdir(os.path.join(loc, "metadata"))
    catalog.sql("INSERT INTO db.cl VALUES (1, 'a'), (2, 'b')")
    t.refresh()
    assert t.to_df().count() == 2
    # every data file lives under the pinned location
    for e in t._live_data_and_deletes()[0]:
        assert e.data_file.file_path.startswith(os.path.abspath(loc))
    assert catalog.drop_table("db.cl")
    assert not catalog.table_exists("db.cl")


def test_sql_call_named_arguments(catalog, spark, sf_dir):
    """CALL with the procedure syntax's named arguments (k => v),
    interchangeable with positional and mixable after them (r7)."""
    import json

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.np", orders)
    t.append(orders.limit(30))
    sid1 = t.metadata.current_snapshot_id
    t.append(orders.limit(10))
    sid2 = t.metadata.current_snapshot_id

    st = catalog.sql("CALL rollback_to_snapshot(table => 'db.np', "
                     f"snapshot_id => {sid1})").collect()[0]
    assert json.loads(st.detail)["current_snapshot_id"] == sid1
    # mixed: positional table + named rest
    st = catalog.sql(f"CALL set_current_snapshot('db.np', "
                     f"snapshot_id => {sid2})").collect()[0]
    assert json.loads(st.detail)["current_snapshot_id"] == sid2
    # named in declaration order regardless of spelling order
    anc = catalog.sql(f"CALL ancestors_of(snapshot_id => {sid1}, "
                      "table => 'db.np')").collect()
    assert [r.snapshot_id for r in anc] == [sid1]

    with pytest.raises(ValueError, match="unknown argument"):
        catalog.sql("CALL rollback_to_snapshot(table => 'db.np', "
                    "nope => 3)")
    with pytest.raises(ValueError, match="must cover"):
        catalog.sql("CALL rollback_to_snapshot(snapshot_id => 3)")
    with pytest.raises(ValueError, match="positional CALL argument"):
        catalog.sql(f"CALL rollback_to_snapshot(table => 'db.np', {sid1})")


def test_sql_delete_where_in_subquery(cat, spark):
    """DELETE ... WHERE col IN (SELECT ...) routes to an equality-delete
    RowDelta (no copy-on-write), keys may come from any engine table
    including the target itself (r7)."""
    t = cat.load_table("db.orders")
    before = t.to_df().count()
    want_gone = t.to_df().filter(
        "o_orderpriority = '1-URGENT' AND o_orderkey < 200").count()
    st = cat.sql(
        "DELETE FROM db.orders WHERE o_orderkey IN "
        "(SELECT o_orderkey FROM db.orders "
        " WHERE o_orderpriority = '1-URGENT' AND o_orderkey < 200)"
    ).collect()[0]
    assert st["operation"] == "delete"
    assert int(st["rows_affected"]) == want_gone
    t.refresh()
    assert t.to_df().count() == before - want_gone
    assert t.to_df().filter(
        "o_orderpriority = '1-URGENT' AND o_orderkey < 200").count() == 0
    # the commit is a RowDelta (delete files), not a rewrite
    assert t.metadata.current_snapshot.summary.get(
        "added-delete-files", "0") != "0"
    # keys from ANOTHER table
    n_nat = cat.sql(
        "DELETE FROM db.orders WHERE o_custkey IN "
        "(SELECT n_nationkey FROM db.nation WHERE n_nationkey < 5)"
    ).collect()[0]
    t.refresh()
    assert t.to_df().filter("o_custkey < 5").count() == 0
    with pytest.raises(ValueError, match="not a column"):
        cat.sql("DELETE FROM db.orders WHERE nope IN "
                "(SELECT n_nationkey FROM db.nation)")


def test_sql_update_where_in_subquery(cat, spark):
    """UPDATE ... WHERE col IN (SELECT ...) routes through MERGE
    (matched-update only, one RowDelta commit) (r7)."""
    t = cat.load_table("db.orders")
    want = {r.o_orderkey: round(r.o_totalprice * 3, 4) for r in
            t.to_df().filter("o_custkey < 10 AND o_orderkey < 500")
            .collect()}
    st = cat.sql(
        "UPDATE db.orders SET o_totalprice = round(o_totalprice * 3, 4) "
        "WHERE o_orderkey IN (SELECT o_orderkey FROM db.orders "
        "  WHERE o_custkey < 10 AND o_orderkey < 500)").collect()[0]
    assert st["operation"] == "update"
    assert int(st["rows_affected"]) == len(want)
    t.refresh()
    got = {r.o_orderkey: round(r.o_totalprice, 4) for r in
           t.to_df().filter("o_custkey < 10 AND o_orderkey < 500")
           .collect()}
    assert got == want
    with pytest.raises(ValueError, match="not a column"):
        cat.sql("UPDATE db.orders SET o_totalprice = 0 WHERE zz IN "
                "(SELECT n_nationkey FROM db.nation)")


def test_sql_call_optimize(catalog, spark, sf_dir):
    """CALL optimize: the maintenance composite — small-file compaction,
    pos-delete fold, dangling-delete drop, manifest rewrite — leaves
    identical rows in fewer files (r7)."""
    import json

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.opt", orders)
    for i in range(4):
        t.append(orders.limit(100))
    entries, _ = t._live_data_and_deletes()
    pos = spark.createDataFrame(
        [(entries[0].data_file.file_path, i) for i in range(5)],
        "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    before_rows = sorted(map(tuple, t.to_df().collect()))
    n_files = len(entries)

    st = catalog.sql("CALL optimize('db.opt')").collect()[0]
    d = json.loads(st.detail)
    assert set(d) == {"rewrite_data_files", "rewrite_position_deletes",
                      "remove_dangling_deletes", "rewrite_manifests"}
    t.refresh()
    data, dels = t._live_data_and_deletes()
    assert len(data) < n_files
    assert not dels  # the pos-delete backlog folded away
    assert sorted(map(tuple, t.to_df().collect())) == before_rows


def test_sql_merge_using_subquery(cat, spark):
    """MERGE INTO ... USING (SELECT ...) s: the subquery evaluates
    through the full SQL path (engine tables resolve) and merges as a
    normal source (r7)."""
    t = cat.load_table("db.orders")
    hot = t.to_df().filter("o_custkey < 8 AND o_orderkey < 400")
    want = {r.o_orderkey: round(r.o_totalprice * 2, 4)
            for r in hot.collect()}
    st = cat.sql(
        "MERGE INTO db.orders t USING ("
        "  SELECT o_orderkey AS o_orderkey, o_totalprice AS newp"
        "  FROM db.orders WHERE o_custkey < 8 AND o_orderkey < 400"
        ") s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET "
        "o_totalprice = round(s.newp * 2, 4)").collect()[0]
    assert st["operation"] == "merge"
    t.refresh()
    got = {r.o_orderkey: round(r.o_totalprice, 4)
           for r in t.to_df().filter(
               "o_custkey < 8 AND o_orderkey < 400").collect()}
    assert got == want
    with pytest.raises(ValueError, match="SELECT/WITH subquery"):
        cat.sql("MERGE INTO db.orders t USING (42) s "
                "ON t.o_orderkey = s.o_orderkey "
                "WHEN MATCHED THEN DELETE")


def test_sql_call_expire_retain_last(catalog, spark, sf_dir):
    import json

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.exp", orders)
    for _ in range(5):
        t.append(orders.limit(10))
    assert len(t.metadata.snapshots) == 5
    st = catalog.sql(
        "CALL expire_snapshots(table => 'db.exp', "
        f"older_than => {t.metadata.current_snapshot.timestamp_ms + 1}, "
        "retain_last => 3)").collect()[0]
    t.refresh()
    assert len(t.metadata.snapshots) == 3
    assert json.loads(st.detail)["expired_snapshots"] == 2


def test_sql_explain(cat):
    """EXPLAIN [FORMATTED|EXTENDED] SELECT resolves engine tables
    through the full path and returns the plan as rows — the SQL-path
    pushdown is VISIBLE in the output (r7)."""
    rows = cat.sql("EXPLAIN SELECT o_orderkey FROM db.orders "
                   "WHERE o_orderkey < 50").collect()
    txt = "\n".join(r.plan for r in rows)
    assert "Physical Plan" in txt and "Scan" in txt
    ext = cat.sql("EXPLAIN EXTENDED SELECT count(*) AS n "
                  "FROM db.orders o JOIN db.nation "
                  "ON o.o_custkey % 25 = db.nation.n_nationkey").collect()
    etxt = "\n".join(r.plan for r in ext)
    assert "Analyzed Logical Plan" in etxt
    # non-SELECT statements are untouched by the EXPLAIN route
    st = cat.sql("SHOW TABLES").collect()
    assert st  # still works


def test_sql_metadata_broadcast_hint(catalog, spark, sf_dir):
    """Multi-table SQL marks sides whose PRUNED scan bytes fit the
    session broadcast threshold - the estimateStatistics analog - so
    the first plan is a BroadcastHashJoin, not an AQE afterthought.
    Oversized sides (threshold shrunk to 1 byte) get no hint."""
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    catalog.create_table("db.big", o).append(o)
    catalog.create_table("db.tiny", n).append(n)
    q = ("SELECT o.o_orderkey, t.n_name FROM db.big o "
         "JOIN db.tiny t ON o.o_custkey % 25 = t.n_nationkey")
    df = catalog.sql(q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() == o.join(
        n, o.o_custkey % 25 == n.n_nationkey).count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        plan2 = catalog.sql(q)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sql_optimize_and_vacuum(catalog, spark, sf_dir):
    import json as _json
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.opt", o)
    t.append(o.filter(F.col("o_orderkey") < 500).repartition(3))
    t.append(o.filter(F.col("o_orderkey") >= 500).repartition(3))
    before = t.to_df().count()
    st = catalog.sql("OPTIMIZE db.opt").head()
    out = _json.loads(st["detail"])
    assert out["rewritten_files"] >= 2 and out["commits"] == 1
    t.refresh()
    assert t.to_df().count() == before
    # ZORDER BY re-clusters even right-sized files
    st = catalog.sql(
        "OPTIMIZE db.opt ZORDER BY (o_custkey, o_orderkey)").head()
    assert _json.loads(st["detail"])["rewritten_files"] >= 1
    t.refresh()
    assert t.to_df().count() == before
    # VACUUM expires the rewrite history and removes orphans
    st = catalog.sql("VACUUM db.opt RETAIN 0 HOURS").head()
    out = _json.loads(st["detail"])
    assert "expire_snapshots" in out and "remove_orphan_files" in out
    t.refresh()
    assert t.to_df().count() == before
    assert len(t.metadata.snapshots) == 1  # only the current survives
