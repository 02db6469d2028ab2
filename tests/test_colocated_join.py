"""Co-located bucket join (catalog/colocated.py): zero-shuffle,
no-join-operator plan when both sides bucket the key with one modulus;
byte-identical rows to the plain Spark join on every path, including
every documented fallback."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.colocated import colocated_bucket_join

from conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _customer(spark):
    return (spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
            .withColumnRenamed("c_custkey", "o_custkey"))


def _bucketed(catalog, name, df, n=8):
    spec = PartitionSpec.builder_for(Schema.from_spark(df.schema)) \
        .bucket("o_custkey", n).build()
    t = catalog.create_table(name, df, spec=spec)
    t.append(df)
    return t


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_inner_no_shuffle_no_join_operator(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    j = colocated_bucket_join(
        t1, t2, "o_custkey",
        left_cols=["o_custkey", "o_orderkey", "o_totalprice"],
        right_cols=["o_custkey", "c_name", "c_acctbal"])
    plan = _plan(j)
    assert "Exchange" not in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct"):
        assert op not in plan
    assert "MapInPandas" in plan
    got = j.orderBy("o_orderkey").collect()
    want = (o.select("o_custkey", "o_orderkey", "o_totalprice")
            .join(c.select("o_custkey", "c_name", "c_acctbal"),
                  "o_custkey", "inner")
            .orderBy("o_orderkey").collect())
    assert got == want


def test_left_join_lonely_buckets(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    sparse = c.filter(F.col("o_custkey") % 5 == 0)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", sparse)
    j = colocated_bucket_join(
        t1, t2, "o_custkey", how="left",
        left_cols=["o_custkey", "o_orderkey"],
        right_cols=["o_custkey", "c_name"])
    assert "Exchange" not in _plan(j)
    got = j.orderBy("o_orderkey").collect()
    want = (o.select("o_custkey", "o_orderkey")
            .join(sparse.select("o_custkey", "c_name"), "o_custkey",
                  "left")
            .orderBy("o_orderkey").collect())
    assert got == want


def test_fallback_unbucketed_and_mismatched_modulus(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o, n=8)
    flat = catalog.create_table("db.dflat", c)
    flat.append(c)
    j = colocated_bucket_join(t1, flat, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"])
    want = o.join(c, "o_custkey").count()
    assert j.count() == want
    t3 = _bucketed(catalog, "db.d16", c, n=16)
    j2 = colocated_bucket_join(t1, t3, "o_custkey",
                               left_cols=["o_custkey", "o_orderkey"],
                               right_cols=["o_custkey", "c_name"])
    assert j2.count() == want


def test_fallback_pending_deletes(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    # a v2 equality delete leaves delete files pending -> the
    # co-located path must not serve stale rows
    t1.row_delta(
        equality_delete_keys=o.filter(F.col("o_orderkey") < 500)
        .select("o_orderkey"),
        key_cols=["o_orderkey"])
    j = colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"])
    want = (o.filter(F.col("o_orderkey") >= 500)
            .join(c, "o_custkey").count())
    assert j.count() == want


def test_schema_evolution_rename_and_new_column(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    # rename a projected column after the files were written: the rev
    # map realigns by field id
    t1.update_schema().rename_column("o_totalprice", "price").commit()
    j = colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_custkey", "price"],
                              right_cols=["o_custkey", "c_name"])
    assert "Exchange" not in _plan(j)
    assert j.count() == o.join(c, "o_custkey").count()
    assert j.agg(F.sum("price")).head()[0] == pytest.approx(
        o.join(c.select("o_custkey"), "o_custkey")
        .agg(F.sum("o_totalprice")).head()[0])
    # a column none of the files carry reads as NULL
    t2.update_schema().add_column("c_tier", "string").commit()
    j2 = colocated_bucket_join(t1, t2, "o_custkey",
                               left_cols=["o_custkey", "price"],
                               right_cols=["o_custkey", "c_tier"])
    assert j2.where(F.col("c_tier").isNotNull()).count() == 0
    assert j2.count() == o.join(c, "o_custkey").count()


def test_validation(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim",
                   c.withColumn("o_orderkey", F.lit(1)))
    with pytest.raises(ValueError, match="disjoint"):
        colocated_bucket_join(t1, t2, "o_custkey")
    with pytest.raises(ValueError, match="must be selected"):
        colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_orderkey"],
                              right_cols=["o_custkey"])
    with pytest.raises(ValueError, match="inner|left"):
        colocated_bucket_join(t1, t2, "o_custkey", how="full")


def _bucketed_pair(catalog, spark):
    o = _orders(spark)
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    so = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .bucket("o_custkey", 8).build()
    sc_ = PartitionSpec.builder_for(Schema.from_spark(c.schema)) \
        .bucket("c_custkey", 8).build()
    catalog.create_table("db.fact", o, spec=so).append(o)
    catalog.create_table("db.dim", c, spec=sc_).append(c)
    return o, c


def test_sql_auto_route_no_join_operator(spark, catalog):
    """Catalog.sql detects the co-bucketed equi-join and serves it
    bucket-by-bucket; WHERE/ORDER BY/LIMIT run over the joined view
    with identical rows to the generic plan."""
    o, c = _bucketed_pair(catalog, spark)
    df = catalog.sql(
        "SELECT o.o_orderkey, o.o_totalprice, c.c_name "
        "FROM db.fact o JOIN db.dim c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_acctbal > 100 ORDER BY o.o_orderkey LIMIT 40")
    plan = _plan(df)
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in plan
    assert "MapInPandas" in plan
    want = (o.join(c, o.o_custkey == c.c_custkey)
            .where(F.col("c_acctbal") > 100)
            .select("o_orderkey", "o_totalprice", "c_name")
            .orderBy("o_orderkey").limit(40).collect())
    assert df.collect() == want


def test_sql_auto_route_aggregate_and_left(spark, catalog):
    o, c = _bucketed_pair(catalog, spark)
    got = [(r["seg"], r["n"]) for r in catalog.sql(
        "SELECT c.c_mktsegment AS seg, count(*) AS n "
        "FROM db.fact o JOIN db.dim c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment ORDER BY seg").collect()]
    want = [(r["c_mktsegment"], r["count"]) for r in
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment").count()
            .orderBy("c_mktsegment").collect()]
    assert got == want
    gl = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact o "
        "LEFT JOIN db.dim c ON o.o_custkey = c.c_custkey "
        "ORDER BY o.o_orderkey LIMIT 25").collect()
    wl = (o.join(c, o.o_custkey == c.c_custkey, "left")
          .select("o_orderkey", "c_name")
          .orderBy("o_orderkey").limit(25).collect())
    assert gl == wl


def test_sql_auto_route_bails_conservatively(spark, catalog):
    """SELECT *, extra joins, and unbucketed sides all take the generic
    route — identical answers either way."""
    o, c = _bucketed_pair(catalog, spark)
    n = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    catalog.create_table("db.nat", n).append(n)
    # SELECT * (ON-join arity rules) -> generic, still correct
    df = catalog.sql("SELECT * FROM db.fact o JOIN db.dim c "
                     "ON o.o_custkey = c.c_custkey")
    assert df.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    assert len(df.columns) == len(o.columns) + len(c.columns)
    # three tables -> generic
    df2 = catalog.sql(
        "SELECT o.o_orderkey, c.c_name, n.n_name "
        "FROM db.fact o JOIN db.dim c ON o.o_custkey = c.c_custkey "
        "JOIN db.nat n ON c.c_nationkey = n.n_nationkey "
        "ORDER BY o.o_orderkey LIMIT 10")
    want2 = (o.join(c, o.o_custkey == c.c_custkey)
             .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
             .select("o_orderkey", "c_name", "n_name")
             .orderBy("o_orderkey").limit(10).collect())
    assert df2.collect() == want2


def test_sql_point_lookup_prunes_buckets(spark, catalog):
    """WHERE key = literal restricts the co-located join to the value's
    bucket pair: strictly fewer input files than the full join, same
    rows as the generic plan."""
    o, c = _bucketed_pair(catalog, spark)
    ck = o.select("o_custkey").first()[0]
    # pruning evidence: one bucket pair = one task partition (the
    # per-bucket tasks ARE the read — mapInPandas shows no inputFiles)
    full = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact o JOIN db.dim c "
        "ON o.o_custkey = c.c_custkey")
    pruned = catalog.sql(
        f"SELECT o.o_orderkey, c.c_name FROM db.fact o JOIN db.dim c "
        f"ON o.o_custkey = c.c_custkey WHERE o.o_custkey = {ck}")
    assert 0 < pruned.rdd.getNumPartitions() < \
        full.rdd.getNumPartitions()
    want = (o.filter(F.col("o_custkey") == ck)
            .join(c, o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_name")
            .orderBy("o_orderkey").collect())
    assert sorted(pruned.collect()) == sorted(want)
    # IN over several keys, unqualified spelling
    ks = [r[0] for r in o.select("o_custkey").distinct().limit(3).collect()]
    inq = catalog.sql(
        f"SELECT o.o_orderkey, c.c_name FROM db.fact o JOIN db.dim c "
        f"ON o.o_custkey = c.c_custkey "
        f"WHERE o_custkey IN ({','.join(map(str, ks))}) "
        f"ORDER BY o.o_orderkey")
    want2 = (o.filter(F.col("o_custkey").isin(ks))
             .join(c, o.o_custkey == c.c_custkey)
             .select("o_orderkey", "c_name")
             .orderBy("o_orderkey").collect())
    assert inq.collect() == want2


def test_api_key_values_pruning(spark, catalog):
    o, c = _orders(spark), _customer(spark)
    t1 = _bucketed(catalog, "db.fact", o)
    t2 = _bucketed(catalog, "db.dim", c)
    ck = o.select("o_custkey").first()[0]
    j = colocated_bucket_join(t1, t2, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"],
                              key_values=[ck])
    assert j.rdd.getNumPartitions() == 1  # one bucket pair read
    got = (j.where(F.col("o_custkey") == ck)
           .orderBy("o_orderkey").collect())
    want = (o.filter(F.col("o_custkey") == ck)
            .select("o_custkey", "o_orderkey")
            .join(c.select("o_custkey", "c_name"), "o_custkey")
            .orderBy("o_orderkey").collect())
    assert got == want


def test_feature_assembly_three_way(spark, catalog):
    """N-way shuffle-free feature assembly over one entity key: base
    orders + two feature tables, all bucketed on the key; no exchange,
    no join operator, rows identical to chained Spark joins."""
    from linkedin_iceberg_spark.catalog.colocated import (
        colocated_feature_assembly)
    o = _orders(spark)
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    f1 = c.select(F.col("c_custkey").alias("k"),
                  F.col("c_acctbal").alias("bal"))
    f2 = c.select(F.col("c_custkey").alias("ck2"),
                  F.col("c_mktsegment").alias("seg"))
    so = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .bucket("o_custkey", 8).build()
    s1 = PartitionSpec.builder_for(Schema.from_spark(f1.schema)) \
        .bucket("k", 8).build()
    s2 = PartitionSpec.builder_for(Schema.from_spark(f2.schema)) \
        .bucket("ck2", 8).build()
    tb = catalog.create_table("db.base", o, spec=so)
    tb.append(o)
    t1 = catalog.create_table("db.f1", f1, spec=s1)
    t1.append(f1.filter(F.col("k") % 2 == 0))  # sparse feature
    t2 = catalog.create_table("db.f2", f2, spec=s2)
    t2.append(f2)
    out = colocated_feature_assembly(
        tb, "o_custkey", [(t1, "k", None), (t2, "ck2", None)],
        base_cols=["o_custkey", "o_orderkey"])
    plan = _plan(out)
    assert "Exchange" not in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in plan
    got = out.orderBy("o_orderkey").collect()
    want = (o.select("o_custkey", "o_orderkey")
            .join(f1.filter(F.col("k") % 2 == 0),
                  F.col("o_custkey") == F.col("k"), "left").drop("k")
            .join(f2, F.col("o_custkey") == F.col("ck2"), "left")
            .drop("ck2")
            .orderBy("o_orderkey").collect())
    assert got == want
    # inner intersects; fallback on an unbucketed feature
    inner = colocated_feature_assembly(
        tb, "o_custkey", [(t1, "k", None)],
        base_cols=["o_custkey", "o_orderkey"], how="inner")
    assert inner.count() == o.join(
        f1.filter(F.col("k") % 2 == 0),
        F.col("o_custkey") == F.col("k")).count()
    flat = catalog.create_table("db.fflat", f1)
    flat.append(f1)
    fb = colocated_feature_assembly(
        tb, "o_custkey", [(flat, "k", None)],
        base_cols=["o_custkey", "o_orderkey"])
    assert fb.count() == o.count()
    with pytest.raises(ValueError, match="disjoint"):
        colocated_feature_assembly(
            tb, "o_custkey", [(t1, "k", None), (t1, "k", None)])


def test_sql_route_conf_gate(spark, catalog):
    """spark.liceberg.sql.colocatedJoin=false prefers the generic
    (runtime-filterable) plan; values identical either way."""
    o, c = _bucketed_pair(catalog, spark)
    q = ("SELECT o.o_orderkey, c.c_name FROM db.fact o JOIN db.dim c "
         "ON o.o_custkey = c.c_custkey ORDER BY o.o_orderkey LIMIT 15")
    on = catalog.sql(q).collect()
    spark.conf.set("spark.liceberg.sql.colocatedJoin", "false")
    try:
        off_df = catalog.sql(q)
        assert "MapInPandas" not in _plan(off_df)
        assert off_df.collect() == on
    finally:
        spark.conf.unset("spark.liceberg.sql.colocatedJoin")


def test_sql_string_key_point_lookup(spark, catalog):
    """String join keys: bucket layout, the SQL route, and quoted-
    literal point-lookup pruning all work on murmur3 string buckets."""
    o = _orders(spark)
    left = o.select(F.col("o_orderpriority").alias("prio"),
                    "o_orderkey")
    right = (o.groupBy(F.col("o_orderpriority").alias("rprio"))
             .agg(F.count("*").alias("prio_rows")))
    sl = PartitionSpec.builder_for(Schema.from_spark(left.schema)) \
        .bucket("prio", 4).build()
    sr = PartitionSpec.builder_for(Schema.from_spark(right.schema)) \
        .bucket("rprio", 4).build()
    catalog.create_table("db.sl", left, spec=sl).append(left)
    catalog.create_table("db.sr", right, spec=sr).append(right)
    full = catalog.sql(
        "SELECT l.o_orderkey, r.prio_rows FROM db.sl l "
        "JOIN db.sr r ON l.prio = r.rprio")
    pruned = catalog.sql(
        "SELECT l.o_orderkey, r.prio_rows FROM db.sl l "
        "JOIN db.sr r ON l.prio = r.rprio "
        "WHERE l.prio = '1-URGENT'")
    assert 0 < pruned.rdd.getNumPartitions() <= \
        full.rdd.getNumPartitions()
    want = (left.filter(F.col("prio") == "1-URGENT")
            .join(right, F.col("prio") == F.col("rprio"))
            .select("o_orderkey", "prio_rows").collect())
    assert sorted(pruned.collect()) == sorted(want)
    assert "MapInPandas" in _plan(pruned)


def test_call_rebucket_enables_colocated_join(spark, catalog):
    """CALL rebucket: an UNPARTITIONED fact and a bucket(4) dim both
    rebucket to 8 and the join stops falling back — MapInPandas, no
    join operator, values identical.  Mid-rebucket (spec evolved,
    files not yet rewritten) the mixed-modulus guard forces the
    fallback instead of mis-bucketing."""
    import json as _json
    o, c = _orders(spark), _customer(spark)
    flat = catalog.create_table("db.fact", o)
    flat.append(o.repartition(3))
    d4 = _bucketed(catalog, "db.dim", c, n=4)
    want = (o.select("o_custkey", "o_orderkey")
            .join(c.select("o_custkey", "c_name"), "o_custkey")
            .count())
    st = catalog.sql("CALL rebucket('db.fact', 'o_custkey', 8)").head()
    out = _json.loads(st["detail"])
    assert out["buckets"] == 8 and out["rewritten_files"] >= 3
    # dim is still bucket(4): modulus mismatch -> fallback, same rows
    flat.refresh()
    j0 = colocated_bucket_join(flat, d4, "o_custkey",
                               left_cols=["o_custkey", "o_orderkey"],
                               right_cols=["o_custkey", "c_name"])
    assert j0.count() == want
    catalog.sql("CALL rebucket('db.dim', 'o_custkey', 8)")
    d4.refresh()
    j = colocated_bucket_join(flat, d4, "o_custkey",
                              left_cols=["o_custkey", "o_orderkey"],
                              right_cols=["o_custkey", "c_name"])
    plan = _plan(j)
    assert "MapInPandas" in plan and "SortMergeJoin" not in plan \
        and "Exchange" not in plan
    assert j.count() == want
    # mid-rebucket guard: evolve the dim spec again WITHOUT rewriting —
    # old bucket(8) files under the new bucket(16) default must fall back
    d4.update_spec(lambda b: b.bucket("o_custkey", 16))
    d4.refresh()
    j2 = colocated_bucket_join(flat, d4, "o_custkey",
                               left_cols=["o_custkey", "o_orderkey"],
                               right_cols=["o_custkey", "c_name"])
    assert j2.count() == want


def test_sql_where_prunes_side_files(spark, catalog):
    """WHERE conjuncts prune each side's FILES inside the co-located
    plan: two appends give every bucket a low- and a high-orderkey
    file; a WHERE below the cutoff never touches the high files
    (poison: physically moved away), and values match the generic
    plan."""
    import shutil
    o, c = _orders(spark), _customer(spark)
    so = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .bucket("o_custkey", 4).build()
    t1 = catalog.create_table("db.fact", o, spec=so)
    t1.append(o.filter(F.col("o_orderkey") < 700))
    t1.append(o.filter(F.col("o_orderkey") >= 700))
    t2 = _bucketed(catalog, "db.dim", c, n=4)
    q = ("SELECT o.o_orderkey, c.c_name FROM db.fact o JOIN db.dim c "
         "ON o.o_custkey = c.o_custkey WHERE o.o_orderkey < 700")
    df = catalog.sql(q)
    assert "MapInPandas" in _plan(df)
    want = (o.filter(F.col("o_orderkey") < 700)
            .join(c, "o_custkey").select("o_orderkey", "c_name")
            .collect())
    assert sorted(df.collect()) == sorted(want)
    # poison: the >=700 files are provably outside the WHERE - move them
    t1.refresh()
    moved = []
    for e in t1._live_data_and_deletes()[0]:
        lo = (e.data_file.lower_bounds or {}).get(
            t1.schema.id_for_name("o_orderkey"))
        if lo is not None and lo >= 700:
            p = e.data_file.file_path
            shutil.move(p, p + ".poison")
            moved.append(p)
    assert moved, "test setup: expected prunable high files"
    try:
        again = catalog.sql(q).collect()
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)
    assert sorted(again) == sorted(want)
