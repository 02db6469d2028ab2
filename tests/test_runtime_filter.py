"""Runtime join filtering (the DPP / runtime-filter analog): build-side
keys prune the fact scan at manifest level; results always equal the
plain join."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.runtime_filter import (
    runtime_filter, runtime_filtered_join)


@pytest.fixture()
def fact(catalog, spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .truncate("o_custkey", 20).build()
    t = catalog.create_table("db.rtf", o, spec=spec)
    t.append(o)
    return t, o


def test_prunes_files_and_matches_plain_join(fact, spark, sf_dir):
    t, o = fact
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dim = c.filter(F.col("c_custkey") % 40 == 3) \
        .select("c_custkey", "c_name")
    flt = runtime_filter(dim, "c_custkey", "o_custkey")
    n_all = len(t.new_scan().plan_files())
    n_pruned = len(t.new_scan().filter(flt).plan_files())
    assert 0 < n_pruned < n_all
    got = runtime_filtered_join(t, dim, "o_custkey", "c_custkey") \
        .select("o_orderkey", "c_name")
    want = o.join(dim, o.o_custkey == dim.c_custkey) \
        .select("o_orderkey", "c_name")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_semi_join_and_how_guard(fact, spark, sf_dir):
    t, o = fact
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dim = c.filter(F.col("c_custkey") % 40 == 3).select("c_custkey")
    got = runtime_filtered_join(t, dim, "o_custkey", "c_custkey",
                                how="left_semi")
    want = o.join(dim, o.o_custkey == dim.c_custkey, "left_semi")
    assert got.count() == want.count() > 0
    with pytest.raises(ValueError, match="inner/left_semi"):
        runtime_filtered_join(t, dim, "o_custkey", how="left")


def test_empty_build_side_reads_nothing(fact, spark):
    t, _ = fact
    dim = spark.createDataFrame([], "c_custkey bigint")
    flt = runtime_filter(dim, "c_custkey", "o_custkey")
    assert t.new_scan().filter(flt).plan_files() == []
    assert runtime_filtered_join(t, dim, "o_custkey",
                                 "c_custkey").count() == 0


def test_null_build_keys_dropped(fact, spark):
    t, o = fact
    dim = spark.createDataFrame([(3,), (None,)], "c_custkey bigint")
    got = runtime_filtered_join(t, dim, "o_custkey", "c_custkey")
    want = o.filter(F.col("o_custkey") == 3).count()
    assert got.count() == want


def test_max_keys_falls_back_to_range_envelope(fact, spark, sf_dir):
    t, o = fact
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    lo = 41
    dim = c.filter(F.col("c_custkey").between(lo, lo + 39)) \
        .select("c_custkey")
    flt = runtime_filter(dim, "c_custkey", "o_custkey", max_keys=5)
    n_all = len(t.new_scan().plan_files())
    n_env = len(t.new_scan().filter(flt).plan_files())
    assert 0 < n_env < n_all  # the [41, 80] envelope still prunes
    got = runtime_filtered_join(t, dim, "o_custkey", "c_custkey",
                                max_keys=5)
    want = o.join(dim, o.o_custkey == dim.c_custkey)
    assert got.count() == want.count() > 0


def _star_tables(catalog, spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .truncate("o_custkey", 20).build()
    tf = catalog.create_table("db.fact_s", o, spec=spec)
    tf.append(o)
    td = catalog.create_table("db.dim_s", c)
    td.append(c)
    return tf, td, o, c


def test_sql_star_join_auto_runtime_filter(catalog, spark, sf_dir):
    """Catalog.sql detects the star shape (two tables, equi-join, all
    extracted WHERE conjuncts on one side) and prunes the fact scan by
    the dim's distinct keys — values identical, fewer files read."""
    tf, td, o, c = _star_tables(catalog, spark, sf_dir)
    n_fact = len(tf.new_scan().plan_files())
    n_dim = len(td.new_scan().plan_files())
    out = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact_s o "
        "JOIN db.dim_s c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey < 40 ORDER BY o_orderkey")
    dim = c.filter(F.col("c_custkey") < 40)
    want = (o.join(dim, o.o_custkey == dim.c_custkey)
            .select("o_orderkey", "c_name").orderBy("o_orderkey"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]
    # pruning evidence: the fact side read strictly fewer files
    assert 0 < len(out.inputFiles()) < n_fact + n_dim


def test_sql_left_join_bails_but_stays_correct(catalog, spark, sf_dir):
    tf, td, o, c = _star_tables(catalog, spark, sf_dir)
    out = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact_s o "
        "LEFT JOIN db.dim_s c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey < 40 ORDER BY o_orderkey")
    dim = c.filter(F.col("c_custkey") < 40)
    want = (o.join(dim, o.o_custkey == dim.c_custkey, "left")
            .filter(F.col("c_custkey") < 40)
            .select("o_orderkey", "c_name").orderBy("o_orderkey"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]


def test_sql_both_sides_filtered_bails(catalog, spark, sf_dir):
    tf, td, o, c = _star_tables(catalog, spark, sf_dir)
    out = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact_s o "
        "JOIN db.dim_s c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey < 40 AND o.o_totalprice > 1000 "
        "ORDER BY o_orderkey")
    dim = c.filter(F.col("c_custkey") < 40)
    fact = o.filter(F.col("o_totalprice") > 1000)
    want = (fact.join(dim, fact.o_custkey == dim.c_custkey)
            .select("o_orderkey", "c_name").orderBy("o_orderkey"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]


def test_key_index_path_exact_files_and_fallback(fact, spark, sf_dir):
    """With a key index on the probe column the join reads the
    index-resolved exact file set; after a row-changing commit the
    stale index silently falls back to the metrics path."""
    from linkedin_iceberg_spark.catalog.key_index import (
        build_key_index, lookup_files)
    from linkedin_iceberg_spark.expressions import eq
    t, o = fact
    build_key_index(t, "o_custkey")
    dim = spark.createDataFrame([(3,), (47,)], "c_custkey bigint")
    got = runtime_filtered_join(t, dim, "o_custkey", "c_custkey") \
        .select("o_orderkey")
    want = o.filter(F.col("o_custkey").isin([3, 47])).select("o_orderkey")
    assert sorted(r[0] for r in got.collect()) == \
        sorted(r[0] for r in want.collect())
    # exact: the probe read at most the index-resolved files
    idx_files = set(lookup_files(t, "o_custkey", [3, 47]))
    got2 = runtime_filtered_join(t, dim, "o_custkey", "c_custkey")
    read = {p.removeprefix("file://") for p in got2.inputFiles()}
    assert read <= idx_files
    # stale after a row-changing commit -> fallback stays correct
    t.delete_where(eq("o_custkey", 3))
    got3 = runtime_filtered_join(t, dim, "o_custkey", "c_custkey") \
        .select("o_orderkey")
    want3 = o.filter(F.col("o_custkey") == 47).select("o_orderkey")
    assert sorted(r[0] for r in got3.collect()) == \
        sorted(r[0] for r in want3.collect())


def test_sql_comma_join_also_runtime_filters(catalog, spark, sf_dir):
    """FROM a, b WHERE a.k = b.k AND <dim filter> — the implicit-join
    spelling hits the same star shape."""
    tf, td, o, c = _star_tables(catalog, spark, sf_dir)
    n_fact = len(tf.new_scan().plan_files())
    n_dim = len(td.new_scan().plan_files())
    out = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact_s o, db.dim_s c "
        "WHERE o.o_custkey = c.c_custkey AND c.c_custkey < 40 "
        "ORDER BY o_orderkey")
    dim = c.filter(F.col("c_custkey") < 40)
    want = (o.join(dim, o.o_custkey == dim.c_custkey)
            .select("o_orderkey", "c_name").orderBy("o_orderkey"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]
    assert 0 < len(out.inputFiles()) < n_fact + n_dim


def test_sql_or_nested_equality_bails(catalog, spark, sf_dir):
    """An equality under OR proves nothing — the filter must NOT prune
    (rows satisfying the other OR branch would be lost)."""
    tf, td, o, c = _star_tables(catalog, spark, sf_dir)
    out = catalog.sql(
        "SELECT o.o_orderkey, c.c_name FROM db.fact_s o "
        "JOIN db.dim_s c ON (o.o_custkey = c.c_custkey "
        "OR o.o_orderkey = c.c_custkey) "
        "WHERE c.c_custkey < 10 ORDER BY o_orderkey, c_name")
    dim = c.filter(F.col("c_custkey") < 10)
    want = (o.join(dim, (o.o_custkey == dim.c_custkey)
                   | (o.o_orderkey == dim.c_custkey))
            .select("o_orderkey", "c_name")
            .orderBy("o_orderkey", "c_name"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]


def test_sql_multi_dim_star_filters_fact_by_both(catalog, spark, sf_dir):
    """One fact + two filtered dims: the fact scan takes BOTH dims'
    key filters (AND of INs) — the TPC-H star shape."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    tf = catalog.create_table("db.li", li)
    tf.append(li)
    t1 = catalog.create_table("db.ord", o)
    t1.append(o)
    t2 = catalog.create_table("db.prt", p)
    t2.append(p)
    out = catalog.sql(
        "SELECT l.l_orderkey, l.l_partkey, l.l_quantity AS qty "
        "FROM db.li l JOIN db.ord o ON l.l_orderkey = o.o_orderkey "
        "JOIN db.prt p ON l.l_partkey = p.p_partkey "
        "WHERE o.o_orderkey < 100 AND p.p_partkey < 50 "
        "ORDER BY l_orderkey, l_partkey")
    od = o.filter(F.col("o_orderkey") < 100)
    pd_ = p.filter(F.col("p_partkey") < 50)
    want = (li.join(od, li.l_orderkey == od.o_orderkey)
            .join(pd_, li.l_partkey == pd_.p_partkey)
            .select("l_orderkey", "l_partkey",
                    F.col("l_quantity").alias("qty"))
            .orderBy("l_orderkey", "l_partkey"))
    assert [tuple(r) for r in out.collect()] == \
        [tuple(r) for r in want.collect()]
