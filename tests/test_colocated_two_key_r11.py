"""r11: TWO-KEY co-located stars (colocated_multikey_assembly +
catalog._sql_colocated_multijoin).

``FROM base JOIN d1 ON base.k1 = d1.a JOIN d2 ON base.k2 = d2.b`` with
the base's spec bucketing BOTH keys executes as grid-cell assembly: a
base partition is a (bucket(k1), bucket(k2)) cell joining d1's
bucket(k1) files and d2's bucket(k2) files — no exchange, no Spark join
operator.  Moduli may differ across keys; any contract breach bails to
the generic route with identical rows."""

import pytest
from pyspark.sql import functions as F

JOIN_OPS = ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
            "CartesianProduct")


@pytest.fixture()
def star2(catalog, spark):
    from linkedin_iceberg_spark import PartitionSpec, Schema
    base = spark.createDataFrame(
        [(i, i % 13, f"b{i}") for i in range(120)],
        "k1 bigint, k2 bigint, bv string")
    d1 = spark.createDataFrame(
        [(i, i * 10) for i in range(0, 120, 2)], "a bigint, x bigint")
    d2 = spark.createDataFrame(
        [(i, f"s{i}") for i in range(13)], "b bigint, s string")
    sb = PartitionSpec.builder_for(Schema.from_spark(base.schema)) \
        .bucket("k1", 4).bucket("k2", 3).build()
    s1 = PartitionSpec.builder_for(Schema.from_spark(d1.schema)) \
        .bucket("a", 4).build()
    s2 = PartitionSpec.builder_for(Schema.from_spark(d2.schema)) \
        .bucket("b", 3).build()
    catalog.create_table("db.tk_base", base, spec=sb).append(base)
    catalog.create_table("db.tk_d1", d1, spec=s1).append(d1)
    catalog.create_table("db.tk_d2", d2, spec=s2).append(d2)
    return catalog, base, d1, d2


def _expected(base, d1, d2, how="inner"):
    return (base.join(d1, base["k1"] == d1["a"], how).drop("a")
            .join(d2, base["k2"] == d2["b"], how).drop("b")
            .select("k1", "k2", "bv", "x", "s")
            .orderBy("k1").collect())


def test_function_inner_and_left(star2):
    cat, base, d1, d2 = star2
    from linkedin_iceberg_spark.catalog.colocated import (
        colocated_multikey_assembly)
    tb = cat.load_table("db.tk_base")
    t1 = cat.load_table("db.tk_d1")
    t2 = cat.load_table("db.tk_d2")
    for how in ("inner", "left"):
        j = colocated_multikey_assembly(
            tb, [("k1", t1, "a", None), ("k2", t2, "b", None)],
            how=how)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert not any(op in plan for op in JOIN_OPS), plan
        assert "Exchange" not in plan, plan
        got = (j.select("k1", "k2", "bv", "x", "s")
               .orderBy("k1").collect())
        assert got == _expected(base, d1, d2, how)


def test_sql_two_key_star_routes(star2):
    cat, base, d1, d2 = star2
    df = cat.sql(
        "SELECT b.k1, b.k2, b.bv, p.x, q.s FROM db.tk_base b "
        "JOIN db.tk_d1 p ON b.k1 = p.a "
        "JOIN db.tk_d2 q ON b.k2 = q.b ORDER BY b.k1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(op in plan for op in JOIN_OPS), plan
    # the only Exchange is ORDER BY's rangepartitioning — the join
    # itself is exchange-free
    assert "hashpartitioning" not in plan, plan
    assert "MapInPandas" in plan
    assert df.collect() == _expected(base, d1, d2)


def test_sql_two_key_star_aggregate_over_assembly(star2):
    cat, base, d1, d2 = star2
    df = cat.sql(
        "SELECT q.s AS s, count(b.bv) AS n, sum(p.x) AS sx "
        "FROM db.tk_base b "
        "JOIN db.tk_d1 p ON b.k1 = p.a "
        "JOIN db.tk_d2 q ON b.k2 = q.b "
        "GROUP BY q.s ORDER BY q.s")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(op in plan for op in JOIN_OPS), plan
    exp = (base.join(d1, base["k1"] == d1["a"])
           .join(d2, base["k2"] == d2["b"])
           .groupBy("s").agg(F.count("bv").alias("n"),
                             F.sum("x").alias("sx"))
           .orderBy("s").collect())
    assert df.collect() == exp


def test_sql_mismatched_modulus_bails(catalog, spark, star2):
    """d2 bucketed with a modulus unlike base's bucket(k2): generic
    route, identical rows."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    cat, base, d1, d2 = star2
    s2 = PartitionSpec.builder_for(Schema.from_spark(d2.schema)) \
        .bucket("b", 5).build()
    catalog.create_table("db.tk_d2m", d2, spec=s2).append(d2)
    df = cat.sql(
        "SELECT b.k1, b.bv, p.x, q.s FROM db.tk_base b "
        "JOIN db.tk_d1 p ON b.k1 = p.a "
        "JOIN db.tk_d2m q ON b.k2 = q.b ORDER BY b.k1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(op in plan for op in JOIN_OPS)   # generic route
    exp = (base.join(d1, base["k1"] == d1["a"])
           .join(d2, base["k2"] == d2["b"])
           .select("k1", "bv", "x", "s").orderBy("k1").collect())
    assert df.collect() == exp


def test_sql_unbucketed_second_key_bails(catalog, spark):
    """Base buckets only k1: the two-key star must bail (correct rows
    via the generic plan) — the pre-r11 tested-bail contract."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    base = spark.createDataFrame(
        [(i, i % 7, i) for i in range(40)],
        "k1 bigint, k2 bigint, v bigint")
    d1 = spark.createDataFrame([(i, i) for i in range(40)],
                               "a bigint, x bigint")
    d2 = spark.createDataFrame([(i, i * 2) for i in range(7)],
                               "b bigint, y bigint")
    sb = PartitionSpec.builder_for(Schema.from_spark(base.schema)) \
        .bucket("k1", 4).build()
    s1 = PartitionSpec.builder_for(Schema.from_spark(d1.schema)) \
        .bucket("a", 4).build()
    s2 = PartitionSpec.builder_for(Schema.from_spark(d2.schema)) \
        .bucket("b", 4).build()
    catalog.create_table("db.ub_base", base, spec=sb).append(base)
    catalog.create_table("db.ub_d1", d1, spec=s1).append(d1)
    catalog.create_table("db.ub_d2", d2, spec=s2).append(d2)
    df = catalog.sql(
        "SELECT b.k1, b.v, p.x, q.y FROM db.ub_base b "
        "JOIN db.ub_d1 p ON b.k1 = p.a "
        "JOIN db.ub_d2 q ON b.k2 = q.b ORDER BY b.k1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(op in plan for op in JOIN_OPS)
    exp = (base.join(d1, base["k1"] == d1["a"])
           .join(d2, base["k2"] == d2["b"])
           .select("k1", "v", "x", "y").orderBy("k1").collect())
    assert df.collect() == exp
