"""r10: chain-shaped co-located SQL joins (catalog._sql_colocated_multijoin).

``base.k = f1.k AND f1.k = f2.k`` is the single-key star in disguise
(inner-join equality transitivity) and must route to the zero-exchange
per-bucket assembly; a chain hop on a DIFFERENT column, or a LEFT chain
(NULL keys break transitivity), must bail to the generic route with
identical rows."""

import pytest
from pyspark.sql import functions as F

JOIN_OPS = ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
            "CartesianProduct")


@pytest.fixture()
def chain_cat(catalog, spark):
    from linkedin_iceberg_spark import PartitionSpec, Schema
    base = spark.createDataFrame(
        [(i, f"b{i}") for i in range(60)], "k bigint, bv string")
    f1 = spark.createDataFrame(
        [(i, i * 10, i % 7) for i in range(0, 60, 2)],
        "k bigint, a bigint, j bigint")
    f2 = spark.createDataFrame(
        [(i, f"s{i}") for i in range(0, 60, 3)], "k2 bigint, s string")
    sb = PartitionSpec.builder_for(Schema.from_spark(base.schema)) \
        .bucket("k", 4).build()
    s1 = PartitionSpec.builder_for(Schema.from_spark(f1.schema)) \
        .bucket("k", 4).build()
    s2 = PartitionSpec.builder_for(Schema.from_spark(f2.schema)) \
        .bucket("k2", 4).build()
    catalog.create_table("db.ch_base", base, spec=sb).append(base)
    catalog.create_table("db.ch_f1", f1, spec=s1).append(f1)
    catalog.create_table("db.ch_f2", f2, spec=s2).append(f2)
    return catalog, base, f1, f2


def _expected(base, f1, f2):
    return (base.join(f1, "k").join(f2, base["k"] == f2["k2"])
            .select("k", "bv", "a", "s").orderBy("k").collect())


def test_inner_chain_routes_to_assembly(chain_cat):
    cat, base, f1, f2 = chain_cat
    df = cat.sql(
        "SELECT b.k, b.bv, x.a, y.s FROM db.ch_base b "
        "JOIN db.ch_f1 x ON b.k = x.k "
        "JOIN db.ch_f2 y ON x.k = y.k2 ORDER BY b.k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(op in plan for op in JOIN_OPS), plan
    assert "MapInPandas" in plan
    assert df.collect() == _expected(base, f1, f2)


def test_different_key_chain_bails_with_correct_rows(chain_cat):
    """f1.j = f2.k2 is NOT the entity key: the route must bail and the
    generic plan (real Spark joins) must produce the right rows."""
    cat, base, f1, f2 = chain_cat
    df = cat.sql(
        "SELECT b.k, x.a, y.s FROM db.ch_base b "
        "JOIN db.ch_f1 x ON b.k = x.k "
        "JOIN db.ch_f2 y ON x.j = y.k2 ORDER BY b.k, y.s")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(op in plan for op in JOIN_OPS)   # generic route
    exp = (base.join(f1, "k")
           .join(f2, f1["j"] == f2["k2"])
           .select(base["k"], "a", "s").orderBy("k", "s").collect())
    assert df.collect() == exp


def test_left_chain_bails_with_correct_rows(chain_cat):
    """LEFT chain: unmatched f1 rows leave x.k NULL, so y never joins —
    different from the LEFT star; must run on the generic route."""
    cat, base, f1, f2 = chain_cat
    df = cat.sql(
        "SELECT b.k, x.a, y.s FROM db.ch_base b "
        "LEFT JOIN db.ch_f1 x ON b.k = x.k "
        "LEFT JOIN db.ch_f2 y ON x.k = y.k2 ORDER BY b.k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(op in plan for op in JOIN_OPS)   # generic route
    exp = (base.join(f1, "k", "left")
           .join(f2, f1["k"] == f2["k2"], "left")
           .select(base["k"], "a", "s").orderBy("k").collect())
    assert df.collect() == exp


def test_left_star_still_routes(chain_cat):
    """The LEFT *star* (every ON anchors the base) keeps its r9 route."""
    cat, base, f1, f2 = chain_cat
    df = cat.sql(
        "SELECT b.k, x.a, y.s FROM db.ch_base b "
        "LEFT JOIN db.ch_f1 x ON b.k = x.k "
        "LEFT JOIN db.ch_f2 y ON b.k = y.k2 ORDER BY b.k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(op in plan for op in JOIN_OPS), plan
    exp = (base.join(f1, "k", "left")
           .join(f2, base["k"] == f2["k2"], "left")
           .select(base["k"], "a", "s").orderBy("k").collect())
    assert df.collect() == exp
