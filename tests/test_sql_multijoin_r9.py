"""r9: automatic N-way (3+ table) co-located SQL joins
(catalog._sql_colocated_multijoin -> colocated_feature_assembly):
a star of tables all bucketed on one entity key assembles bucket-by-
bucket with NO exchange and NO Spark join operator — closing the r8
gap where 3+ table SQL over co-bucketed tables paid N-1 shuffles.
Every gate falls back to the generic route with identical rows."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema


def _bucketed(catalog, name, df, key, n=8):
    spec = PartitionSpec.builder_for(Schema.from_spark(df.schema)) \
        .bucket(key, n).build()
    t = catalog.create_table(name, df, spec=spec)
    t.append(df)
    return t.refresh()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def star(catalog, spark):
    base = spark.createDataFrame(
        [(i, f"d{i}", i % 5) for i in range(300)],
        "uid bigint, doc string, seg bigint")
    f1 = spark.createDataFrame(
        [(i, float(i) * 0.5) for i in range(0, 300, 2)],
        "uid bigint, score double")
    f2 = spark.createDataFrame(
        [(i, f"lang{i % 3}") for i in range(0, 300, 3)],
        "u2 bigint, lang string")
    b = _bucketed(catalog, "db.mj_base", base, "uid")
    t1 = _bucketed(catalog, "db.mj_f1", f1, "uid")
    t2 = _bucketed(catalog, "db.mj_f2", f2, "u2")
    return b, t1, t2, base, f1, f2


def _want(spark, base, f1, f2, how):
    return (base.join(f1, "uid", how)
            .join(f2, base["uid"] == f2["u2"], how).drop("u2"))


def test_three_way_inner_no_shuffle_no_join(star, catalog, spark):
    b, t1, t2, base, f1, f2 = star
    df = catalog.sql(
        "SELECT b.uid, b.doc, s.score, l.lang "
        "FROM db.mj_base b JOIN db.mj_f1 s ON b.uid = s.uid "
        "JOIN db.mj_f2 l ON b.uid = l.u2 ORDER BY b.uid")
    plan = _plan(df)
    assert "Exchange" not in plan.split("AdaptiveSparkPlan")[0] or \
        "Exchange" not in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in plan
    want = (_want(spark, base, f1, f2, "inner")
            .select("uid", "doc", "score", "lang").orderBy("uid"))
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in want.collect()]


def test_three_way_left_nulls(star, catalog, spark):
    _b, _t1, _t2, base, f1, f2 = star
    df = catalog.sql(
        "SELECT b.uid, s.score, l.lang FROM db.mj_base b "
        "LEFT JOIN db.mj_f1 s ON b.uid = s.uid "
        "LEFT JOIN db.mj_f2 l ON b.uid = l.u2")
    got = {r["uid"]: (r["score"], r["lang"]) for r in df.collect()}
    assert len(got) == 300
    assert got[1] == (None, None)          # odd uid, not %3
    assert got[6] == (3.0, "lang0")        # in both features
    assert got[4] == (2.0, None)
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in _plan(df)


def test_aggregate_over_assembled_view(star, catalog, spark):
    _b, _t1, _t2, base, f1, f2 = star
    df = catalog.sql(
        "SELECT b.seg, count(*) AS n, round(sum(s.score), 2) AS tot "
        "FROM db.mj_base b JOIN db.mj_f1 s ON b.uid = s.uid "
        "JOIN db.mj_f2 l ON b.uid = l.u2 "
        "GROUP BY b.seg ORDER BY b.seg")
    want = (_want(spark, base, f1, f2, "inner")
            .groupBy("seg").agg(F.count("*").alias("n"),
                                F.round(F.sum("score"), 2).alias("tot"))
            .orderBy("seg"))
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in want.collect()]


def test_mixed_join_kinds_fall_back_correctly(star, catalog, spark):
    _b, _t1, _t2, base, f1, f2 = star
    df = catalog.sql(
        "SELECT b.uid, s.score, l.lang FROM db.mj_base b "
        "JOIN db.mj_f1 s ON b.uid = s.uid "
        "LEFT JOIN db.mj_f2 l ON b.uid = l.u2 ORDER BY b.uid")
    want = (base.join(f1, "uid", "inner")
            .join(f2, base["uid"] == f2["u2"], "left")
            .select("uid", "score", "lang").orderBy("uid"))
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in want.collect()]


def test_unbucketed_side_falls_back_correctly(catalog, spark):
    base = spark.createDataFrame([(i, i % 4) for i in range(100)],
                                 "uid bigint, seg bigint")
    f1 = spark.createDataFrame([(i, i * 2) for i in range(100)],
                               "uid bigint, v1 bigint")
    f2 = spark.createDataFrame([(i, i * 3) for i in range(100)],
                               "uid bigint, v2 bigint")
    b = _bucketed(catalog, "db.mj_ub_base", base, "uid")
    t1 = _bucketed(catalog, "db.mj_ub_f1", f1, "uid")
    t2 = catalog.create_table("db.mj_ub_f2", f2)  # NOT bucketed
    t2.append(f2)
    df = catalog.sql(
        "SELECT b.uid, s.v1, l.v2 FROM db.mj_ub_base b "
        "JOIN db.mj_ub_f1 s ON b.uid = s.uid "
        "JOIN db.mj_ub_f2 l ON b.uid = l.uid ORDER BY b.uid")
    want = base.join(f1, "uid").join(f2.withColumnRenamed("uid", "u"),
                                     F.col("uid") == F.col("u")) \
        .select("uid", "v1", "v2").orderBy("uid")
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in want.collect()]
