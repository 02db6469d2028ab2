"""Zero-shuffle co-located GROUP BY (catalog/colocated.py
colocated_groupby): a table bucketed on the group key aggregates
bucket-by-bucket with NO exchange and NO Spark aggregate operator —
equivalence-tested against plain Spark groupBy across agg kinds, NULL
shapes, schema evolution, and every fallback trigger; bucket pruning
poison-proven."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.colocated import colocated_groupby

from conftest import SF_DIR

AGGS = [("count", None, "n"), ("count", "o_orderpriority", "np"),
        ("sum", "o_orderkey", "sk"), ("min", "o_totalprice", "mn"),
        ("max", "o_totalprice", "mx"), ("avg", "o_totalprice", "av"),
        ("count_distinct", "o_orderpriority", "dp")]


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _bucketed(catalog, o, name="db.o", n=8):
    sch = Schema.from_spark(o.schema)
    spec = PartitionSpec.builder_for(sch).bucket("o_custkey", n).build()
    t = catalog.create_table(name, o, spec=spec)
    t.append(o)
    return t


def _spark_agg(o):
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("np"),
        F.sum("o_orderkey").alias("sk"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.avg("o_totalprice").alias("av"),
        F.count_distinct("o_orderpriority").alias("dp"))


def _assert_same(got_df, want_df, key="o_custkey"):
    import pandas as pd
    g = got_df.toPandas().sort_values(key).reset_index(drop=True)
    w = want_df.toPandas().sort_values(key).reset_index(drop=True)
    g = g[w.columns.tolist()]
    pd.testing.assert_frame_equal(
        g.astype(w.dtypes.to_dict()), w, check_dtype=False,
        rtol=1e-12, atol=0)


def test_no_exchange_and_equivalence(spark, catalog):
    o = _orders(spark)
    t = _bucketed(catalog, o)
    got = colocated_groupby(t, "o_custkey", AGGS)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan
    _assert_same(got, _spark_agg(o))


def test_null_groups_sql_semantics(spark, catalog):
    """Groups whose agg column is all-NULL: sum/min/max/avg NULL,
    counts 0 — pandas partials must not invent zeros."""
    o = _orders(spark).withColumn(
        "maybe", F.when(F.col("o_orderkey") % 7 == 0,
                        F.col("o_totalprice")))
    t = _bucketed(catalog, o, "db.nulls")
    aggs = [("count", "maybe", "c"), ("sum", "maybe", "s"),
            ("min", "maybe", "mn"), ("avg", "maybe", "av")]
    got = colocated_groupby(t, "o_custkey", aggs)
    want = o.groupBy("o_custkey").agg(
        F.count("maybe").alias("c"), F.sum("maybe").alias("s"),
        F.min("maybe").alias("mn"), F.avg("maybe").alias("av"))
    _assert_same(got, want)


def test_key_values_prunes_buckets_poison_proven(spark, catalog):
    """key_values reads ONLY the values' buckets — proven by physically
    removing every other bucket's files."""
    o = _orders(spark)
    t = _bucketed(catalog, o)
    keys = sorted(int(r[0]) for r in
                  o.select("o_custkey").distinct().limit(3).collect())
    from linkedin_iceberg_spark.transforms.transforms import (
        parse_transform)
    tf = parse_transform("bucket[8]", "long")
    want_b = {tf.apply(k) for k in keys}
    tasks = t.new_scan().plan_files()
    pname = t.spec.fields[0].name
    moved = []
    for x in tasks:
        if x.file.partition[pname] not in want_b:
            shutil.move(x.file.file_path, x.file.file_path + ".poison")
            moved.append(x.file.file_path)
    try:
        got = colocated_groupby(t, "o_custkey",
                                [("count", None, "n"),
                                 ("sum", "o_orderkey", "sk")],
                                key_values=keys)
        want = (o.filter(F.col("o_custkey").isin(keys))
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("o_orderkey").alias("sk")))
        _assert_same(got, want)
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)


def test_schema_evolution_rename_aligns_by_field_id(spark, catalog):
    o = _orders(spark)
    t = _bucketed(catalog, o, "db.ren")
    t.update_schema().rename_column("o_totalprice", "price").commit()
    t = t.refresh()
    got = colocated_groupby(t, "o_custkey",
                            [("count", None, "n"),
                             ("max", "price", "mx")])
    want = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.max("o_totalprice").alias("mx"))
    _assert_same(got, want)


def test_added_column_fills_typed_nulls(spark, catalog):
    """Old files lack an evolved column: counts 0, sum NULL for keys
    whose rows predate it."""
    o = _orders(spark)
    t = _bucketed(catalog, o, "db.add")
    t.update_schema().add_column("bonus", "long").commit()
    t = t.refresh()
    extra = o.limit(40).withColumn("bonus", F.col("o_orderkey") * 2)
    t.append(extra)
    got = colocated_groupby(t, "o_custkey",
                            [("count", "bonus", "cb"),
                             ("sum", "bonus", "sb")])
    both = o.withColumn("bonus", F.lit(None).cast("long")) \
        .unionByName(extra)
    want = both.groupBy("o_custkey").agg(
        F.count("bonus").alias("cb"), F.sum("bonus").alias("sb"))
    _assert_same(got, want)


def test_fallback_on_deletes_and_mid_rebucket(spark, catalog):
    o = _orders(spark)
    t = _bucketed(catalog, o, "db.fb")
    # row-level deletes force the fallback (rows must still be right)
    dead = o.filter(F.col("o_orderkey") < 100).select("o_orderkey")
    t.row_delta(equality_delete_keys=dead, key_cols=["o_orderkey"])
    t = t.refresh()
    got = colocated_groupby(t, "o_custkey", [("count", None, "n")])
    want = o.filter(~(F.col("o_orderkey") < 100)) \
        .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    _assert_same(got, want)
    # mid-rebucket (spec evolution, old files under the old modulus)
    t2 = _bucketed(catalog, o, "db.fb2", n=4)
    t2.update_spec(lambda b: b.bucket("o_custkey", 16))
    t2 = t2.refresh()
    t2.append(o.limit(10))
    got = colocated_groupby(t2, "o_custkey", [("count", None, "n")])
    want = o.unionByName(o.limit(10)).groupBy("o_custkey") \
        .agg(F.count(F.lit(1)).alias("n"))
    _assert_same(got, want)


def test_distinct_only_agg_list(spark, catalog):
    o = _orders(spark)
    t = _bucketed(catalog, o, "db.d")
    got = colocated_groupby(
        t, "o_custkey", [("count_distinct", "o_orderpriority", "dp")])
    want = o.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("dp"))
    _assert_same(got, want)


def test_bad_specs_raise(spark, catalog):
    o = _orders(spark)
    t = _bucketed(catalog, o, "db.bad")
    with pytest.raises(ValueError):
        colocated_groupby(t, "o_custkey", [("median", "o_orderkey", "m")])
    with pytest.raises(ValueError):
        colocated_groupby(t, "o_custkey", [("sum", None, "s")])
    with pytest.raises(ValueError):
        colocated_groupby(t, "o_custkey", [("sum", "nope", "s")])
    with pytest.raises(ValueError):
        colocated_groupby(t, "o_custkey", [("count", None, "a"),
                                           ("sum", "o_orderkey", "a")])


def test_sql_route_zero_shuffle_and_equivalence(spark, catalog):
    """Catalog.sql routes GROUP BY on the bucket key through
    colocated_groupby: no Spark aggregate operator, values identical to
    the generic route; unsupported shapes fall through."""
    o = _orders(spark)
    _bucketed(catalog, o, "db.sqlg")
    sql = ("SELECT o_custkey, count(*) AS n, sum(o_orderkey) AS sk, "
           "count(DISTINCT o_orderpriority) AS dp "
           "FROM db.sqlg GROUP BY o_custkey ORDER BY o_custkey")
    df = catalog.sql(sql)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "MapInPandas" in plan
    want = (o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("sk"),
        F.count_distinct("o_orderpriority").alias("dp")))
    _assert_same(df, want)
    # key-membership WHERE prunes buckets and filters exactly
    keys = sorted(int(r[0]) for r in
                  o.select("o_custkey").distinct().limit(4).collect())
    in_list = ",".join(map(str, keys))
    df2 = catalog.sql(
        f"SELECT o_custkey, count(*) AS n FROM db.sqlg "
        f"WHERE o_custkey IN ({in_list}) GROUP BY o_custkey")
    want2 = (o.filter(F.col("o_custkey").isin(keys))
             .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    _assert_same(df2, want2)
    # non-key WHERE: generic route, same values
    df3 = catalog.sql("SELECT o_custkey, count(*) AS n FROM db.sqlg "
                      "WHERE o_totalprice > 1000 GROUP BY o_custkey")
    want3 = (o.filter(F.col("o_totalprice") > 1000)
             .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    _assert_same(df3, want3)
    # HAVING over an output alias
    df4 = catalog.sql("SELECT o_custkey, count(*) AS n FROM db.sqlg "
                      "GROUP BY o_custkey HAVING n >= 12")
    want4 = (o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= 12))
    _assert_same(df4, want4)


def test_sql_route_session_gate_and_identity_bail(spark, catalog):
    o = _orders(spark)
    _bucketed(catalog, o, "db.gate")
    try:
        spark.conf.set("spark.liceberg.sql.colocatedAggregate", "false")
        df = catalog.sql("SELECT o_custkey, count(*) AS n FROM db.gate "
                         "GROUP BY o_custkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan  # generic route
        assert df.count() == o.select("o_custkey").distinct().count()
    finally:
        spark.conf.set("spark.liceberg.sql.colocatedAggregate", "true")
    # identity-partitioned group key: the metadata fold keeps priority
    sch = Schema.from_spark(o.schema)
    spec = PartitionSpec.builder_for(sch) \
        .identity("o_orderpriority").build()
    t = catalog.create_table("db.ident", o, spec=spec)
    t.append(o)
    df = catalog.sql("SELECT o_orderpriority, count(*) AS n "
                     "FROM db.ident GROUP BY o_orderpriority")
    assert "MapInPandas" not in \
        df._jdf.queryExecution().executedPlan().toString()
    want = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    _assert_same(df, want, key="o_orderpriority")


def test_multi_column_group(spark, catalog):
    """GROUP BY bucket_key, secondary: groups stay bucket-confined, so
    the plan is still exchange-free; NULLs in the secondary column form
    their own groups (SQL GROUP BY)."""
    o = _orders(spark).withColumn(
        "st", F.when(F.col("o_orderkey") % 5 != 0,
                     F.col("o_orderstatus")))
    t = catalog.create_table("db.mc", o)
    sch = Schema.from_spark(o.schema)
    spec = PartitionSpec.builder_for(sch).bucket("o_custkey", 8).build()
    t = catalog.create_table("db.mc2", o, spec=spec)
    t.append(o)
    got = colocated_groupby(
        t, ["o_custkey", "st"],
        [("count", None, "n"), ("sum", "o_orderkey", "sk"),
         ("count_distinct", "o_orderpriority", "dp")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan
    want = o.groupBy("o_custkey", "st").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("sk"),
        F.count_distinct("o_orderpriority").alias("dp"))
    import pandas as pd
    g = got.toPandas().sort_values(["o_custkey", "st"],
                                   na_position="last") \
        .reset_index(drop=True)
    w = want.toPandas().sort_values(["o_custkey", "st"],
                                    na_position="last") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[w.columns.tolist()].astype(w.dtypes.to_dict()), w,
        check_dtype=False, rtol=1e-12)


def test_sql_multi_column_group(spark, catalog):
    o = _orders(spark)
    _bucketed(catalog, o, "db.sqlmc")
    df = catalog.sql(
        "SELECT o_custkey, o_orderstatus, count(*) AS n, "
        "max(o_totalprice) AS mx FROM db.sqlmc "
        "GROUP BY o_custkey, o_orderstatus "
        "ORDER BY o_custkey, o_orderstatus")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "MapInPandas" in plan
    want = (o.groupBy("o_custkey", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("o_totalprice").alias("mx")))
    import pandas as pd
    g = df.toPandas().sort_values(["o_custkey", "o_orderstatus"]) \
        .reset_index(drop=True)
    w = want.toPandas().sort_values(["o_custkey", "o_orderstatus"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[w.columns.tolist()].astype(w.dtypes.to_dict()), w,
        check_dtype=False, rtol=1e-12)
