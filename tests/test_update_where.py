"""UPDATE ... WHERE (copy-on-write, pruned candidates, one snapshot)."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import gt_eq, lt


def test_update_where_basic(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") <= 500)
    t = catalog.create_table("db.uw", o)
    t.append(o)
    t.update_where(lt("o_orderkey", 100),
                   {"o_totalprice": F.col("o_totalprice") * 2})
    got = {r.o_orderkey: r.o_totalprice for r in
           t.to_df().select("o_orderkey", "o_totalprice").collect()}
    for r in o.select("o_orderkey", "o_totalprice").collect():
        want = r.o_totalprice * 2 if r.o_orderkey < 100 else r.o_totalprice
        assert got[r.o_orderkey] == pytest.approx(want)


def test_update_where_prunes_candidate_files(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    t = catalog.create_table("db.uwp", o)
    # sorted appends -> disjoint per-file key ranges -> metrics pruning
    t.append(o.filter(F.col("o_orderkey") < 500).coalesce(1))
    t.append(o.filter((F.col("o_orderkey") >= 500)
                      & (F.col("o_orderkey") < 1000)).coalesce(1))
    t.append(o.filter(F.col("o_orderkey") >= 1000).coalesce(1))
    files_before = {task.file.file_path for task in t.new_scan().plan_files()}
    assert len(files_before) == 3
    t.update_where(gt_eq("o_orderkey", 1000),
                   {"o_totalprice": F.lit(0.0)})
    files_after = {task.file.file_path for task in t.new_scan().plan_files()}
    # only the matching file was rewritten; the other two survive untouched
    assert len(files_before & files_after) == 2
    assert t.to_df().filter((F.col("o_orderkey") >= 1000)
                            & (F.col("o_totalprice") != 0.0)).count() == 0
    assert t.to_df().filter((F.col("o_orderkey") < 1000)
                            & (F.col("o_totalprice") == 0.0)).count() == 0


def test_update_where_respects_pending_deletes(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") <= 300)
    t = catalog.create_table("db.uwd", o)
    t.append(o)
    # equality-delete keys < 50, then update over the whole table: the
    # deleted rows must NOT resurrect with updated values
    keys = spark.range(0, 50).select(F.col("id").alias("o_orderkey"))
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    n_live = t.to_df().count()
    t.update_where(lt("o_orderkey", 1_000_000),
                   {"o_totalprice": F.lit(7.0)})
    assert t.to_df().count() == n_live
    assert t.to_df().filter(F.col("o_orderkey") < 50).count() == 0
    assert t.to_df().filter(F.col("o_totalprice") != 7.0).count() == 0


def test_update_where_unknown_column_raises(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(10)
    t = catalog.create_table("db.uwe", o)
    t.append(o)
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where(lt("o_orderkey", 5), {"nope": F.lit(1)})
