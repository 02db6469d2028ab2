"""Round-4 ADVICE fixes, each with the failure scenario the advisor named.

1. pack_sequences uses an explicit ROWS frame: duplicate (order, id) keys
   must NOT become RANGE-frame peers sharing one cumulative sum.
2. pack_sequences(shard_col=...) packs each shard independently and its
   plan has no single-partition Exchange.
3. hash_bucket NULL-id rows hash to NULL (concat, not concat_ws): samplers
   drop them, split_assign leaves their split NULL — matching the SQL
   replay `salt || '-' || id`.
4. export_symlink_manifest(snapshot_id=0) raises "unknown snapshot"
   instead of silently exporting the current snapshot.
5. Legacy Hive plan_files raises on data files above the leaf partition
   level instead of silently dropping their rows.
6. incremental_dedup_oracle_sql composes from minhash_banded_cte_sql
   (no textual splicing of another oracle's SQL).
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# -- 1/2: pack_sequences frame + shard mode -------------------------------

def _pack(spark, rows, **kw):
    from linkedin_iceberg_spark.operators.text import pack_sequences
    df = spark.createDataFrame(rows)
    return pack_sequences(df, budget=100, order_col="ord",
                          count_col="n", id_col="doc_id", **kw)


def test_pack_rows_frame_on_duplicate_keys(spark):
    # three rows with the SAME (ord, doc_id): under Spark's default RANGE
    # frame all three are peers and each would get the full 3*60=180 sum
    # (start 120 -> bin 1 for every row); the ROWS frame gives a strictly
    # increasing running sum instead
    rows = [Row(doc_id=1, ord=0, n=60)] * 3
    out = _pack(spark, rows).collect()
    assert sorted(r["bin"] for r in out) == [0, 0, 1]
    assert sorted(r["bin_tokens_before"] for r in out) == [0, 20, 60]


def test_pack_sharded_equals_per_shard_global(spark):
    rows = [Row(doc_id=i, shard=s, ord=i, n=30 + 7 * i)
            for s in ("a", "b", "c") for i in range(20)]
    sharded = _pack(spark, rows, shard_col="shard")
    got = {(r["shard"], r["doc_id"]): (r["bin"], r["bin_tokens_before"],
                                       r["spills_next_bin"])
           for r in sharded.collect()}
    for s in ("a", "b", "c"):
        solo = _pack(spark, [r for r in rows if r.shard == s])
        for r in solo.collect():
            assert got[(s, r["doc_id"])] == \
                (r["bin"], r["bin_tokens_before"], r["spills_next_bin"])


def test_pack_sharded_plan_has_no_single_partition_exchange(spark):
    rows = [Row(doc_id=i, shard=str(i % 4), ord=i, n=10) for i in range(16)]
    plan = _pack(spark, rows, shard_col="shard") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning" in plan
    # the global mode keeps the exact-replay single stream
    plan_g = _pack(spark, rows)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" in plan_g


# -- 3: NULL ids in the hash-bucket recipe --------------------------------

def test_sample_drops_null_ids_like_sql(spark):
    from linkedin_iceberg_spark.operators.sampling import sample_fraction
    df = spark.createDataFrame(
        [Row(doc_id=i) for i in range(100)]
        + [Row(doc_id=None)] * 10)
    kept = sample_fraction(df, 1.0, "doc_id").collect()
    assert len(kept) == 100  # every non-null kept at fraction 1.0 ...
    assert all(r["doc_id"] is not None for r in kept)  # ... no NULL kept


def test_split_assign_null_id_gets_null_split(spark):
    from linkedin_iceberg_spark.operators.text import split_assign
    df = spark.createDataFrame([Row(doc_id=1), Row(doc_id=None)])
    out = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert out[1] in ("train", "val", "test")
    assert out[None] is None


# -- 4: snapshot_id=0 must raise, not export current ----------------------

def test_symlink_export_rejects_snapshot_zero(catalog, spark, tmp_path):
    from linkedin_iceberg_spark.catalog.maintenance import \
        export_symlink_manifest
    df = spark.range(10).withColumnRenamed("id", "k")
    t = catalog.create_table("db.symzero", df)
    t.append(df)
    with pytest.raises(ValueError, match="unknown snapshot"):
        export_symlink_manifest(t, str(tmp_path / "exp"), snapshot_id=0)


# -- 5: legacy Hive layout errors are loud --------------------------------

def test_legacy_hive_raises_on_non_leaf_data_file(spark, tmp_path):
    from linkedin_iceberg_spark.catalog.legacy_hive import LegacyHiveTable
    loc = tmp_path / "legacy"
    leaf = loc / "ds=2024-01-01"
    leaf.mkdir(parents=True)
    spark.range(5).toDF("v").withColumn("v", F.col("v").cast("long")) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "stage"))
    import shutil
    part = next(p for p in (tmp_path / "stage").iterdir()
                if p.name.endswith(".parquet"))
    shutil.copy(part, leaf / "data.parquet")
    t = LegacyHiveTable(spark, str(loc))
    assert t.new_scan().to_df().count() == 5  # clean layout reads fine
    # now drop a stray data file ABOVE the leaf level
    shutil.copy(part, loc / "stray.parquet")
    with pytest.raises(ValueError, match="non-leaf"):
        t.new_scan().plan_files()


# -- 6: oracle composition ------------------------------------------------

def test_incremental_oracle_composes_from_shared_cte():
    from linkedin_iceberg_spark.operators.dedup import (
        minhash_banded_cte_sql, minhash_oracle_sql)
    from linkedin_iceberg_spark.streaming.incremental_dedup import \
        incremental_dedup_oracle_sql
    prefix = minhash_banded_cte_sql()
    assert prefix.rstrip().endswith(")")
    assert "SELECT a." not in prefix  # prefix carries no final select
    assert minhash_oracle_sql().startswith(prefix)
    assert incremental_dedup_oracle_sql().startswith(prefix)
    assert ", dup AS (" in incremental_dedup_oracle_sql()


# -- verdict #5: overwrite_partitions degrades to CoW after spec evolution

def test_dynamic_overwrite_single_month_after_spec_evolution(catalog, spark,
                                                             sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.owp_r4", orders)
    old = orders.filter(F.col("o_orderkey") <= 500)            # spec 0 ({})
    t.append(old)
    t.update_spec(lambda b: b.month("o_orderdate"))
    new = orders.filter(F.col("o_orderkey") > 500)             # spec 1
    t.append(new)
    # overwrite exactly one month with marker rows
    month = old.select(F.date_trunc("month", "o_orderdate").alias("m")) \
        .groupBy("m").count().orderBy(F.desc("count")).first()["m"]
    repl = orders.filter(F.date_trunc("month", "o_orderdate") == month) \
        .withColumn("o_orderpriority", F.lit("REPLACED"))
    t = t.overwrite_partitions(repl)
    got = t.to_df()
    in_m = F.date_trunc("month", "o_orderdate") == month
    # the month holds exactly the replacement rows — including rows that
    # lived in old-spec (pre-evolution) files
    assert got.filter(in_m & (F.col("o_orderpriority") != "REPLACED")).count() == 0
    assert got.filter(in_m).count() == repl.count()
    # every other month from BOTH batches is intact
    want = old.filter(~in_m).count() + new.filter(~in_m).count()
    assert got.filter(~in_m).count() == want


def test_dynamic_overwrite_identity_spec_prunes_stale_files(catalog, spark,
                                                            sf_dir):
    # identity spec evolution: the pruning predicate has identity
    # components, so untouched old-spec files are NOT rewritten
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    t = catalog.create_table("db.owp_ident", nation)
    t.append(nation)                                           # spec 0 ({})
    t.update_spec(lambda b: b.identity("n_regionkey"))
    repl = nation.filter(F.col("n_regionkey") == 0) \
        .withColumn("n_name", F.lit("R0"))
    t = t.overwrite_partitions(repl)
    got = t.to_df()
    assert got.filter((F.col("n_regionkey") == 0)
                      & (F.col("n_name") != "R0")).count() == 0
    assert got.filter(F.col("n_regionkey") == 0).count() == repl.count()
    assert got.filter(F.col("n_regionkey") != 0).count() == \
        nation.filter(F.col("n_regionkey") != 0).count()
