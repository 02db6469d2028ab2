"""scan.to_df(use_planned_tasks=True): CombinedScanTasks drive the Spark
read (ref: SparkBatchScan.planInputPartitions consuming
TableScanUtil.planTasks) — the bin packer is load-bearing, not shelf code.

Checks: (1) one Spark partition per CombinedScanTask; (2) small files
coalesce under the open-file cost while big files split at split-size
boundaries, changing the task count vs file count; (3) results identical
to the default reader, including schema evolution and imported files.
"""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import split_planning as SP
from linkedin_iceberg_spark.expressions import gt_eq


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_small_files_coalesce_into_fewer_tasks(catalog, spark, orders):
    t = catalog.create_table("db.pr1", orders)
    # 6 tiny appends -> 6 files
    for i in range(6):
        t.append(orders.filter(F.col("o_orderkey") % 6 == i))
    tasks = t.new_scan().plan_files()
    assert len(tasks) >= 6

    # open-file cost floor 1 MB, 4 MB target -> tiny files pack together
    ctasks = SP.plan_tasks(tasks, split_size=4 * 1024 * 1024, lookback=10,
                           open_file_cost=1024 * 1024,
                           splittable=("parquet",))
    assert len(ctasks) < len(tasks)

    df = t.new_scan().to_df(use_planned_tasks=True,
                            split_size=4 * 1024 * 1024,
                            open_file_cost=1024 * 1024)
    # one Spark partition per combined task
    assert df.rdd.getNumPartitions() == len(ctasks)
    assert _rows(df) == _rows(t.new_scan().to_df())


def test_big_file_splits_into_more_tasks(catalog, spark, orders):
    t = catalog.create_table("db.pr2", orders)
    t.append(orders)  # one file, ~hundreds of KB at sf0.001
    tasks = t.new_scan().plan_files()
    assert len(tasks) == 1
    size = tasks[0].file.file_size_in_bytes
    split = max(size // 4, 1024)

    ctasks = SP.plan_tasks(tasks, split_size=split, lookback=10,
                           open_file_cost=1, splittable=("parquet",))
    assert len(ctasks) > 1  # the single file fanned out

    df = t.new_scan().to_df(use_planned_tasks=True, split_size=split,
                            open_file_cost=1)
    assert df.rdd.getNumPartitions() == len(ctasks)
    # row-group snapping: every row read exactly once
    assert df.count() == orders.count()
    assert _rows(df) == _rows(t.to_df())


@pytest.mark.parametrize("denom", [2, 3, 5, 9])
def test_row_group_snapping_covers_every_row_once(catalog, spark, orders,
                                                  denom):
    """Whatever the split size, byte-range midpoint snapping must assign
    every row group to exactly one split — no loss, no double-read."""
    t = catalog.create_table(f"db.snap{denom}", orders)
    t.append(orders)
    size = t.new_scan().plan_files()[0].file.file_size_in_bytes
    split = max(size // denom, 512)
    df = t.new_scan().to_df(use_planned_tasks=True, split_size=split,
                            open_file_cost=1)
    assert df.count() == orders.count()
    assert df.select(F.sum("o_orderkey")).collect()[0][0] == \
        orders.select(F.sum("o_orderkey")).collect()[0][0]


def test_planned_read_with_filter_and_evolution(catalog, spark, orders):
    t = catalog.create_table("db.pr3", orders)
    t.append(orders.filter(F.col("o_orderkey") <= 2000))
    (t.update_schema().rename_column("o_totalprice", "price")
     .add_column("chan", "string").commit())
    t.append(orders.filter(F.col("o_orderkey") > 2000)
             .withColumnRenamed("o_totalprice", "price")
             .withColumn("chan", F.lit("web")))

    flt = gt_eq("o_orderkey", 1000)
    got = t.new_scan().filter(flt).to_df(use_planned_tasks=True,
                                         open_file_cost=1)
    exp = t.new_scan().filter(flt).to_df()
    assert got.columns == exp.columns
    assert _rows(got) == _rows(exp)
    # old files: renamed column aligned by field id, added column null
    old_half = got.filter(F.col("o_orderkey") <= 2000)
    assert old_half.filter(F.col("chan").isNull()).count() == \
        old_half.count()


def test_planned_read_imported_hive_files(catalog, spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(0, 120).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("par"))
    df.write.partitionBy("par").parquet(src)
    t = catalog.import_table("db.pr4", src)

    got = t.new_scan().to_df(use_planned_tasks=True, open_file_cost=1)
    # identity partition constants injected from the manifest tuples
    assert _rows(got) == _rows(t.to_df())
    assert got.filter(F.col("par").isNull()).count() == 0


def test_planned_read_prunes_projection(catalog, spark, sf_dir):
    """select() reaches the worker's file reader: only the projected
    columns (plus filter references) are read, and filtering on a column
    outside the projection still works."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.pr_proj", o)
    t.append(o)
    from linkedin_iceberg_spark.expressions import gt
    got = (t.new_scan()
           .filter(gt("o_totalprice", 150000.0))
           .select(["o_orderkey", "o_orderstatus"])
           .to_df(use_planned_tasks=True, open_file_cost=1))
    assert got.columns == ["o_orderkey", "o_orderstatus"]
    exp = (o.filter(F.col("o_totalprice") > 150000.0)
           .select("o_orderkey", "o_orderstatus"))
    assert _rows(got) == _rows(exp)


def test_planned_read_orc_whole_files(catalog, spark, orders):
    """ORC tables run through the planned path too — whole files only
    (our ORC reader has no stripe-range API), so ORC is excluded from
    splitting but still bin-packs by open-file cost."""
    t = catalog.create_table("db.pr_orc", orders,
                             properties={"write.format-default": "orc"})
    for i in range(4):
        t.append(orders.filter(F.col("o_orderkey") % 4 == i))
    assert all(tk.file.file_format == "orc"
               for tk in t.new_scan().plan_files())
    got = t.new_scan().to_df(use_planned_tasks=True, open_file_cost=1)
    assert _rows(got) == _rows(t.to_df())
    assert got.count() == orders.count()


def test_planned_read_falls_back_on_deletes(catalog, spark, orders):
    """A table with pending v2 deletes must route to the join-based reader
    (and still be exactly right)."""
    one = orders.orderBy("o_orderkey").coalesce(1)
    t = catalog.create_table("db.pr5", orders)
    t.append(one)
    task = t.new_scan().plan_files()[0]
    pos = spark.createDataFrame(
        [(task.file.file_path, i) for i in range(10)],
        "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)

    got = t.new_scan().to_df(use_planned_tasks=True)
    assert got.count() == orders.count() - 10
    assert _rows(got) == _rows(t.to_df())
