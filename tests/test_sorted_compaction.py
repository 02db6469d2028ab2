"""Sorted compaction: rewrite_data_files(sort_by=...) clusters rows so
file-level min/max stats become disjoint and stats pruning skips files.
"""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


def _bounds(table, col_name):
    fid = table.schema.id_for_name(col_name)
    out = []
    for task in table.new_scan().plan_files():
        lo = task.file.lower_bounds.get(fid)
        hi = task.file.upper_bounds.get(fid)
        out.append((lo, hi))
    return out


def test_sorted_compaction_disjoint_bounds_and_pruning(catalog, spark,
                                                       sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.sorted", o)
    # four appends in shuffled order: every file spans ~the full key range
    for i in range(4):
        t.append(o.filter(F.col("o_orderkey") % 4 == i)
                 .orderBy(F.rand(seed=i)))
    n = t.to_df().count()
    pred = and_(gt_eq("o_orderkey", 100), lt("o_orderkey", 200))
    before = len(t.new_scan().filter(pred).plan_files())
    assert before == 4  # unsorted: every file overlaps the range

    res = t.rewrite_data_files(target_size_bytes=16 * 1024,
                               min_input_files=1,
                               sort_by=["o_orderkey"])
    assert res["rewritten_files"] == 4
    assert res["added_files"] >= 2

    # rows unchanged
    assert t.to_df().count() == n
    assert t.to_df().agg(F.sum("o_orderkey")).collect()[0][0] == \
        o.agg(F.sum("o_orderkey")).collect()[0][0]

    # output files carry non-overlapping o_orderkey bands
    bounds = sorted(_bounds(t, "o_orderkey"))
    assert len(bounds) == res["added_files"]
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2

    # the range predicate now prunes to a strict subset of files
    after = len(t.new_scan().filter(pred).plan_files())
    assert after < res["added_files"]
    got = (t.new_scan().filter(pred).to_df()
           .select("o_orderkey").orderBy("o_orderkey").collect())
    want = (o.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200))
            .select("o_orderkey").orderBy("o_orderkey").collect())
    assert got == want


def test_sorted_compaction_partitioned_sorts_within_partitions(
        catalog, spark, sf_dir):
    from linkedin_iceberg_spark import PartitionSpec, Schema
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = (PartitionSpec.builder_for(Schema.from_spark(o.schema))
            .month("o_orderdate").build())
    t = catalog.create_table("db.sortedp", o, spec=spec)
    for i in range(2):
        t.append(o.filter(F.col("o_orderkey") % 2 == i))
    n = t.to_df().count()
    t.rewrite_data_files(target_size_bytes=64 * 1024 * 1024,
                         min_input_files=1, sort_by=["o_totalprice"])
    assert t.to_df().count() == n
    # within each output file, rows are sorted by the sort key
    for task in t.new_scan().plan_files():
        vals = [r.o_totalprice for r in
                spark.read.parquet(task.file.file_path)
                .select("o_totalprice").collect()]
        assert vals == sorted(vals)


def test_write_sort_by_property_sorts_every_append(catalog, spark, sf_dir):
    """write.sort-by table property: appends cluster rows without an
    explicit compaction (within-task sort -> per-file sorted runs and
    tight stats from the first write)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    t = catalog.create_table(
        "db.wsort", o, properties={"write.sort-by": "o_orderkey"})
    t.append(o.orderBy(F.rand(seed=3)).coalesce(2))
    for task in t.new_scan().plan_files():
        vals = [r.o_orderkey for r in
                spark.read.parquet(task.file.file_path)
                .select("o_orderkey").collect()]
        assert vals == sorted(vals)
