"""r7: the batch Python DataSource (spark.read.format("linkedin_iceberg"))
— the Python-DataSource analog of the reference's DataSourceV2 read
integration (spark3/.../source/IcebergSource.java): planned tasks as
input partitions, deletes applied, schema-evolution alignment, filter
pushdown pruning at plan time."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.sources.batch_source import read_table


def _sorted(rows):
    return sorted(map(tuple, rows))


@pytest.fixture()
def laden(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bsrc", orders)
    t.append(orders)
    entries, _ = t._live_data_and_deletes()
    some_file = entries[0].data_file.file_path
    pos = spark.createDataFrame([(some_file, i) for i in range(10)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    keys = spark.createDataFrame([(k,) for k in range(50, 80)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])
    return t


def test_matches_to_df_with_deletes(laden, spark):
    df = read_table(spark, laden)
    assert _sorted(df.collect()) == _sorted(laden.to_df().collect())
    assert df.schema == laden.to_df().schema


def test_snapshot_and_ref_travel(laden, spark):
    first = laden.metadata.snapshots[0].snapshot_id
    laden.create_tag("v1", snapshot_id=first)
    via_sid = read_table(spark, laden, snapshot_id=first)
    via_ref = read_table(spark, laden, ref="v1")
    want = _sorted(laden.new_scan().use_snapshot(first).to_df().collect())
    assert _sorted(via_sid.collect()) == want
    assert _sorted(via_ref.collect()) == want


def test_filter_pushdown_prunes_partitions(catalog, spark, sf_dir):
    from linkedin_iceberg_spark import PartitionSpec, Schema
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.bsrc_p", orders, spec=spec)
    t.append(orders)
    n_live = len(t._live_data_and_deletes()[0])

    df = read_table(spark, t).filter(
        F.col("o_orderdate") >= "1997-06-01")
    got = _sorted((r.o_orderkey,) for r in df.collect())
    want = _sorted((r.o_orderkey,) for r in t.to_df().filter(
        F.col("o_orderdate") >= "1997-06-01").collect())
    assert got == want
    # plan-time pruning: fewer input partitions than live files.
    # inputFiles() is parquet-only, so count the RDD partitions the
    # pushed plan produces
    assert df.rdd.getNumPartitions() < n_live


def test_schema_evolution_alignment(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bsrc_e", orders)
    t.append(orders.limit(20))
    t.update_schema().rename_column("o_totalprice", "price") \
        .add_column("note", "string").commit()
    t.refresh()
    df = read_table(spark, t)
    want = t.to_df()
    assert _sorted(df.collect()) == _sorted(want.collect())
    assert "price" in df.columns and "note" in df.columns
    assert df.filter("note IS NOT NULL").count() == 0


def test_empty_table(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bsrc_0", orders)
    df = read_table(spark, t)
    assert df.count() == 0
    assert df.schema == t.schema.to_spark()


def test_write_append_and_overwrite(catalog, spark, sf_dir):
    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bw", orders)
    t.append(orders.limit(100))
    register_batch_source(spark)

    orders.limit(40).write.format("linkedin_iceberg") \
        .option("location", t.location).mode("append").save()
    t.refresh()
    assert t.to_df().count() == 140
    assert t.metadata.current_snapshot.operation == "append"
    # stats flow into planning: a selective engine filter prunes
    from linkedin_iceberg_spark.expressions import lt
    assert len(t.new_scan().filter(
        lt("o_orderkey", -1)).plan_files()) == 0

    orders.limit(7).write.format("linkedin_iceberg") \
        .option("location", t.location).mode("overwrite").save()
    t.refresh()
    assert t.to_df().count() == 7
    assert t.metadata.current_snapshot.operation == "overwrite"
    # time travel still sees the pre-overwrite rows
    prev = t.metadata.snapshots[-2].snapshot_id
    assert t.new_scan().use_snapshot(prev).to_df().count() == 140


def test_write_transform_partitioned(catalog, spark, sf_dir):
    """month()/bucket() specs write through the format: the worker
    computes partition values with the ENGINE's transform objects, so
    the committed entries prune exactly like table.append's."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import and_, gt_eq, lt
    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    register_batch_source(spark)

    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").bucket("o_orderkey", 4).build()
    tp = catalog.create_table("db.bw_p", orders, spec=spec)
    orders.write.format("linkedin_iceberg") \
        .option("location", tp.location).mode("append").save()
    tp.refresh()
    assert tp.to_df().count() == orders.count()
    # identical rows AND identical partition tuples to the native path
    tn = catalog.create_table("db.bw_pn", orders, spec=spec)
    tn.append(orders)
    def ptuples(t):
        return sorted((e.data_file.partition["o_orderdate_month"],
                       e.data_file.partition["o_orderkey_bucket"],
                       e.data_file.record_count)
                      for e in t._live_data_and_deletes()[0])
    assert ptuples(tp) == ptuples(tn)
    # month pruning works on the format-written files
    f = and_(gt_eq("o_orderdate", "1997-06-01"),
             lt("o_orderdate", "1997-08-01"))
    pruned = tp.new_scan().filter(f).plan_files()
    assert 0 < len(pruned) < len(tp._live_data_and_deletes()[0])


def test_write_rejects_bad_schema(catalog, spark, sf_dir):
    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    register_batch_source(spark)

    tu = catalog.create_table("db.bw_s", orders)
    with pytest.raises(Exception, match="does not match table schema"):
        orders.limit(5).selectExpr("o_orderkey", "o_totalprice") \
            .write.format("linkedin_iceberg") \
            .option("location", tu.location).mode("append").save()
    # nothing staged leaked into the table dir's data/
    tu.refresh()
    assert tu.to_df().count() == 0


def test_stream_writer_exactly_once(catalog, spark, tmp_path):
    """writeStream.format("linkedin_iceberg"): one snapshot per epoch
    stamped with the sink's (query, epoch) summary keys; a replayed
    epoch commits nothing twice."""
    import time

    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source, _TableStreamWriter, _FileCommit)
    from linkedin_iceberg_spark.streaming.sink import EPOCH_KEY

    catalog.sql("CREATE TABLE db.sw (v BIGINT) USING iceberg")
    t = catalog.load_table("db.sw")
    register_batch_source(spark)

    src = str(tmp_path / "in")
    spark.range(5).selectExpr("id AS v").write.mode("overwrite") \
        .parquet(src)
    q = (spark.readStream.schema("v long").parquet(src)
         .writeStream.format("linkedin_iceberg")
         .option("location", t.location)
         .option("queryid", "swtest")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    t.refresh()
    assert t.to_df().count() == 5
    snap = t.metadata.current_snapshot
    assert snap.summary.get(EPOCH_KEY) == "0"
    assert snap.summary.get("streaming-query-id") == "swtest"

    # replay the SAME epoch manually: recognized, nothing re-commits
    w = _TableStreamWriter({"location": t.location, "queryid": "swtest"})
    w.commit([_FileCommit([])], batchId=0)
    t.refresh()
    assert t.to_df().count() == 5
    assert len(t.metadata.snapshots) == 1


def test_write_identity_partitioned(catalog, spark, sf_dir):
    """Identity-partitioned writes through the format: each task splits
    its batches per partition value, every staged file is single-
    partition, and the committed entries prune by partition."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.expressions import eq
    from linkedin_iceberg_spark.sources.batch_source import (
        read_table, register_batch_source)

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .identity("o_orderpriority").build()
    t = catalog.create_table("db.bw_id", orders, spec=spec)
    register_batch_source(spark)
    orders.limit(200).write.format("linkedin_iceberg") \
        .option("location", t.location).mode("append").save()
    t.refresh()
    assert t.to_df().count() == 200
    # per-file partition purity + partition pruning
    entries, _ = t._live_data_and_deletes()
    assert all(e.data_file.partition.get("o_orderpriority") is not None
               for e in entries)
    urgent = orders.limit(200).filter(
        "o_orderpriority = '1-URGENT'").count()
    pruned = t.new_scan().filter(
        eq("o_orderpriority", "1-URGENT")).plan_files()
    assert len(pruned) < len(entries)
    assert sum(e.file.record_count for e in pruned) == urgent
    # round-trip read through the source sees everything
    assert read_table(spark, t).count() == 200


def test_transform_column_matches_scalar_reference():
    """The writer's vectorized partition kernels are byte-identical to
    the engine's scalar Transform.apply across types, NULLs, and
    pre-1970 values."""
    import datetime

    import pyarrow as pa

    from linkedin_iceberg_spark.sources.batch_source import (
        _transform_column)
    from linkedin_iceberg_spark.transforms.transforms import (
        parse_transform)

    ts = [datetime.datetime(1997, 7, 27, 13, 5),
          datetime.datetime(1969, 12, 31, 23, 59),
          datetime.datetime(1970, 1, 1), None,
          datetime.datetime(2034, 2, 28, 1, 2, 3)]
    dates = [datetime.date(1997, 7, 27), datetime.date(1969, 6, 1),
             None, datetime.date(1970, 1, 1)]
    longs = [0, -17, 12345, None, 2**40]
    strs = ["abcdef", "", None, "xy"]

    cases = [
        ("year", pa.array(ts), "timestamp"),
        ("month", pa.array(ts), "timestamp"),
        ("day", pa.array(ts), "timestamp"),
        ("hour", pa.array(ts), "timestamp"),
        ("year", pa.array(dates), "date"),
        ("month", pa.array(dates), "date"),
        ("day", pa.array(dates), "date"),
        ("bucket[7]", pa.array(longs, type=pa.int64()), "long"),
        ("bucket[7]", pa.array(strs), "string"),
        ("bucket[7]", pa.array(ts), "timestamp"),
        ("truncate[10]", pa.array(longs, type=pa.int64()), "long"),
        ("truncate[3]", pa.array(strs), "string"),
    ]
    for tstr, arr, stype in cases:
        got = _transform_column(pa.chunked_array([arr]), tstr,
                                stype).to_pylist()
        tr = parse_transform(tstr, stype)
        want = [None if v is None else tr.apply(v)
                for v in arr.to_pylist()]
        assert got == want, (tstr, stype, got, want)


def test_read_avro_table(catalog, spark, sf_dir):
    """Avro data files read through the format too: the pure-Python
    codec rides the shipped package in the worker (the one non-pyarrow
    read path)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    t = catalog.create_table(
        "db.bav", orders,
        properties={"write.format-default": "avro"})
    t.append(orders.limit(60))
    entries, _ = t._live_data_and_deletes()
    assert all(e.data_file.file_format == "avro" for e in entries)
    df = read_table(spark, t)
    assert _sorted(df.collect()) == _sorted(t.to_df().collect())
    assert df.count() == 60


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_fuzz_read_matches_to_df(catalog, spark, sf_dir, seed):
    """Seeded fuzz: after a random sequence of appends, row-level
    deletes, CoW deletes, and schema evolution, the DataSource read is
    row-identical to the engine read."""
    import random

    rng = random.Random(seed)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_custkey", "o_totalprice",
                "o_orderpriority")
    t = catalog.create_table(f"db.fz{seed}", orders)
    t.append(orders.limit(300))
    renamed = False
    for step in range(5):
        op = rng.choice(["append", "eq_delete", "pos_delete",
                         "cow_delete", "evolve"])
        if op == "append":
            t.append(t.to_df().limit(rng.randint(1, 40)))
        elif op == "eq_delete":
            lo = rng.randint(0, 1000)
            keys = spark.createDataFrame(
                [(k,) for k in range(lo, lo + 30)], "o_orderkey bigint")
            t.row_delta(equality_delete_keys=keys,
                        key_cols=["o_orderkey"])
        elif op == "pos_delete":
            entries, _ = t._live_data_and_deletes()
            f = rng.choice(entries).data_file
            n = max(1, min(5, f.record_count))
            pos = spark.createDataFrame(
                [(f.file_path, i) for i in range(n)],
                "file_path string, pos bigint")
            t.row_delta(position_deletes=pos)
        elif op == "cow_delete":
            from linkedin_iceberg_spark.expressions import lt
            t.delete_where(lt("o_custkey", rng.randint(1, 50)))
        elif op == "evolve" and not renamed:
            t.update_schema() \
                .rename_column("o_totalprice", "price") \
                .add_column(f"note{step}", "string").commit()
            renamed = True
        t.refresh()
        got = _sorted(read_table(spark, t).collect())
        want = _sorted(t.to_df().collect())
        assert got == want, f"seed={seed} step={step} op={op}"


def test_write_honors_declared_sort_order(catalog, spark, sf_dir):
    """WRITE ORDERED BY clusters rows inside each staged file (tight
    row-group stats); zorder write orders stay with table.append."""
    import pyarrow.parquet as pq

    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source)

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bw_o", orders)
    catalog.sql("ALTER TABLE db.bw_o WRITE ORDERED BY (o_totalprice)")
    t.refresh()
    register_batch_source(spark)
    orders.limit(300).write.format("linkedin_iceberg") \
        .option("location", t.location).mode("append").save()
    t.refresh()
    assert sorted(map(tuple, t.to_df().collect())) == \
        sorted(map(tuple, orders.limit(300).collect()))
    for e in t._live_data_and_deletes()[0]:
        vals = pq.read_table(e.data_file.file_path,
                             columns=["o_totalprice"]) \
            .column(0).to_pylist()
        assert vals == sorted(vals)


def test_stream_read_same_format_name(catalog, spark, sf_dir, tmp_path):
    """readStream.format("linkedin_iceberg") works too — one format
    name across batch read/write and stream read/write."""
    from linkedin_iceberg_spark.sources.batch_source import (
        register_batch_source)

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.bsr", orders)
    t.append(orders.limit(30))
    register_batch_source(spark)
    q = (spark.readStream.format("linkedin_iceberg")
         .option("location", t.location)
         .schema(t.schema.to_spark()).load()
         .writeStream.format("memory").queryName("bsr_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) AS n FROM bsr_out").head().n == 30


def test_nested_struct_evolution_alignment(catalog, spark):
    """r8: nested-struct evolution reads correctly through the DSv2
    source — field-id alignment recurses into structs and arrays (the
    same kernel local_read/to_df use), not a flat positional cast."""
    from pyspark.sql import Row
    df = spark.createDataFrame(
        [Row(id=1, info=Row(a=10, b="x"), tags=[Row(k="t1", w=1)]),
         Row(id=2, info=Row(a=20, b="y"), tags=[Row(k="t2", w=2)]),
         Row(id=3, info=None, tags=None)],
        "id long, info struct<a int, b string>, "
        "tags array<struct<k string, w int>>")
    t = catalog.create_table("db.bsrc_nested", df)
    t.append(df)
    (t.update_schema()
     .rename_column("info.a", "alpha")
     .add_column("info.note", "string")
     .delete_column("info.b")
     .update_column("info.a", "long")
     .rename_column("tags.k", "key")
     .commit())
    t.refresh()
    # append a second generation under the NEW schema
    t.append(spark.createDataFrame(
        [Row(id=4, info=Row(alpha=40, note="n"), tags=[Row(key="t4", w=4)])],
        t.schema.to_spark()))
    got = read_table(spark, t)
    want = t.to_df()
    assert got.schema == want.schema
    assert _sorted(got.collect()) == _sorted(want.collect())
    out = {r.id: r for r in got.collect()}
    assert out[1].info.alpha == 10 and out[1].info.note is None
    assert out[3].info is None
    assert out[4].info.note == "n" and out[4].tags[0].key == "t4"
    assert out[1].tags[0].key == "t1"


def test_incremental_scan_options(spark, catalog, sf_dir):
    """start/end_snapshot_id read options (ref: spark/.../
    TestDataSourceOptions testIncrementalScanOptions): rows APPENDED in
    (start, end], append-only semantics, composing with pushed
    filters."""
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.inc", o)
    t.append(o.filter(F.col("o_orderkey") % 3 == 0))
    s1 = t.refresh().metadata.current_snapshot_id
    t = t.refresh()
    t.append(o.filter(F.col("o_orderkey") % 3 == 1))
    s2 = t.refresh().metadata.current_snapshot_id
    t = t.refresh()
    t.append(o.filter(F.col("o_orderkey") % 3 == 2))
    t = t.refresh()
    got = read_table(spark, t, start_snapshot_id=s1,
                     end_snapshot_id=s2)
    assert got.count() == o.filter(F.col("o_orderkey") % 3 == 1).count()
    got2 = read_table(spark, t, start_snapshot_id=s1)
    assert got2.count() == \
        o.filter(F.col("o_orderkey") % 3 != 0).count()
    lo = int(o.agg(F.expr("percentile(o_totalprice, 0.5)")).head()[0])
    got3 = read_table(spark, t, start_snapshot_id=s1) \
        .filter(F.col("o_totalprice") > lo)
    assert got3.count() == o.filter(
        (F.col("o_orderkey") % 3 != 0) &
        (F.col("o_totalprice") > lo)).count()
    with pytest.raises(Exception):
        read_table(spark, t, snapshot_id=s1,
                   start_snapshot_id=s1).count()
    with pytest.raises(Exception):
        read_table(spark, t, end_snapshot_id=s2).count()


def test_snapshot_property_write_option(spark, catalog, sf_dir):
    """snapshotproperty.* write options land in the snapshot summary
    (ref: spark/.../TestDataSourceOptions testExtraSnapshotMetadata) —
    on append AND on overwrite commits."""
    from linkedin_iceberg_spark.sources.batch_source import (
        SOURCE_NAME, register_batch_source)
    register_batch_source(spark)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.props", o)
    (o.limit(50).write.format(SOURCE_NAME)
     .option("location", t.location)
     .option("snapshotproperty.ingest-job", "nightly-42")
     .option("snapshotproperty.source", "kafka")
     .mode("append").save())
    summ = t.refresh().metadata.current_snapshot.summary
    assert summ.get("ingest-job") == "nightly-42"
    assert summ.get("source") == "kafka"
    assert summ.get("added-records") == "50"  # system keys win
    (o.limit(20).write.format(SOURCE_NAME)
     .option("location", t.location)
     .option("snapshotproperty.reload", "full")
     .mode("overwrite").save())
    t = t.refresh()
    summ = t.metadata.current_snapshot.summary
    assert summ.get("reload") == "full"
    assert t.to_df().count() == 20


def test_split_size_read_options(spark, catalog, sf_dir):
    """split-size / file-open-cost read options control input-partition
    packing (ref: spark/.../TestDataSourceOptions.java:178,290): a tiny
    split-size yields ~one partition per file, a huge one packs all
    files together — results identical either way."""
    from linkedin_iceberg_spark.sources.batch_source import (
        SOURCE_NAME, register_batch_source)
    register_batch_source(spark)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.splitopt", o)
    t.append(o.repartition(6))
    t = t.refresh()
    n_files = len(t._live_data_and_deletes()[0])
    assert n_files >= 6

    def load(**opts):
        r = spark.read.format(SOURCE_NAME).option("location", t.location)
        for k, v in opts.items():
            r = r.option(k.replace("_", "-"), str(v))
        return r.load()

    tiny = load(split_size=1)
    assert tiny.rdd.getNumPartitions() == n_files
    big = load(split_size=1 << 40)
    assert big.rdd.getNumPartitions() == 1
    # open-cost floor: with a cost of half the split size, at most two
    # (weight-2x) files fit per pack
    floored = load(split_size=1 << 20, file_open_cost=1 << 19)
    assert floored.rdd.getNumPartitions() >= (n_files + 1) // 2
    assert _sorted(tiny.collect()) == _sorted(big.collect()) \
        == _sorted(t.to_df().collect())
    with pytest.raises(Exception):
        load(split_size=0).count()


def test_write_format_option(spark, catalog, sf_dir):
    """write-format option overrides write.format.default (ref:
    spark/.../TestDataSourceOptions.java:78): orc and avro staged files
    commit with correct formats, stats, and round-trip through every
    read path."""
    from linkedin_iceberg_spark.sources.batch_source import (
        SOURCE_NAME, register_batch_source)
    register_batch_source(spark)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    t = catalog.create_table("db.wfmt", o)
    (o.limit(40).write.format(SOURCE_NAME)
     .option("location", t.location)
     .option("write-format", "orc").mode("append").save())
    t = t.refresh()
    entries, _ = t._live_data_and_deletes()
    assert {e.data_file.file_format for e in entries} == {"orc"}
    assert t.to_df().count() == 40
    (o.limit(25).write.format(SOURCE_NAME)
     .option("location", t.location)
     .option("write-format", "avro").mode("append").save())
    t = t.refresh()
    entries, _ = t._live_data_and_deletes()
    assert {e.data_file.file_format for e in entries} == {"orc", "avro"}
    assert sum(e.data_file.record_count for e in entries) == 65
    assert t.to_df().count() == 65
    # the DataSource read path handles the mixed-format table too
    assert read_table(spark, t).count() == 65
    # table property default honored when no option is given
    t.update_properties(set_props={"write.format.default": "orc"})
    t = t.refresh()
    (o.limit(5).write.format(SOURCE_NAME)
     .option("location", t.location).mode("append").save())
    t = t.refresh()
    entries, _ = t._live_data_and_deletes()
    assert sorted(e.data_file.file_format for e in entries).count("orc") \
        >= 2
    assert t.to_df().count() == 70
    with pytest.raises(Exception):
        (o.limit(1).write.format(SOURCE_NAME)
         .option("location", t.location)
         .option("write-format", "csv").mode("append").save())


def test_reference_hyphenated_option_spellings(spark, catalog, sf_dir):
    """The reference's option names are hyphenated (snapshot-id,
    start-snapshot-id, end-snapshot-id, as-of-timestamp — ref:
    TestDataSourceOptions.java:206-290): both spellings must work."""
    from linkedin_iceberg_spark.sources.batch_source import (
        SOURCE_NAME, register_batch_source)
    register_batch_source(spark)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table("db.hyph", o)
    t.append(o.filter("o_orderkey <= 100"))
    t = t.refresh()
    s1 = t.metadata.current_snapshot_id
    ts1 = t.metadata.current_snapshot.timestamp_ms
    t.append(o.filter("o_orderkey > 100 AND o_orderkey <= 160"))
    t = t.refresh()
    s2 = t.metadata.current_snapshot_id

    def load(**opts):
        r = spark.read.format(SOURCE_NAME).option("location", t.location)
        for k, v in opts.items():
            r = r.option(k, str(v))
        return r.load()

    n1 = o.filter("o_orderkey <= 100").count()
    n2 = o.filter("o_orderkey > 100 AND o_orderkey <= 160").count()
    assert load(**{"snapshot-id": s1}).count() == n1
    assert load(**{"as-of-timestamp": ts1}).count() == n1
    assert load(**{"start-snapshot-id": s1,
                   "end-snapshot-id": s2}).count() == n2
    with pytest.raises(Exception):
        load(**{"end-snapshot-id": s2}).count()
    with pytest.raises(Exception):
        load(**{"snapshot-id": s1, "start-snapshot-id": s1}).count()
