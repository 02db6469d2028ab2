"""r10: reserved metadata columns on the Python DataSource surface —
spark.read.format("linkedin_iceberg").option("metadata-columns", "true")
appends _file/_pos with the ROW_POSITION contract (exact per file,
attached before delete masks), matching SparkBatchScan's metadata-column
support in the reference."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.sources.batch_source import (
    SOURCE_NAME,
    register_batch_source,
)


@pytest.fixture()
def tbl(catalog, spark):
    register_batch_source(spark)
    df = spark.createDataFrame([(i, i % 4) for i in range(200)],
                               "id bigint, g bigint")
    t = catalog.create_table("db.dsmeta", df)
    t.append(df.repartition(3))
    return t.refresh()


def _read(spark, t, **opts):
    r = (spark.read.format(SOURCE_NAME)
         .option("location", t.location)
         .option("metadata-columns", "true"))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pos_matches_layout(tbl, spark):
    got = _read(spark, tbl)
    assert got.columns == ["id", "g", "_file", "_pos"]
    rows = got.collect()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in tbl._live_data_and_deletes()[0]}
    assert {r["_file"] for r in rows} == set(live)
    by_file = {}
    for r in rows:
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    for p, poss in by_file.items():
        assert sorted(poss) == list(range(live[p]))


def test_pos_original_after_deletes_and_filters_push(tbl, spark):
    victim = tbl._live_data_and_deletes()[0][0].data_file.file_path
    n = next(e.data_file.record_count
             for e in tbl._live_data_and_deletes()[0]
             if e.data_file.file_path == victim)
    pos = spark.createDataFrame([(victim, p) for p in (0, 4)],
                                "file_path string, pos bigint")
    tbl.row_delta(position_deletes=pos)
    t = tbl.refresh()
    got = _read(spark, t)
    assert got.count() == 198
    vic = sorted(r["_pos"] for r in
                 got.filter(F.col("_file") == victim).collect())
    assert vic == [p for p in range(n) if p not in (0, 4)]
    # a filter on a METADATA column must not break engine planning
    # (it is re-applied row-level, never pushed into the scan)
    assert got.filter(F.col("_pos") == 0).count() == \
        len(set(r["_file"] for r in got.collect())) - 1
    # mixed schema + metadata filter
    mixed = got.filter((F.col("id") > 100) & (F.col("_pos") >= 0))
    assert mixed.count() == \
        got.filter(F.col("id") > 100).count()


def test_mixed_formats_pos_and_deletes_compose(catalog, spark):
    """The two r10 features compose: a parquet+ORC+Avro table read
    through the DataSource with metadata-columns carries exact per-file
    _pos for EVERY format, and a position delete on the ORC file leaves
    gaps instead of renumbering."""
    register_batch_source(spark)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(90)],
                               "id bigint, s string")
    t = catalog.create_table("db.dsmetafmt", df)
    t.append(df.filter("id < 30").coalesce(1))          # parquet
    t.update_properties(set_props={"write.format-default": "orc"})
    t = t.refresh()
    t.append(df.filter("id >= 30 and id < 60").coalesce(1))
    t.update_properties(set_props={"write.format-default": "avro"})
    t = t.refresh()
    t.append(df.filter("id >= 60").coalesce(1))
    t = t.refresh()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in t._live_data_and_deletes()[0]}
    assert {p.rsplit(".", 1)[-1] for p in live} == \
        {"parquet", "orc", "avro"}
    got = _read(spark, t)
    by_file = {}
    for r in got.collect():
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    for p, poss in by_file.items():
        assert sorted(poss) == list(range(live[p])), p
    orc_file = next(p for p in live if p.endswith(".orc"))
    pos = spark.createDataFrame([(orc_file, p) for p in (0, 3)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    t = t.refresh()
    got = _read(spark, t)
    assert got.count() == 88
    vic = sorted(r["_pos"] for r in
                 got.filter(F.col("_file") == orc_file).collect())
    assert vic == [p for p in range(live[orc_file])
                   if p not in (0, 3)]


def test_default_read_unchanged(tbl, spark):
    got = (spark.read.format(SOURCE_NAME)
           .option("location", tbl.location).load())
    assert got.columns == ["id", "g"]
    assert got.count() == 200
