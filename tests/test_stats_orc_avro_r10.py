"""r10: stats-plane BUILDS are format-agnostic.

column_source (and the pair/sample sources) route ORC/Avro data files
through the whole-file readers (sources/orc_spark.py, avro_spark.py)
instead of spark.read.parquet, so ANALYZE and stats.auto work on any
write format — dictionaries, histograms, KMV, bloom, pair hashes, and
the position-hashed sample plane all build and prune correctly over a
mixed parquet+ORC+Avro table."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (
    analyze_dictionary,
    analyze_dictionary_pair,
    analyze_histogram,
    analyze_table_kmv,
)
from linkedin_iceberg_spark.expressions import and_, eq


@pytest.fixture()
def tbl(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 5, i % 3, i % 97) for i in range(450)],
        "id bigint, a bigint, b bigint, x bigint")
    t = catalog.create_table("db.fmtstats", df)
    t.append(df.filter("a < 2").coalesce(1))                 # parquet
    t.update_properties(set_props={"write.format-default": "orc"})
    t = t.refresh()
    t.append(df.filter("a = 2").coalesce(1))                 # orc
    t.update_properties(set_props={"write.format-default": "avro"})
    t = t.refresh()
    t.append(df.filter("a > 2").coalesce(1))                 # avro
    t = t.refresh()
    fmts = {e.data_file.file_path.rsplit(".", 1)[-1]
            for e in t._live_data_and_deletes()[0]}
    assert fmts == {"parquet", "orc", "avro"}
    return t


def test_dictionary_builds_and_prunes_all_formats(tbl):
    assert analyze_dictionary(tbl, "a") == 3
    tasks = tbl.new_scan().filter(eq("a", 2)).plan_files()
    assert len(tasks) == 1 and tasks[0].file.file_path.endswith(".orc")
    got = tbl.new_scan().filter(eq("a", 2)).to_df().count()
    assert got == 90


def test_histogram_folds_all_formats(tbl):
    from linkedin_iceberg_spark.catalog.analyze import (
        histogram_covers, histogram_fold)
    assert analyze_histogram(tbl, "a") == 3
    assert histogram_covers(tbl, "a")
    live = [e.data_file.file_path
            for e in tbl._live_data_and_deletes()[0]]
    folded, covered = histogram_fold(tbl, "a", live)
    assert covered == set(live)
    want = {i: 90 for i in range(5)}
    assert {k: v for k, v in folded.items() if k is not None} == want


def test_kmv_estimates_all_formats(tbl, spark):
    out = analyze_table_kmv(tbl, ["x"])
    assert out["x"] == 3
    est = tbl.new_scan().approx_ndv("x")
    assert abs(est - 97) <= 5      # merge-exact bottom-k, tiny corpus


def test_pair_hashes_all_formats(catalog, spark):
    a = spark.createDataFrame([(1, 2), (2, 1)], "a bigint, b bigint")
    b = spark.createDataFrame([(1, 1)], "a bigint, b bigint")
    t = catalog.create_table("db.fmtpair", a,
                             properties={"write.format-default": "orc"})
    t.append(a.coalesce(1))                                  # orc
    t.update_properties(set_props={"write.format-default": "avro"})
    t = t.refresh()
    t.append(b.coalesce(1))                                  # avro
    t = t.refresh()
    assert analyze_dictionary_pair(t, ["a", "b"]) == 2
    tasks = t.new_scan().filter(and_(eq("a", 1), eq("b", 1))) \
        .plan_files()
    assert len(tasks) == 1 and tasks[0].file.file_path.endswith(".avro")
    got = t.new_scan().filter(and_(eq("a", 1), eq("b", 1))) \
        .to_df().collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 1)]
