"""r9: reserved metadata columns on scans — the reference's
MetadataColumns plane (core/.../MetadataColumns.java:35-50, read tests
spark/.../data/TestSparkParquetReadMetadataColumns.java): ``_file`` is
the row's data file path and ``_pos`` its ORIGINAL position in that
file, stable under position-delete application."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tbl(catalog, spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(300)],
                               "id bigint, g bigint")
    t = catalog.create_table("db.mcols", df)
    t.append(df.repartition(4))
    return t.refresh()


def test_file_and_pos_match_physical_layout(tbl):
    got = tbl.new_scan().to_df(metadata_columns=True)
    rows = got.select("_file", "_pos", "id").collect()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in tbl._live_data_and_deletes()[0]}
    assert {r["_file"] for r in rows} == set(live)
    by_file = {}
    for r in rows:
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    for p, poss in by_file.items():
        assert sorted(poss) == list(range(live[p]))  # 0..n-1 per file


def test_pos_is_original_after_position_deletes(tbl, spark):
    entries, _ = tbl._live_data_and_deletes()
    victim = entries[0].data_file.file_path
    pos = spark.createDataFrame([(victim, p) for p in (0, 2, 5)],
                                "file_path string, pos bigint")
    tbl.row_delta(position_deletes=pos)
    t = tbl.refresh()
    got = t.new_scan().to_df(metadata_columns=True)
    vic_pos = sorted(r["_pos"] for r in
                     got.filter(F.col("_file") == victim).collect())
    n = next(e.data_file.record_count for e in
             t._live_data_and_deletes()[0]
             if e.data_file.file_path == victim)
    # original positions survive: 0,2,5 are GAPS, not a renumbering
    assert vic_pos == [p for p in range(n) if p not in (0, 2, 5)]
    assert got.count() == 300 - 3


def test_select_projects_metadata_columns(tbl):
    got = tbl.new_scan().select(["_file", "id"]) \
        .to_df(metadata_columns=True)
    assert got.columns == ["_file", "id"]
    assert got.count() == 300


def test_sql_exposes_metadata_columns(catalog, tbl):
    rows = catalog.sql(
        "SELECT _file, count(*) AS n FROM db.mcols GROUP BY _file"
    ).collect()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in tbl._live_data_and_deletes()[0]}
    assert {r["_file"]: r["n"] for r in rows} == live
    # _pos usable in WHERE; plain statements never grow extra columns
    first = catalog.sql(
        "SELECT id FROM db.mcols WHERE _pos = 0 ORDER BY id").collect()
    assert len(first) == len(live)
    plain = catalog.sql("SELECT * FROM db.mcols LIMIT 1")
    assert plain.columns == ["id", "g"]


def test_filter_composes_with_metadata_columns(tbl):
    from linkedin_iceberg_spark.expressions import gt
    got = tbl.new_scan().filter(gt("id", 290)) \
        .to_df(metadata_columns=True)
    assert got.count() == 9
    assert {c for c in got.columns} >= {"id", "g", "_file", "_pos"}
