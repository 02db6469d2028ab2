"""r10: reserved metadata columns on the LOCAL (Spark-free) read path —
scan.to_arrow(metadata_columns=True) carries _file/_pos with the same
ROW_POSITION contract as to_df(metadata_columns=True), exact for every
format because the local reader consumes whole files."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(params=["parquet", "orc"])
def tbl(request, catalog, spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(120)],
                               "id bigint, g bigint")
    t = catalog.create_table(
        f"db.localmeta_{request.param}", df,
        properties={"write.format-default": request.param})
    t.append(df.repartition(3))
    return t.refresh()


def test_file_and_pos_match_layout(tbl):
    out = tbl.new_scan().to_arrow(metadata_columns=True)
    assert out.schema.names[-2:] == ["_file", "_pos"]
    live = {e.data_file.file_path: e.data_file.record_count
            for e in tbl._live_data_and_deletes()[0]}
    rows = out.to_pylist()
    assert {r["_file"] for r in rows} == set(live)
    by_file = {}
    for r in rows:
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    for p, poss in by_file.items():
        assert sorted(poss) == list(range(live[p]))


def test_pos_original_after_position_deletes(tbl, spark):
    victim = tbl._live_data_and_deletes()[0][0].data_file.file_path
    n = next(e.data_file.record_count
             for e in tbl._live_data_and_deletes()[0]
             if e.data_file.file_path == victim)
    pos = spark.createDataFrame([(victim, p) for p in (0, 2)],
                                "file_path string, pos bigint")
    tbl.row_delta(position_deletes=pos)
    t = tbl.refresh()
    out = t.new_scan().to_arrow(metadata_columns=True).to_pylist()
    assert len(out) == 120 - 2
    vic = sorted(r["_pos"] for r in out if r["_file"] == victim)
    assert vic == [p for p in range(n) if p not in (0, 2)]   # gaps


def test_agrees_with_spark_path(tbl):
    local = sorted(
        (r["_file"], r["_pos"], r["id"]) for r in
        tbl.new_scan().to_arrow(metadata_columns=True).to_pylist())
    dist = sorted(
        (r["_file"], r["_pos"], r["id"]) for r in
        tbl.new_scan().to_df(metadata_columns=True).collect())
    assert local == dist


def test_default_shape_unchanged(tbl):
    out = tbl.new_scan().to_arrow()
    assert out.schema.names == ["id", "g"]
