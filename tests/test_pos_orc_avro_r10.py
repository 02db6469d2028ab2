"""r10: exact ``_pos`` + position deletes for ORC and Avro data files.

The reference's delete machinery is format-agnostic
(core/.../deletes/Deletes.java:60-127) and ROW_POSITION is a reserved
column for every format (MetadataColumns.java:35-50); Spark's native
``_metadata.row_index`` is parquet-only, so ORC/Avro route through the
whole-file pyarrow/codec readers whose per-file row counter is the same
number (sources/orc_spark.py, avro_spark.py)."""

import pytest
from pyspark.sql import functions as F


def _mk(catalog, spark, name, fmt, n=200):
    df = spark.createDataFrame([(i, i % 5, f"v{i}") for i in range(n)],
                               "id bigint, g bigint, s string")
    t = catalog.create_table(name, df,
                             properties={"write.format-default": fmt})
    t.append(df.repartition(3))
    return t.refresh(), df


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_pos_matches_physical_layout(catalog, spark, fmt):
    t, df = _mk(catalog, spark, f"db.pos_{fmt}", fmt)
    got = t.new_scan().to_df(metadata_columns=True)
    rows = got.select("_file", "_pos", "id").collect()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in t._live_data_and_deletes()[0]}
    assert {r["_file"] for r in rows} == set(live)
    by_file = {}
    for r in rows:
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    for p, poss in by_file.items():
        assert sorted(poss) == list(range(live[p]))   # exact 0..n-1
    assert got.count() == 200


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_position_deletes_apply_and_pos_is_original(catalog, spark, fmt):
    t, df = _mk(catalog, spark, f"db.posdel_{fmt}", fmt)
    entries, _ = t._live_data_and_deletes()
    victim = entries[0].data_file.file_path
    n = entries[0].data_file.record_count
    assert n > 6
    # the ids physically at positions 0,2,5 of the victim file
    pre = {r["_pos"]: r["id"] for r in
           t.new_scan().to_df(metadata_columns=True)
           .filter(F.col("_file") == victim).collect()}
    dead_ids = {pre[p] for p in (0, 2, 5)}
    pos = spark.createDataFrame([(victim, p) for p in (0, 2, 5)],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    t = t.refresh()
    got = t.new_scan().to_df(metadata_columns=True)
    assert got.count() == 200 - 3
    surviving_ids = {r["id"] for r in got.select("id").collect()}
    assert dead_ids.isdisjoint(surviving_ids)
    # original positions survive as GAPS, not a renumbering
    vic_pos = sorted(r["_pos"] for r in
                     got.filter(F.col("_file") == victim).collect())
    assert vic_pos == [p for p in range(n) if p not in (0, 2, 5)]


def test_mixed_format_table_pos_deletes(catalog, spark):
    """One table, parquet + ORC + Avro data files: _pos exact per file
    and one position-delete commit hits a file of EACH format."""
    df = spark.createDataFrame([(i, f"x{i}") for i in range(90)],
                               "id bigint, s string")
    t = catalog.create_table("db.posmix", df)
    t.append(df.filter(F.col("id") < 30).coalesce(1))          # parquet
    t = t.update_properties({"write.format-default": "orc"})
    t.append(df.filter((F.col("id") >= 30) & (F.col("id") < 60))
             .coalesce(1))                                     # orc
    t = t.update_properties({"write.format-default": "avro"})
    t.append(df.filter(F.col("id") >= 60).coalesce(1))         # avro
    t = t.refresh()
    entries, _ = t._live_data_and_deletes()
    by_fmt = {e.data_file.file_format: e.data_file.file_path
              for e in entries}
    assert set(by_fmt) == {"parquet", "orc", "avro"}

    got = t.new_scan().to_df(metadata_columns=True)
    assert got.count() == 90
    assert got.filter(F.col("_pos").isNull()).count() == 0

    # delete position 0 of each file — one commit, three formats
    pos = spark.createDataFrame([(p, 0) for p in by_fmt.values()],
                                "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    t = t.refresh()
    after = t.new_scan().to_df(metadata_columns=True)
    assert after.count() == 87
    assert after.filter(F.col("_pos") == 0).count() == 0
    # every file's remaining positions are the original ones minus 0
    for p in by_fmt.values():
        poss = sorted(r["_pos"] for r in
                      after.filter(F.col("_file") == p).collect())
        assert poss == list(range(1, 30))


def test_sql_metadata_columns_on_orc(catalog, spark):
    t, _ = _mk(catalog, spark, "db.pos_sql_orc", "orc")
    rows = catalog.sql(
        "SELECT _file, count(*) AS n, min(_pos) AS lo, max(_pos) AS hi "
        "FROM db.pos_sql_orc GROUP BY _file").collect()
    live = {e.data_file.file_path: e.data_file.record_count
            for e in t._live_data_and_deletes()[0]}
    assert {r["_file"]: r["n"] for r in rows} == live
    for r in rows:
        assert r["lo"] == 0 and r["hi"] == live[r["_file"]] - 1
