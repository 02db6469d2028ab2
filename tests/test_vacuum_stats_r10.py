"""r10: vacuum_stats — GC of the advisory file-skipping stores.

Store rows are keyed by immutable data-file path, so they never go
stale — but after compaction + snapshot expiry the dead paths linger in
every plan-time probe.  vacuum_stats drops rows no snapshot references;
rows for files still reachable by time travel are KEPT."""

import json
import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (
    analyze_dictionary,
    analyze_dictionary_pair,
)
from linkedin_iceberg_spark.catalog.maintenance import vacuum_stats
from linkedin_iceberg_spark.expressions import and_, eq


def _store_paths(t, sub):
    d = os.path.join(t.location, sub)
    spark = t.spark
    return {r["file_path"] for r in
            spark.read.parquet(d).select("file_path").collect()}


@pytest.fixture()
def tbl(catalog, spark):
    df = spark.createDataFrame([(i, i % 5, i % 3) for i in range(400)],
                               "id bigint, a bigint, b bigint")
    t = catalog.create_table("db.vstats", df)
    t.append(df.repartition(4))
    t = t.refresh()
    analyze_dictionary(t, "a")
    analyze_dictionary_pair(t, ["a", "b"])
    return t


def test_dead_rows_dropped_live_kept(tbl, spark):
    old_paths = {e.data_file.file_path
                 for e in tbl._live_data_and_deletes()[0]}
    tbl.rewrite_data_files(target_size_bytes=1 << 30, min_input_files=2)
    t = tbl.refresh()
    analyze_dictionary(t, "a")               # cover the new files too
    analyze_dictionary_pair(t, ["a", "b"])
    # old paths still time-travel-reachable: vacuum keeps everything
    pre = vacuum_stats(t)
    assert pre["rows_dropped"] == 0
    # expire history -> old paths referenced by nothing
    t.expire_snapshots(older_than_ms=int(__import__("time").time() * 1000)
                       + 1000, retain_last=1)
    t = t.refresh()
    out = vacuum_stats(t)
    assert out["rows_dropped"] > 0
    for sub in ("stats_dict", "stats_dict_pair"):
        got = _store_paths(t, os.path.join(
            sub, sorted(os.listdir(os.path.join(t.location, sub)))[0]))
        assert got.isdisjoint(old_paths)
        assert got  # live files' rows survived
    # idempotent
    again = vacuum_stats(t)
    assert again["rows_dropped"] == 0
    # pruning still works from the vacuumed stores
    n = len(t.new_scan().filter(and_(eq("a", 1), eq("b", 1)))
            .plan_files())
    assert n >= 1
    got = t.new_scan().filter(and_(eq("a", 1), eq("b", 1))).to_df()
    assert got.count() == sum(1 for i in range(400)
                              if i % 5 == 1 and i % 3 == 1)


def test_dry_run_touches_nothing(tbl, spark):
    tbl.rewrite_data_files(target_size_bytes=1 << 30, min_input_files=2)
    t = tbl.refresh()
    t.expire_snapshots(older_than_ms=int(__import__("time").time() * 1000)
                       + 1000, retain_last=1)
    t = t.refresh()
    d = os.path.join(t.location, "stats_dict")
    sub = os.path.join(d, sorted(os.listdir(d))[0])
    before = _store_paths(t, os.path.relpath(sub, t.location))
    out = vacuum_stats(t, dry_run=True)
    assert out["rows_dropped"] > 0 and out["dry_run"]
    assert _store_paths(t, os.path.relpath(sub, t.location)) == before


def test_call_surface(catalog, spark, tbl):
    tbl.rewrite_data_files(target_size_bytes=1 << 30, min_input_files=2)
    t = tbl.refresh()
    t.expire_snapshots(older_than_ms=int(__import__("time").time() * 1000)
                       + 1000, retain_last=1)
    row = catalog.sql("CALL vacuum_stats('db.vstats')").head()
    assert json.loads(row["detail"])["rows_dropped"] > 0
