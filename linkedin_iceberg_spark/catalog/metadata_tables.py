"""Metadata tables: table internals queryable as DataFrames (S13).

ref: core/.../MetadataTableType.java:24-33 and the per-type classes
(SnapshotsTable, ManifestsTable, HistoryTable, PartitionsTable.java:30-106,
DataFilesTable, ManifestEntriesTable, AllDataFilesTable, AllManifestsTable,
AllEntriesTable).

Because our manifests and manifest lists ARE parquet files, the files/
entries/manifests tables are plain distributed ``spark.read.parquet`` scans
— no driver materialization, O(metadata) at any table size.  Snapshots and
history come from the (small) metadata JSON via ``createDataFrame``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_TABLES = (
    "snapshots", "history", "manifests", "files", "entries", "partitions",
    "all_manifests", "all_data_files", "all_entries", "refs", "changes",
    "data_files", "delete_files", "all_delete_files", "all_files",
    "metadata_log_entries", "position_deletes",
)

_SNAPSHOTS_SCHEMA = T.StructType([
    T.StructField("committed_at", T.TimestampType()),
    T.StructField("snapshot_id", T.LongType()),
    T.StructField("parent_id", T.LongType()),
    T.StructField("sequence_number", T.LongType()),
    T.StructField("operation", T.StringType()),
    T.StructField("manifest_list", T.StringType()),
    T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
])

_HISTORY_SCHEMA = T.StructType([
    T.StructField("made_current_at", T.TimestampType()),
    T.StructField("snapshot_id", T.LongType()),
    T.StructField("parent_id", T.LongType()),
    T.StructField("is_current_ancestor", T.BooleanType()),
])

_REFS_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("snapshot_id", T.LongType()),
])


def metadata_table(table, name: str) -> DataFrame:
    name = name.lower()
    if name not in METADATA_TABLES:
        raise ValueError(f"unknown metadata table {name!r}; "
                         f"one of {METADATA_TABLES}")
    return globals()[f"_{name}"](table)


def _snapshots(table) -> DataFrame:
    import datetime as dt
    rows = [(dt.datetime.fromtimestamp(s.timestamp_ms / 1000, dt.timezone.utc)
             .replace(tzinfo=None),
             s.snapshot_id, s.parent_snapshot_id, s.sequence_number,
             s.operation, s.manifest_list, dict(s.summary))
            for s in table.metadata.snapshots]
    return table.spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


def _history(table) -> DataFrame:
    import datetime as dt
    md = table.metadata
    ancestors = set(md.ancestry())
    rows = []
    for e in md.snapshot_log:
        snap = md.snapshot_by_id(e["snapshot-id"])
        rows.append((
            dt.datetime.fromtimestamp(e["timestamp-ms"] / 1000,
                                      dt.timezone.utc).replace(tzinfo=None),
            e["snapshot-id"],
            snap.parent_snapshot_id if snap else None,
            e["snapshot-id"] in ancestors,
        ))
    return table.spark.createDataFrame(rows, _HISTORY_SCHEMA)


def _refs(table) -> DataFrame:
    md = table.metadata
    rows = [("main", "branch", md.current_snapshot_id)] \
        if md.current_snapshot_id is not None else []
    rows += [(k, md.ref_types.get(k, "tag"), v)
             for k, v in md.refs.items()]
    return table.spark.createDataFrame(rows, _REFS_SCHEMA)


def _manifest_list_paths(table, snapshots=None) -> list:
    md = table.metadata
    snaps = snapshots if snapshots is not None else (
        [md.current_snapshot] if md.current_snapshot else [])
    return [table.ops.new_metadata_path(s.manifest_list) for s in snaps]


def _manifests(table, all_snapshots: bool = False) -> DataFrame:
    paths = _manifest_list_paths(
        table, table.metadata.snapshots if all_snapshots else None)
    if not paths:
        return _empty_from_parquet_schema(table, "manifest_list")
    df = table.spark.read.parquet(*paths)
    if all_snapshots:
        df = df.dropDuplicates(["manifest_path"])
    return df


def _entries_df(table, all_snapshots: bool = False) -> DataFrame:
    """Distributed read of the manifest parquet files themselves."""
    infos = _manifests(table, all_snapshots=all_snapshots) \
        .select("manifest_path").collect()  # O(#manifests), tiny
    if not infos:
        return _empty_from_parquet_schema(table, "manifest")
    paths = [table.ops.new_metadata_path(r.manifest_path) for r in infos]
    return table.spark.read.parquet(*paths)


def _entries(table) -> DataFrame:
    return _entries_df(table)


def _all_entries(table) -> DataFrame:
    return _entries_df(table, all_snapshots=True)


def _files(table) -> DataFrame:
    from linkedin_iceberg_spark.catalog.manifests import STATUS_DELETED
    return _entries_df(table).filter(F.col("status") != STATUS_DELETED)


def _all_data_files(table) -> DataFrame:
    from linkedin_iceberg_spark.catalog.manifests import STATUS_DELETED
    return (_entries_df(table, all_snapshots=True)
            .filter(F.col("status") != STATUS_DELETED)
            .dropDuplicates(["file_path"]))


def _all_manifests(table) -> DataFrame:
    return _manifests(table, all_snapshots=True)


def _data_files(table) -> DataFrame:
    """Live DATA files only (ref: MetadataTableType.DATA_FILES — the
    content=0 slice of `files`)."""
    from linkedin_iceberg_spark.catalog.manifests import CONTENT_DATA
    return _files(table).filter(F.col("content") == CONTENT_DATA)


def _delete_files(table) -> DataFrame:
    """Live position/equality DELETE files (ref:
    MetadataTableType.DELETE_FILES — content != 0)."""
    from linkedin_iceberg_spark.catalog.manifests import CONTENT_DATA
    return _files(table).filter(F.col("content") != CONTENT_DATA)


def _all_files(table) -> DataFrame:
    """Every live file reachable from ANY snapshot, data and deletes
    (ref: MetadataTableType.ALL_FILES)."""
    from linkedin_iceberg_spark.catalog.manifests import STATUS_DELETED
    return (_entries_df(table, all_snapshots=True)
            .filter(F.col("status") != STATUS_DELETED)
            .dropDuplicates(["file_path"]))


def _all_delete_files(table) -> DataFrame:
    from linkedin_iceberg_spark.catalog.manifests import CONTENT_DATA
    return _all_files(table).filter(F.col("content") != CONTENT_DATA)


def _metadata_log_entries(table) -> DataFrame:
    """The metadata-file log (ref: MetadataTableType.METADATA_LOG_ENTRIES
    / MetadataLogEntriesTable): one row per retained metadata.json
    version plus the current one — the audit trail of COMMITS (every
    snapshot, schema, spec, or property change writes one), each row
    enriched with that version's latest snapshot / schema / sequence
    (the reference columns).  Retained versions are small JSON files
    read driver-side — O(retention limit), metadata-sized by
    construction."""
    import json as _json
    import os as _os

    md = table.metadata
    rows = []
    for e in md.metadata_log:
        fname = e["metadata-file"]
        sid = schema_id = seq = None
        p = _os.path.join(table.location, "metadata", fname)
        try:
            with open(p) as fh:
                j = _json.load(fh)
            sid = j.get("current-snapshot-id")
            schema_id = j.get("current-schema-id")
            seq = j.get("last-sequence-number")
        except OSError:
            pass  # cleaned up by metadata-log retention: row stays
        rows.append((int(e["timestamp-ms"]), fname, sid, schema_id, seq))
    rows.append((int(md.last_updated_ms), "(current)",
                 md.current_snapshot_id, md.current_schema_id,
                 md.last_sequence_number))
    df = table.spark.createDataFrame(
        rows, "timestamp_ms long, file string, "
              "latest_snapshot_id long, latest_schema_id int, "
              "latest_sequence_number long")
    return df.select(
        F.timestamp_millis(F.col("timestamp_ms")).alias("timestamp"),
        "timestamp_ms", "file", "latest_snapshot_id",
        "latest_schema_id", "latest_sequence_number")


def _position_deletes(table) -> DataFrame:
    """The position-delete ROWS themselves (ref:
    MetadataTableType.POSITION_DELETES / PositionDeletesTable): one row
    per (data file_path, pos) tombstone across all live pos-delete
    files, tagged with the delete file that holds it.  A distributed
    parquet scan of the delete files — O(tombstones) executor work, the
    path list is metadata-sized."""
    from linkedin_iceberg_spark.catalog.deletes import POS_DELETE_SCHEMA
    from linkedin_iceberg_spark.catalog.manifests import (
        CONTENT_POSITION_DELETES)
    paths = [r.file_path for r in
             _files(table)
             .filter(F.col("content") == CONTENT_POSITION_DELETES)
             .select("file_path").collect()]
    if not paths:
        return table.spark.createDataFrame([], POS_DELETE_SCHEMA) \
            .withColumn("delete_file_path", F.lit("").cast("string"))
    return (table.spark.read.schema(POS_DELETE_SCHEMA).parquet(*paths)
            .withColumn("delete_file_path", F.input_file_name()))


def _partitions(table) -> DataFrame:
    """Per-partition record/file counts (ref: PartitionsTable.java:30-106)."""
    return (_files(table)
            .groupBy("partition")
            .agg(F.sum("record_count").alias("record_count"),
                 F.count("*").alias("file_count"),
                 F.sum("file_size_in_bytes").alias("total_size")))


def _empty_from_parquet_schema(table, kind: str) -> DataFrame:
    # no snapshot yet: derive the schema from an empty write shape
    from linkedin_iceberg_spark.catalog import manifests as M
    import pyarrow as pa
    schema = M._MANIFEST_LIST_SCHEMA if kind == "manifest_list" \
        else M._MANIFEST_SCHEMA
    empty = pa.table({n: [] for n in schema.names}, schema=schema)
    return table.spark.createDataFrame(empty.to_pandas())


def _changes(table) -> DataFrame:
    """Full-history row-level changelog as a relation: the CURRENT
    schema plus _change_type/_commit_snapshot_id, so SQL users join CDC
    against snapshots/history directly (SELECT ... FROM db.t.changes
    JOIN db.t.snapshots ON ...).  Bounded ranges stay on the API route
    (t.changes(from, to))."""
    return table.changes()
