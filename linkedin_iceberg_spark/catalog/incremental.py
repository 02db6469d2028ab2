"""Incremental scan: files appended between two snapshots
(ref: core/.../IncrementalDataTableScan.java:55-66, MicroBatches.java:41-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from linkedin_iceberg_spark.catalog import manifests as M


def appended_entries_between(table, from_snapshot_id: int,
                             to_snapshot_id: int) -> list:
    """Live ADDED entries committed in snapshots (from, to] along the
    ancestry chain."""
    md = table.metadata
    ancestry = md.ancestry(to_snapshot_id)
    if from_snapshot_id is not None and from_snapshot_id not in ancestry:
        raise ValueError(
            f"{from_snapshot_id} is not an ancestor of {to_snapshot_id}")
    wanted = []
    for sid in ancestry:
        if sid == from_snapshot_id:
            break
        snap = md.snapshot_by_id(sid)
        if snap.operation == "append":
            wanted.append(sid)
    wanted_set = set(wanted)
    entries = table._live_entries(snapshot=md.snapshot_by_id(to_snapshot_id))
    return [e for e in entries
            if e.status == M.STATUS_ADDED and e.snapshot_id in wanted_set]


def appends_between(table, from_snapshot_id: int,
                    to_snapshot_id: int) -> DataFrame:
    """DataFrame of rows appended in (from, to]."""
    entries = appended_entries_between(table, from_snapshot_id, to_snapshot_id)
    if not entries:
        return table.spark.createDataFrame([], table.schema.to_spark())
    return table._read_files(entries)


def appends_after(table, from_snapshot_id: int) -> DataFrame:
    cur = table.metadata.current_snapshot_id
    return appends_between(table, from_snapshot_id, cur)
