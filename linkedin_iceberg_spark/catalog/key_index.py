"""Secondary key index: file-level point-lookup acceleration for
high-cardinality NON-partition keys.

Partition pruning and min/max file skipping stop helping when a key is
high-cardinality and uncorrelated with file layout: every file's bound
range covers the probe key and a point lookup degenerates to a full
scan.  The reference leaves this to clustering (sort the table on the
key, W6); this index is the complementary structure for keys you cannot
afford to recluster on — "fetch document N out of 100 TB".

Layout: one distributed pass builds ``(key, file_path)`` DISTINCT pairs,
range-partitioned and sorted by key, written as parquet under
``<table location>/index/<col>/``.  Each index file covers a tight,
non-overlapping key band, so a lookup reads O(1) index files (Spark
pushes the key predicate to the index parquet scan) and then plans a
read over only the matching DATA files.  Index size is O(rows) but ~2
small columns — ~1/1000 of table bytes at TPC-H widths.

Freshness: the index records the snapshot id it was built at.  Lookups
on a moved-on table consult the index for files that existed THEN and
fold the since-build history over the hits: files appended SINCE are
candidates unconditionally (append-only catch-up, no rebuild;
``refresh_key_index`` folds the tail in), and COMPACTION survives too —
a ``replace`` commit preserves every live row, so hits on rewritten
files remap to that commit's added files (lookup-time chase; rebuild to
re-tighten after heavy compaction).  Row-CHANGING commits
(delete/overwrite) may introduce rows from files the index never saw,
so they still make the index unusable — lookups raise and ask for a
rebuild, never silently missing or serving dropped rows.

ref: the reference's metadata-driven planning lens
(site/docs/performance.md); the index itself has no 0.9-era analog —
it fills the gap its docs assign to sort clustering.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, functions as F

from linkedin_iceberg_spark.catalog import manifests as M

INDEX_FILE_ROWS = 2_000_000  # ~target rows per index parquet file


class StaleKeyIndexError(Exception):
    """The table saw a non-append commit since the index was built."""


def _index_dir(table, key_col: str) -> str:
    # FIELD-ID keyed (r9, like every stats plane): a rename keeps the
    # index valid with zero rebuild; a re-added name (new field id)
    # never inherits the dropped column's key->file map
    return os.path.join(table.location, "index",
                        str(table.schema.id_for_name(key_col)))


def _meta_path(table, key_col: str) -> str:
    return os.path.join(_index_dir(table, key_col), "_INDEX_META.json")


def build_key_index(table, key_col: str) -> dict:
    """Build (or rebuild) the key index in one distributed pass: read the
    live data files with ``_metadata.file_path`` attached, project the
    DISTINCT (key, file) pairs, range-partition + sort by key so every
    index file covers a non-overlapping key band."""
    if key_col not in table.schema.column_names():
        raise ValueError(f"no such column {key_col!r}")
    entries, delete_entries = table._live_data_and_deletes()
    idx_dir = _index_dir(table, key_col)
    staging = idx_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    if entries:
        paths = [e.data_file.file_path for e in entries]
        # schema-aware read (analyze.column_source): files written
        # before a rename keep their keys — a current-name read nulls
        # them out and the index would silently MISS those files
        from linkedin_iceberg_spark.catalog.analyze import column_source
        pairs = (column_source(table, key_col, paths, entries)
                 .select(F.col("v").alias("key"), "file_path")
                 .distinct())
        total = sum(e.data_file.record_count for e in entries)
        n_out = max(1, total // INDEX_FILE_ROWS)
        (pairs.repartitionByRange(n_out, "key")
         .sortWithinPartitions("key")
         .write.mode("overwrite").parquet(staging))
    else:
        os.makedirs(staging, exist_ok=True)
    meta = {
        "key_col": key_col,
        "snapshot_id": table.metadata.current_snapshot_id,
        "built_ms": int(time.time() * 1000),
        "indexed_files": len(entries),
        "has_deletes": bool(delete_entries),
    }
    with open(os.path.join(staging, "_INDEX_META.json"), "w") as fh:
        json.dump(meta, fh)
    # atomic swap: readers either see the old complete index or the new one
    old = idx_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(idx_dir):
        os.rename(idx_dir, old)
    os.rename(staging, idx_dir)
    shutil.rmtree(old, ignore_errors=True)
    return meta


def _load_meta(table, key_col: str) -> dict:
    p = _meta_path(table, key_col)
    if not os.path.exists(p):
        raise StaleKeyIndexError(
            f"no key index on {key_col!r}; build_key_index first")
    with open(p) as fh:
        return json.load(fh)


def _events_since(table, built_snapshot_id: int) -> list:
    """File-level history since the index build, oldest first — or raise
    when it cannot be followed safely.

    Each event is ``("append", [paths])`` or ``("replace",
    {removed paths}, [added paths])``.  Appends are new unindexed files
    (lookup candidates unconditionally); a ``replace`` commit —
    compaction, manifest rewrite, pos-delete maintenance — preserves
    every live row by contract, so a probe key that the index located
    in a since-rewritten file can only live in that commit's ADDED
    files: lookups remap through the event instead of rebuilding.
    Row-CHANGING ops (delete/overwrite) may introduce rows from files
    the index never saw, so they still raise — lookups must never
    silently miss rows; rebuild after DML."""
    from linkedin_iceberg_spark.catalog.metadata import (
        OP_APPEND, OP_REPLACE)

    md = table.metadata
    cur = md.current_snapshot_id
    if cur == built_snapshot_id:
        return []
    anc = md.ancestry(cur)
    if built_snapshot_id not in anc:
        raise StaleKeyIndexError(
            "table history rewritten since index build (rollback/branch); "
            "rebuild the index")
    newer = []
    for sid in anc:
        if sid == built_snapshot_id:
            break
        snap = md.snapshot_by_id(sid)
        if snap.operation not in (OP_APPEND, OP_REPLACE):
            raise StaleKeyIndexError(
                f"row-changing commit {sid} ({snap.operation}) since "
                "index build; rebuild the index")
        newer.append(snap)
    newer.reverse()  # oldest first

    def live_paths(snapshot) -> set:
        return {e.data_file.file_path
                for e in table._live_entries(snapshot=snapshot)}

    events = []
    prev = None  # lazily computed only when a replace needs a delta
    for snap in newer:
        if snap.operation == OP_APPEND:
            added = [e.data_file.file_path
                     for e in table._live_entries(snapshot=snap)
                     if e.status == M.STATUS_ADDED
                     and e.snapshot_id == snap.snapshot_id
                     and e.data_file.content == M.CONTENT_DATA]
            events.append(("append", snap.snapshot_id, added))
            prev = None
        else:
            if prev is None:
                prev = live_paths(
                    md.snapshot_by_id(snap.parent_snapshot_id))
            cur_set = live_paths(snap)
            events.append(("replace", snap.snapshot_id,
                           prev - cur_set, sorted(cur_set - prev)))
            prev = cur_set
    return events


def _candidate_paths(index_hits: list, events: list) -> set:
    """Fold the since-build events over the index's hit set: appends are
    always candidates (their keys are unindexed); a replace whose removed
    set intersects the candidates remaps to its added files (the probed
    keys' rows moved there), otherwise only drops the dead paths."""
    paths = set(index_hits)
    for ev in events:
        if ev[0] == "append":
            paths.update(ev[2])
        else:
            _op, _sid, removed, added = ev
            hit = paths & removed
            paths -= removed
            if hit:
                paths.update(added)
    return paths


def refresh_key_index(table, key_col: str) -> dict:
    """Fold files appended since the build into the index (append-only
    catch-up — one pass over the NEW files only).  The fold stops at the
    first ``replace`` (compaction) event: its remap stays lookup-time
    (lookups chase it through the event history, no rebuild needed), and
    a rebuild re-tightens the index when the remap chain grows long.
    Row-changing history since build still requires a rebuild."""
    meta = _load_meta(table, key_col)
    events = _events_since(table, meta["snapshot_id"])
    fold_paths, watermark = [], None
    for ev in events:
        if ev[0] != "append":
            break
        watermark = ev[1]
        fold_paths.extend(ev[2])
    if watermark is None:
        return meta
    if fold_paths:
        idx_dir = _index_dir(table, key_col)
        from linkedin_iceberg_spark.catalog.analyze import column_source
        pairs = (column_source(table, key_col, fold_paths)
                 .select(F.col("v").alias("key"), "file_path")
                 .distinct())
        pairs.write.mode("append").parquet(idx_dir)
    meta = {**meta, "snapshot_id": watermark,
            "built_ms": int(time.time() * 1000),
            "indexed_files": meta["indexed_files"] + len(fold_paths)}
    _write_meta(table, key_col, meta)
    return meta


def _write_meta(table, key_col: str, meta: dict) -> None:
    """Stage + rename so a crash mid-write can never leave a truncated
    _INDEX_META.json (every lookup json.loads it; build_key_index gets
    the same guarantee from its whole-directory staging swap)."""
    path = _meta_path(table, key_col)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, path)


def lookup_files(table, key_col: str, keys: list) -> list:
    """Data-file paths that may hold the given keys: O(1) index files are
    read (key predicate pushed to the index parquet scan), then the
    since-build history is folded over the hits — appends join the
    candidate set (unindexed tail, kept current by refresh_key_index)
    and compaction remaps rewritten hits to their replacement files."""
    meta = _load_meta(table, key_col)
    events = _events_since(table, meta["snapshot_id"])
    idx_dir = _index_dir(table, key_col)
    hit = []
    if meta["indexed_files"]:
        idx = table.spark.read.parquet(idx_dir)
        hit = [r["file_path"] for r in
               idx.filter(F.col("key").isin(keys))
               .select("file_path").distinct().collect()]
    return sorted(_candidate_paths(hit, events))


def read_by_keys(table, key_col: str, keys: list) -> DataFrame:
    """Point lookup through the index: plan only the matching files (plus
    the unindexed append tail and compaction remaps), then filter
    exactly.  Raises when the table carries v2 deletes — correctness
    first; rebuild the index after DML to restore the fast path."""
    entries, delete_entries = table._live_data_and_deletes()
    paths = set(lookup_files(table, key_col, keys))
    wanted = [e for e in entries if e.data_file.file_path in paths]
    if not wanted:
        return (table.spark.createDataFrame([], table.schema.to_spark()))
    if delete_entries:
        # deletes imply a row-changing commit, so _events_since raised
        # upstream — defensive: never serve deleted rows
        raise StaleKeyIndexError("table carries v2 deletes; rebuild")
    return (table._read_files(wanted)
            .filter(F.col(key_col).isin(keys)))
