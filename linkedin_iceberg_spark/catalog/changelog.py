"""Changelog (CDC) scan: the row-level inserts and deletes committed in a
snapshot range, as a DataFrame tagged with `_change_type` and
`_commit_snapshot_id`.

The reference exposes appends-only incremental reads
(core/.../IncrementalDataTableScan.java:55-66); this extends the same
snapshot-diff machinery to FULL change capture over v2 tables — overwrite,
delete-where, row-delta (position/equality deletes), and MERGE commits all
produce their exact row-level effects.  Downstream CDC consumers (sync a
derived table, feed a stream, audit a pipeline) replay the changelog
instead of re-diffing table states.

Per changed snapshot s (walked oldest -> newest over the ancestry chain):
  * data files ADDED in s            -> their rows as `insert`
  * data files REMOVED in s          -> their parent-live rows as `delete`
  * delete files ADDED in s against  -> the rows they newly shadow as
    files live in both s and parent     `delete` (computed per affected
                                        file: parent-live minus s-live)
  * `replace` snapshots (compaction/manifest rewrite) change no rows and
    are skipped — same as the reference's incremental scan.

Scale: work is proportional to the CHANGED files, never the table — the
file-set diff is metadata-only, and only affected files are read (the
delete-diff reads each affected file twice; both reads prune columns and
apply sequence-scoped deletes exactly like the scan path).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.metadata import OP_REPLACE

CHANGE_TYPE_COL = "_change_type"
COMMIT_SNAPSHOT_COL = "_commit_snapshot_id"


def _split(entries: list) -> tuple:
    data, deletes = [], []
    for e in entries:
        (data if e.data_file.content == M.CONTENT_DATA else deletes).append(e)
    return data, deletes


def _tag(df: DataFrame, change_type: str, snapshot_id: int) -> DataFrame:
    return df.select(
        "*",
        F.lit(change_type).alias(CHANGE_TYPE_COL),
        F.lit(snapshot_id).cast("long").alias(COMMIT_SNAPSHOT_COL))


def changes(table, from_snapshot_id: Optional[int] = None,
            to_snapshot_id: Optional[int] = None) -> DataFrame:
    """Row-level changes committed in snapshots (from, to].

    `from_snapshot_id=None` starts from the table's beginning;
    `to_snapshot_id=None` ends at the current snapshot.  Columns are the
    table's CURRENT schema plus `_change_type` ('insert' | 'delete') and
    `_commit_snapshot_id`.  An overwrite appears as deletes + inserts in
    the same snapshot id."""
    md = table.metadata
    to_id = to_snapshot_id if to_snapshot_id is not None \
        else md.current_snapshot_id
    if to_id is None:
        return _tag(table.spark.createDataFrame([], md.schema.to_spark()),
                    "insert", -1).limit(0)
    if md.snapshot_by_id(to_id) is None:
        # ancestry() would yield [] -> an empty changelog a CDC consumer
        # could mistake for "up to date"; fail loudly instead
        raise ValueError(f"unknown snapshot {to_id}")
    ancestry = md.ancestry(to_id)
    if from_snapshot_id is not None and from_snapshot_id not in ancestry:
        raise ValueError(
            f"{from_snapshot_id} is not an ancestor of {to_id}")
    chain = []
    for sid in ancestry:
        if sid == from_snapshot_id:
            break
        chain.append(sid)
    chain.reverse()  # oldest -> newest

    parts = []
    prev = None  # (snapshot_id, data, dels) of the previous chain element
    for sid in chain:
        snap = md.snapshot_by_id(sid)
        parent_id = snap.parent_snapshot_id
        if prev is not None and prev[0] == parent_id:
            # snapshot i is snapshot i+1's parent: reuse its live entries
            # instead of re-reading every manifest (halves metadata I/O)
            par_data, par_dels = prev[1], prev[2]
        elif parent_id is not None and \
                md.snapshot_by_id(parent_id) is not None:
            parent = md.snapshot_by_id(parent_id)
            par_data, par_dels = _split(table._live_entries(snapshot=parent))
        else:
            # no parent, or parent EXPIRED (dangling parent_snapshot_id):
            # expired history collapses into this snapshot, which therefore
            # diffs against empty — never against _live_entries(None),
            # which would silently default to the CURRENT snapshot
            par_data, par_dels = [], []
        cur_data, cur_dels = _split(table._live_entries(snapshot=snap))
        prev = (sid, cur_data, cur_dels)
        if snap.operation == OP_REPLACE:
            continue  # compaction: files move, no row changes
        cur_paths = {e.data_file.file_path for e in cur_data}
        par_paths = {e.data_file.file_path for e in par_data}

        added = [e for e in cur_data if e.data_file.file_path not in par_paths]
        removed = [e for e in par_data
                   if e.data_file.file_path not in cur_paths]
        ins_df = table._read_files(added) if added else None
        # rows that were LIVE at the parent (deletes applied) and are gone
        # with their file
        del_df = table._read_live_rows(removed, par_dels) if removed else None
        if ins_df is not None and del_df is not None:
            # carryover removal: a copy-on-write rewrite re-emits untouched
            # survivor rows in the new file — cancel identical delete/insert
            # pairs (multiset) so only NET row changes surface, matching
            # changelog consumers' expectations
            ins_net = ins_df.exceptAll(del_df)
            del_net = del_df.exceptAll(ins_df)
            parts.append(_tag(ins_net, "insert", sid))
            parts.append(_tag(del_net, "delete", sid))
        elif ins_df is not None:
            parts.append(_tag(ins_df, "insert", sid))
        elif del_df is not None:
            parts.append(_tag(del_df, "delete", sid))

        par_del_paths = {e.data_file.file_path for e in par_dels}
        new_dels = [e for e in cur_dels
                    if e.data_file.file_path not in par_del_paths]
        if new_dels:
            both = [e for e in cur_data
                    if e.data_file.file_path in par_paths]
            if both:
                before = table._read_live_rows(both, par_dels)
                after = table._read_live_rows(both, cur_dels)
                parts.append(_tag(before.exceptAll(after), "delete", sid))

    if not parts:
        cols = md.schema.to_spark()
        empty = table.spark.createDataFrame([], cols)
        return _tag(empty, "insert", -1).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


MIRROR_PROP = "changelog.last-mirrored-snapshot-id"


def mirror_changelog(src, catalog, dst_name: str):
    """CDC MIRROR: append `src`'s row-level changes into an append-only
    engine table, EXACTLY-ONCE — the mirrored high-water snapshot id and
    the change rows commit in ONE transaction swap, so a crashed mirror
    run re-runs from the recorded snapshot with no duplicates and no
    gaps.

    This is how the changelog becomes a STREAM without a bespoke
    streaming source: consumers `read_stream` the mirror through the
    existing table stream source (streaming/source.py) and see ordered
    insert/delete events; a periodic mirror run (cron / foreachBatch)
    keeps it current.  Work per run is the changelog's: proportional to
    the files CHANGED since the last mirrored snapshot, never the
    table.

    Returns the mirror table.  Raises if src's history was rewritten
    past the recorded snapshot (rollback) — re-create the mirror then."""
    from pyspark.sql import types as T

    from linkedin_iceberg_spark.schema import Schema

    spark = src.spark
    try:
        dst = catalog.load_table(dst_name)
    except Exception:
        fields = list(src.schema.to_spark().fields) + [
            T.StructField(CHANGE_TYPE_COL, T.StringType()),
            T.StructField(COMMIT_SNAPSHOT_COL, T.LongType()),
        ]
        dst = catalog.create_table(dst_name,
                                   Schema.from_spark(T.StructType(fields)))
    last = dst.metadata.properties.get(MIRROR_PROP)
    src.refresh()
    cur = src.metadata.current_snapshot_id
    if cur is None or (last is not None and int(last) == cur):
        return dst
    df = changes(src, int(last) if last is not None else None, cur)
    tx = dst.new_transaction()
    tx.append(df)
    tx.update_properties({MIRROR_PROP: str(cur)})
    tx.commit()
    return dst.refresh()
