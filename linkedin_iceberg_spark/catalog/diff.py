"""State diff between two table refs/snapshots: the exact row-level
delta, computed in work proportional to the CHANGED files.

``changes()`` (catalog/changelog.py) replays the commit-by-commit CDC
stream along one ancestry chain; ``snapshot_diff`` answers the other
audit question — "what is the NET row difference between these two
states" — and works across non-ancestor pairs too (two branches, a tag
vs a branch head), where no changelog path exists.

Scale shape: data files are immutable, so a file live in BOTH states
with the SAME applicable delete-file set contributes identical rows and
is skipped METADATA-ONLY.  Only files unique to one side (or whose
delete set changed) are read, and the final ``exceptAll`` multiset diff
runs over that candidate subset — a compaction that rewrote every byte
of a 100 TB table still diffs as empty after reading only the rewritten
partitions' rows, and a one-partition DML diffs by reading one
partition.  (ref: the reference's snapshot-diff machinery in
IncrementalDataTableScan.java:55-66; this generalizes the file-set diff
to arbitrary state pairs with v2 deletes.)
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, functions as F

from linkedin_iceberg_spark.catalog import manifests as M

DIFF_TYPE_COL = "_diff_type"


def _resolve(table, ref: Union[int, str, None]):
    """A snapshot from a snapshot id, a ref name (tag or branch), or
    None (current — branch-aware: on a branch handle this is the BRANCH
    head, matching every other read on the handle)."""
    md = table.metadata
    if ref is None:
        return table.current_snapshot()
    if isinstance(ref, str):
        if ref == "main":
            return md.current_snapshot
        if ref not in md.refs:
            raise ValueError(f"unknown ref {ref!r}")
        return md.snapshot_by_id(md.refs[ref])
    snap = md.snapshot_by_id(ref)
    if snap is None:
        raise ValueError(f"unknown snapshot {ref}")
    return snap


def _state(table, snap):
    """(data entries, delete entries, file->applicable-delete-set map)
    for one snapshot."""
    from linkedin_iceberg_spark.catalog.scan import match_deletes
    data, deletes = [], []
    for e in table._live_entries(snapshot=snap):
        (data if e.data_file.content == M.CONTENT_DATA else deletes).append(e)
    tasks = match_deletes(data, deletes)
    dmap = {t.file.file_path:
            frozenset(d.data_file.file_path for d in t.deletes)
            for t in tasks}
    return data, deletes, dmap


def snapshot_diff(table, from_ref: Union[int, str, None],
                  to_ref: Union[int, str, None] = None) -> DataFrame:
    """Rows added/removed between two states, tagged ``_diff_type`` in
    {'added', 'removed'}.  A row that moved files (compaction) is in
    neither set; duplicate rows diff as a multiset (two copies added in
    `to` vs one in `from` -> ONE 'added' row)."""
    spark = table.spark
    cols = table.schema.column_names()
    a_data, a_dels, a_map = _state(table, _resolve(table, from_ref))
    b_data, b_dels, b_map = _state(table, _resolve(table, to_ref))

    # metadata-only skip: immutable file + unchanged delete set on both
    # sides == identical live rows
    same = {p for p, ds in a_map.items() if b_map.get(p) == ds}
    a_cand = [e for e in a_data if e.data_file.file_path not in same]
    b_cand = [e for e in b_data if e.data_file.file_path not in same]

    def side(entries, dels):
        if not entries:
            return spark.createDataFrame([], table.schema.to_spark())
        return table._read_live_rows(entries, dels).select(*cols)

    a_df, b_df = side(a_cand, a_dels), side(b_cand, b_dels)
    added = b_df.exceptAll(a_df).withColumn(DIFF_TYPE_COL, F.lit("added"))
    removed = a_df.exceptAll(b_df).withColumn(DIFF_TYPE_COL,
                                              F.lit("removed"))
    return added.unionByName(removed)
