"""FindFiles + ScanSummary: query APIs over table metadata.

ref: core/.../FindFiles.java:33-190 (builder: filters/partition/snapshot ->
collected DataFile list), core/.../ScanSummary.java:50-119 (per-partition
row/file counts limited to a commit-time range).
"""

from __future__ import annotations

from typing import Optional

from linkedin_iceberg_spark.expressions import (
    Evaluator,
    Expression,
    InclusiveMetricsEvaluator,
    always_true,
    bind,
    inclusive_projection,
)


class FindFiles:
    """Immutable builder, mirroring FindFiles.in(table)....collect()."""

    def __init__(self, table, row_filter: Optional[Expression] = None,
                 partition: Optional[dict] = None,
                 snapshot_id: Optional[int] = None):
        self._table = table
        self._filter = row_filter
        self._partition = partition
        self._snapshot_id = snapshot_id

    @classmethod
    def in_table(cls, table) -> "FindFiles":
        return cls(table)

    def with_metadata_matching(self, expr: Expression) -> "FindFiles":
        return FindFiles(self._table, expr, self._partition, self._snapshot_id)

    def in_partition(self, partition: dict) -> "FindFiles":
        return FindFiles(self._table, self._filter, dict(partition),
                         self._snapshot_id)

    def in_snapshot(self, snapshot_id: int) -> "FindFiles":
        return FindFiles(self._table, self._filter, self._partition,
                         snapshot_id)

    def collect(self) -> list:
        t = self._table
        md = t.metadata
        snap = md.snapshot_by_id(self._snapshot_id) \
            if self._snapshot_id is not None else md.current_snapshot
        if snap is None:
            return []
        entries = t._live_entries(snapshot=snap)
        bound = bind(md.schema, self._filter) if self._filter is not None \
            else always_true()
        part_eval = Evaluator(inclusive_projection(md.spec, bound))
        metrics = InclusiveMetricsEvaluator(bound)
        out = []
        for e in entries:
            f = e.data_file
            if self._partition is not None and f.partition != self._partition:
                continue
            if part_eval.eval(f.partition) and metrics.eval(e.stats_dict()):
                out.append(f)
        return out


def scan_summary(table, after_timestamp_ms: Optional[int] = None,
                 limit: Optional[int] = None) -> dict:
    """Per-partition {row_count, file_count} over files committed after a
    timestamp (ScanSummary.of(scan).after(ts).build())."""
    md = table.metadata
    wanted_snaps = None
    if after_timestamp_ms is not None:
        wanted_snaps = {s.snapshot_id for s in md.snapshots
                       if s.timestamp_ms > after_timestamp_ms}
    out: dict = {}
    for e in table._live_entries():
        if wanted_snaps is not None and e.snapshot_id not in wanted_snaps:
            continue
        key = tuple(sorted(e.data_file.partition.items())) or (("", ""),)
        s = out.setdefault(key, {"row_count": 0, "file_count": 0})
        s["row_count"] += e.data_file.record_count
        s["file_count"] += 1
    if limit is not None and len(out) > limit:
        raise ValueError(f"scan summary exceeds limit {limit} partitions")
    return out
