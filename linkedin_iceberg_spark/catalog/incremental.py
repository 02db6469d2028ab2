"""Incremental scan: files appended between two snapshots
(ref: core/.../IncrementalDataTableScan.java:55-96, MicroBatches.java:41-123).

Contract (reference parity): rows APPENDED in ``(from, to]`` along the
ancestry chain — append-only semantics.  Snapshots in range with
``operation == "overwrite"`` raise (IncrementalDataTableScan.snapshotsWithin
throws UnsupportedOperationException on OVERWRITE); ``delete``/``replace``
snapshots are skipped, and the appended rows they later removed or
compacted are STILL returned, because each append snapshot's OWN immutable
manifest list is read — never the end snapshot's live view, which later
rewrites (compaction, commit-time manifest merging) mutate.  Entries are
selected by ``snapshot_id in wanted`` rather than by ADDED status:
commit-time manifest merging (_merge_small_manifests) rewrites surviving
entries as STATUS_EXISTING but always preserves the committing
snapshot_id, so snapshot_id is the durable signal; status is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.metadata import (
    OP_APPEND, OP_OVERWRITE)


def appended_entries_between(table, from_snapshot_id: int,
                             to_snapshot_id: int) -> list:
    """Entries for files appended in snapshots ``(from, to]`` along the
    ancestry chain, read from each append snapshot's own manifest list
    (immutable — unaffected by later compaction / manifest rewrites).

    Raises on an ``overwrite`` snapshot inside the range, like the
    reference; ``delete`` and ``replace`` snapshots are skipped.
    """
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
        if snap.operation == OP_APPEND:
            wanted.append(sid)
        elif snap.operation == OP_OVERWRITE:
            # ref: IncrementalDataTableScan.snapshotsWithin — overwrite in
            # range means rows cannot be attributed append-only; fail loud
            # instead of silently returning fewer rows
            raise ValueError(
                f"found overwrite operation (snapshot {sid}), cannot "
                f"support incremental data in snapshots "
                f"({from_snapshot_id}, {to_snapshot_id}]")
        # delete / replace: skipped (reference parity) — their effects are
        # intentionally NOT applied to an append-only incremental read
    wanted_set = set(wanted)
    if not wanted_set:
        return []

    ptypes = md.all_partition_types()
    types_by_id = {f.field_id: f.type for f in md.schema.fields
                   if isinstance(f.type, str)}
    # entries committed by snapshot S carry S's sequence number, so a
    # manifest can hold wanted entries only if its max entry sequence
    # reaches the earliest wanted snapshot's sequence — prunes the long
    # tail of pre-range manifests each snapshot's list re-carries.
    # (added_snapshot_id alone is NOT a safe manifest filter: commit-time
    # manifest merging writes all-EXISTING manifests that keep per-entry
    # snapshot_ids but summarize with added_snapshot_id=0.)
    min_wanted_seq = min(md.snapshot_by_id(s).sequence_number
                         for s in wanted_set)
    seen_manifests: set = set()
    out_by_path: dict = {}
    for sid in wanted:
        snap = md.snapshot_by_id(sid)
        infos = M.read_manifest_list(
            table.ops.new_metadata_path(snap.manifest_list), ptypes)
        for info in infos:
            if info.sequence_number < min_wanted_seq:
                continue
            if info.manifest_path in seen_manifests:
                continue
            seen_manifests.add(info.manifest_path)
            for e in M.read_manifest(
                    table.ops.new_metadata_path(info.manifest_path),
                    types_by_id, ptypes):
                if e.status == M.STATUS_DELETED:
                    continue
                if e.snapshot_id not in wanted_set:
                    continue
                if e.data_file.content != M.CONTENT_DATA:
                    continue
                # a file can surface twice when a later wanted append
                # merge-rewrote an earlier wanted append's manifest
                out_by_path.setdefault(e.data_file.file_path, e)
    return list(out_by_path.values())


def prune_incremental_entries(md, entries: list, expr) -> list:
    """Partition + metrics pruning of incremental entries under ``expr``
    (the same two evaluators plan_files uses), judging each file under
    ITS OWN spec.  Sound to intersect with the incremental walk because
    the caller re-applies the filter row-level."""
    if expr is None or not entries:
        return entries
    from linkedin_iceberg_spark.expressions import (
        Evaluator, InclusiveMetricsEvaluator, bind, inclusive_projection)
    bound = bind(md.schema, expr)
    part_evals = {s.spec_id: Evaluator(inclusive_projection(s, bound))
                  for s in md.bound_specs()}
    default_eval = part_evals[md.default_spec_id]
    metrics_eval = InclusiveMetricsEvaluator(bound)
    return [e for e in entries
            if part_evals.get(e.data_file.spec_id,
                              default_eval).eval(e.data_file.partition)
            and metrics_eval.eval(e.stats_dict())]


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
