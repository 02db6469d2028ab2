"""Streaming sink: epoch-idempotent appends from Structured Streaming.

ref: spark2/.../StreamingWriter.java:42-107 — commit(epochId, messages)
dedupes by the epoch id stored in the last commit's summary, so a replayed
micro-batch (restart, retry) never double-appends.  spark3 equivalent:
SparkStreamingWrite (spark3/.../SparkStreamingWrite.java).

Usage:
    q = (df.writeStream.foreachBatch(foreach_batch_writer(table))
           .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

EPOCH_KEY = "streaming-epoch-id"
QUERY_KEY = "streaming-query-id"


def _committed_epochs(table, query_id: Optional[str]) -> set:
    out = set()
    for s in table.metadata.snapshots:
        e = s.summary.get(EPOCH_KEY)
        if e is None:
            continue
        if query_id is None or s.summary.get(QUERY_KEY) == query_id:
            out.add(int(e))
    return out


def append_batch_idempotent(table, df: DataFrame, epoch_id: int,
                            query_id: Optional[str] = None):
    """Append df unless this (query, epoch) already committed."""
    table.refresh()
    if epoch_id in _committed_epochs(table, query_id):
        return table  # replayed batch: drop (ref StreamingWriter.java:64-77)
    files = table._write_data_files(df)
    from linkedin_iceberg_spark.catalog import manifests as M
    from linkedin_iceberg_spark.catalog.metadata import OP_APPEND
    types_by_id = table._types_by_id()

    def build(base, snap_id, seq):
        entries = [M.ManifestEntry(M.STATUS_ADDED, snap_id, seq, f)
                   for f in files]
        ptypes = base.all_partition_types()
        name = M.new_manifest_name()
        info = M.write_manifest(table.ops.new_metadata_path(name), entries,
                                types_by_id, ptypes)
        info.manifest_path = name
        infos = [info, *table._base_manifest_infos(base)]
        summary = {
            "added-data-files": str(len(files)),
            "added-records": str(sum(f.record_count for f in files)),
            EPOCH_KEY: str(epoch_id),
        }
        if query_id is not None:
            summary[QUERY_KEY] = query_id
        return infos, summary, None

    return table._commit(build, OP_APPEND)


def foreach_batch_writer(table, query_id: Optional[str] = None) -> Callable:
    """Adapter for DataStreamWriter.foreachBatch."""
    def write(batch_df: DataFrame, epoch_id: int):
        append_batch_idempotent(table, batch_df, epoch_id, query_id)
    return write


def upsert_batch_idempotent(table, df: DataFrame, epoch_id: int,
                            key_cols: Optional[list] = None,
                            version_cols: Optional[list] = None,
                            query_id: Optional[str] = None):
    """CDC apply: upsert df by key unless this (query, epoch) already
    committed.  A CDC micro-batch can carry several versions of a key;
    `version_cols` picks the LAST one per key (max by the version tuple,
    e.g. an event-time + a tiebreak id) before the RowDelta commit — the
    standard changelog-to-table compaction — and ALSO guards against
    cross-batch disorder: an incoming row whose version tuple is not
    strictly newer than the key's current table row is dropped, so a
    late-arriving older event can never overwrite a newer one (the
    lookup semi-joins the table down to the batch's keys first, so its
    cost scales with the batch, not the table).  One snapshot per batch:
    equality-deletes on the incoming keys + an append of the surviving
    rows, with the epoch id in the snapshot summary for replay dedupe
    (same contract as append_batch_idempotent / StreamingWriter.java)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    table.refresh()
    if key_cols is None:
        # default to the table's declared row identity (the v2 spec's
        # identifier-field-ids, Table.set_identifier_fields) — the
        # Flink-upsert convention: CDC keys live on the TABLE, not in
        # every writer's config
        key_cols = table.identifier_fields
        if not key_cols:
            raise ValueError(
                "key_cols omitted and the table declares no identifier "
                "fields (ALTER TABLE ... SET IDENTIFIER FIELDS)")
    if epoch_id in _committed_epochs(table, query_id):
        return table  # replayed batch: drop
    if version_cols:
        w = W.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in version_cols])
        df = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
        # cross-batch guard: never downgrade a key the table already
        # holds.  The key set is bounded by the batch's row count — tiny
        # under any sane trigger, but a maxFilesPerTrigger-unbounded
        # catch-up batch can exceed broadcast memory, so the hint is
        # size-gated exactly like the delete-application joins
        # (catalog/deletes.py); past the gate AQE still may broadcast
        # from observed sizes, we just never force one
        from linkedin_iceberg_spark.catalog.deletes import _maybe_broadcast
        from linkedin_iceberg_spark.catalog.row_delta import (
            _source_key_bounds)
        keys = _maybe_broadcast(df.select(*key_cols).distinct(), df.count())
        # the lookup only needs table rows sharing a batch key — scan
        # the batch's key envelope, not the whole table (the same
        # bounds-pruning merge uses for its target join)
        bounds = _source_key_bounds(df, key_cols)
        cur = (table.scan(row_filter=bounds)
               .join(keys, key_cols, "left_semi")
               .groupBy(*key_cols)
               .agg(F.max(F.struct(*[F.col(c) for c in version_cols]))
                    .alias("_ev")))
        # coalesce(>, False): a NULL version field makes the comparison
        # NULL — such rows may still INSERT new keys but never overwrite
        # an existing row (documented: null versions sort as oldest)
        df = (df.join(cur, key_cols, "left")
              .filter(F.col("_ev").isNull()
                      | F.coalesce(
                          F.struct(*[F.col(c) for c in version_cols])
                          > F.col("_ev"), F.lit(False)))
              .drop("_ev"))
    extra = {EPOCH_KEY: str(epoch_id)}
    if query_id is not None:
        extra[QUERY_KEY] = query_id
    from linkedin_iceberg_spark.catalog.row_delta import upsert
    return upsert(table, df, key_cols, extra_summary=extra)


def foreach_batch_upserter(table, key_cols: list,
                           version_cols: Optional[list] = None,
                           query_id: Optional[str] = None) -> Callable:
    """Adapter for DataStreamWriter.foreachBatch: exactly-once CDC apply."""
    def write(batch_df: DataFrame, epoch_id: int):
        upsert_batch_idempotent(table, batch_df, epoch_id, key_cols,
                                version_cols, query_id)
    return write
