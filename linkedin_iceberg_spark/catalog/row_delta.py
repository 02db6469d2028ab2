"""RowDelta (v2): commit data files + position/equality delete files together.

ref: api/.../RowDelta.java, core/.../BaseRowDelta.java:22-46,
core/.../deletes/PositionDeleteWriter.java, EqualityDeleteWriter.java.

Delete files are written with Spark (distributed, sorted as the reference
requires for position deletes), registered in the same snapshot as any new
data files.  Read-side application is catalog/deletes.py (anti-joins scoped
by sequence number, ref DeleteFileIndex.java:61-133).
"""

from __future__ import annotations

import os
import uuid
from typing import Optional

import pyarrow.parquet as pq
from pyspark.sql import DataFrame

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.metadata import OP_OVERWRITE


def _write_delete_parquet(table, df: DataFrame, content: int,
                          equality_ids: list) -> list:
    """Write a delete-file parquet set; return DataFile entries."""
    staging = os.path.join(table.location, "data",
                           f"deletes-{uuid.uuid4().hex[:12]}")
    df.write.mode("errorifexists").parquet(staging)
    out = []
    for root, _dirs, files in os.walk(staging):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            fpath = os.path.join(root, fn)
            meta = pq.read_metadata(fpath)
            out.append(M.DataFile(
                file_path=fpath,
                record_count=meta.num_rows,
                file_size_in_bytes=os.path.getsize(fpath),
                content=content,
                equality_ids=list(equality_ids),
                spec_id=table.spec.spec_id,
                schema_id=table.metadata.current_schema_id,
            ))
    return out


def row_delta(table, data_df: Optional[DataFrame] = None,
              position_deletes: Optional[DataFrame] = None,
              equality_delete_keys: Optional[DataFrame] = None,
              key_cols: Optional[list] = None):
    """One atomic snapshot with any mix of added rows / pos-deletes /
    eq-deletes.  Equality deletes are sequence-scoped: they only hit rows
    from files with a LOWER sequence number, so data added in this same
    commit survives — this is exactly what makes upsert one snapshot."""
    data_files = table._write_data_files(data_df) if data_df is not None else []
    delete_files: list = []
    if position_deletes is not None:
        if table.file_format != "parquet":
            raise NotImplementedError(
                "position deletes need Spark's parquet _metadata.row_index; "
                f"table format is {table.file_format} — use equality deletes")
        # the reference requires position deletes sorted by (path, pos)
        pos = position_deletes.select("file_path", "pos") \
            .sortWithinPartitions("file_path", "pos")
        delete_files += _write_delete_parquet(
            table, pos, M.CONTENT_POSITION_DELETES, [])
    if equality_delete_keys is not None:
        if not key_cols:
            key_cols = equality_delete_keys.columns
        ids = [table.schema.id_for_name(c) for c in key_cols]
        keys = equality_delete_keys.select(*key_cols).distinct()
        delete_files += _write_delete_parquet(
            table, keys, M.CONTENT_EQUALITY_DELETES, ids)
    if not data_files and not delete_files:
        return table

    types_by_id = table._types_by_id()

    def build(base, snap_id, seq):
        ptypes = base.all_partition_types()
        infos = []
        entries = [M.ManifestEntry(M.STATUS_ADDED, snap_id, seq, f)
                   for f in [*data_files, *delete_files]]
        name = M.new_manifest_name()
        info = M.write_manifest(table.ops.new_metadata_path(name), entries,
                                types_by_id, ptypes)
        info.manifest_path = name
        infos.append(info)
        infos.extend(table._base_manifest_infos(base))
        summary = {
            "added-data-files": str(len(data_files)),
            "added-delete-files": str(len(delete_files)),
            "added-records": str(sum(f.record_count for f in data_files)),
        }
        return infos, summary, None

    return table._commit(build, OP_OVERWRITE)


def upsert(table, df: DataFrame, key_cols: list):
    """MERGE-style upsert: one snapshot that equality-deletes the incoming
    keys and appends the new rows (ref: the RowDelta pattern the reference's
    Flink CDC sink uses)."""
    return row_delta(table, data_df=df,
                     equality_delete_keys=df.select(*key_cols),
                     key_cols=key_cols)
