"""v2 row-level deletes: position + equality delete files applied on read.

ref: core/.../deletes/Deletes.java:60-127 (apply), PositionDeleteWriter /
EqualityDeleteWriter, DeleteFileIndex.java:61-133 (sequence-number scoping).

Representation:
  position delete file — parquet(file_path string, pos long)
  equality delete file — parquet(<key columns by current names>) + the key
                         field ids recorded in the manifest entry

Application is pure Spark (distributed, broadcast-friendly):
  position: left_anti join on (_file, _pos) where _pos is the in-file row
            index from Spark's parquet `_metadata.row_index`
  equality: left_anti join on the key columns, scoped so only rows from data
            files with sequence_number < delete.sequence_number are filtered
            (rows appended after the delete survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M

POS_DELETE_SCHEMA = "file_path string, pos bigint"


def read_with_positions(spark: SparkSession, paths: list, spark_schema,
                        select_cols: list) -> DataFrame:
    """Read parquet files exposing _file and _pos metadata columns
    (ref: core/.../MetadataColumns.java:35-50; Spark's hidden `_metadata`
    struct provides file_path + row_index natively — no shuffle, no window)."""
    df = spark.read.schema(spark_schema).parquet(*paths) \
        .select(*select_cols, F.col("_metadata.file_path").alias("_file"),
                F.col("_metadata.row_index").alias("_pos"))
    return df


def apply_deletes(table, tasks: list, df: DataFrame) -> DataFrame:
    """Apply the delete files attached to the scan tasks to df.

    df must be the union read of the tasks' data files in CURRENT schema.
    Correct at scale: anti-joins on broadcast-size delete sets are
    broadcast-hash; big delete sets fall back to shuffle joins — both fine."""
    spark = table.spark
    md = table.metadata
    schema = md.schema

    pos_delete_files: dict = {}      # seq -> [paths]
    eq_deletes: list = []            # (seq, key field ids, paths)
    for t in tasks:
        for d in t.deletes:
            f = d.data_file
            if f.content == M.CONTENT_POSITION_DELETES:
                pos_delete_files.setdefault(d.sequence_number, []) \
                    .append(f.file_path)
            elif f.content == M.CONTENT_EQUALITY_DELETES:
                eq_deletes.append((d.sequence_number, tuple(f.equality_ids),
                                   f.file_path))

    needs_meta = bool(pos_delete_files) or bool(eq_deletes)
    if not needs_meta:
        return df

    # re-read with metadata columns so we can scope and position-match
    by_schema: dict = {}
    for t in tasks:
        by_schema.setdefault(t.file.schema_id, []).append(t.file.file_path)
    seq_by_path = {t.file.file_path: _entry_seq(t) for t in tasks}

    from linkedin_iceberg_spark.catalog.scan import read_files_as_current_schema
    # read each schema group with metadata cols, align, union
    parts = []
    for sid, paths in by_schema.items():
        written = md.schema_by_id(sid)
        base = spark.read.schema(written.to_spark()).parquet(*paths) \
            .withColumn("_file", F.col("_metadata.file_path")) \
            .withColumn("_pos", F.col("_metadata.row_index"))
        cols = []
        from linkedin_iceberg_spark.schema import type_to_spark
        for fld in schema.fields:
            old = written.name_for_id(fld.field_id)
            st = type_to_spark(fld.type)
            if old is None:
                cols.append(F.lit(None).cast(st).alias(fld.name))
            else:
                c = F.col(old)
                if written.find_field(fld.field_id).type != fld.type:
                    c = c.cast(st)
                cols.append(c.alias(fld.name))
        parts.append(base.select(*cols, "_file", "_pos"))
    data = parts[0]
    for p in parts[1:]:
        data = data.unionByName(p)

    # data-file sequence numbers (for equality-delete scoping): small map,
    # broadcast join via a tiny DataFrame
    seq_rows = [(p, s) for p, s in seq_by_path.items()]
    seq_df = spark.createDataFrame(seq_rows, "(_file string, _data_seq bigint)")
    # Spark's _metadata.file_path is a URI (file://...); normalize both sides
    data = data.withColumn("_file", F.regexp_replace("_file", "^file:", ""))
    data = data.join(F.broadcast(seq_df), on="_file", how="left")

    # 1) position deletes
    if pos_delete_files:
        all_paths = [p for ps in pos_delete_files.values() for p in ps]
        pos_df = spark.read.schema(POS_DELETE_SCHEMA).parquet(*all_paths) \
            .withColumnRenamed("file_path", "_file") \
            .withColumnRenamed("pos", "_pos").distinct()
        data = data.join(pos_df, on=["_file", "_pos"], how="left_anti")

    # 2) equality deletes, sequence-scoped per delete file
    for (dseq, key_ids, path) in eq_deletes:
        key_names = [schema.name_for_id(i) for i in key_ids]
        keys = spark.read.parquet(path).select(*key_names).distinct()
        # rows to drop = semi-join where data-file seq < delete seq
        drop = data.filter(data["_data_seq"] < F.lit(dseq)).join(
            F.broadcast(keys),
            on=[data[k].eqNullSafe(keys[k]) for k in key_names],
            how="left_semi").select("_file", "_pos")
        data = data.join(drop, on=["_file", "_pos"], how="left_anti")

    return data.select(*schema.column_names())


def _entry_seq(task) -> int:
    return getattr(task, "sequence_number", 0) or 0
