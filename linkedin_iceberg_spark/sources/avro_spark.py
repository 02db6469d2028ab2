"""Distributed Avro read/write for engine tables via mapInPandas (S15).

No spark-avro jar exists in this environment, so Avro data files are
encoded/decoded by the pure-Python codec (sources/avro_codec.py) INSIDE
Spark tasks: reads fan file paths out to executors (one decode per task
slice), writes group each task's rows by partition value and emit one
container file per group — the same task-writer shape as the parquet path,
so hidden partitioning, stats collection, and the scan planner are format
agnostic (ref: core/.../avro/Avro.java read/write builders).
"""

from __future__ import annotations

import os
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PANDAS_DTYPES = {
    "int": "Int32",
    "long": "Int64",
    "time": "Int64",
    "float": "float32",
    "double": "float64",
    "boolean": "boolean",
}


def read_avro_files(spark: SparkSession, paths: list, written,
                    with_file_col: bool = False,
                    with_pos_col: bool = False) -> DataFrame:
    """DataFrame over Avro container files with the written schema.
    Decoding runs in mapInPandas tasks, one or more files per task.

    ``with_pos_col`` appends ``_pos`` — the EXACT in-file row position
    (each task decodes whole files, so a per-file row counter is the
    reference's ROW_POSITION), letting position deletes and the reserved
    metadata columns work on Avro data files (r10)."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()

    schema_json = written.to_json()
    field_meta = [(f.name, f.type if isinstance(f.type, str) else None)
                  for f in written.fields]
    n_slices = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    paths_df = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(n_slices)

    def decode(batches):
        import pandas as pd

        from linkedin_iceberg_spark.schema import Schema as _S
        from linkedin_iceberg_spark.sources.avro_codec import read_avro
        schema = _S.from_json(schema_json)
        for pdf in batches:
            for p in pdf["path"]:
                rows = read_avro(p, schema)
                cols = {}
                for i, (name, t) in enumerate(field_meta):
                    vals = [r[i] for r in rows]
                    if t in ("timestamp", "timestamptz"):
                        cols[name] = pd.to_datetime(
                            pd.Series(vals, dtype="object"))
                    elif t in _PANDAS_DTYPES:
                        cols[name] = pd.Series(vals,
                                               dtype=_PANDAS_DTYPES[t])
                    else:
                        cols[name] = pd.Series(vals, dtype="object")
                out = pd.DataFrame(cols)
                if with_file_col:
                    out["_file"] = p
                if with_pos_col:
                    out["_pos"] = range(len(rows))
                yield out

    spark_schema = written.to_spark()
    ddl_extra = (", _file string" if with_file_col else "") \
        + (", _pos bigint" if with_pos_col else "")
    out = paths_df.mapInPandas(
        decode, ",".join(f"`{f.name}` {f.dataType.simpleString()}"
                         for f in spark_schema.fields) + ddl_extra)
    return out


def write_avro_files(df: DataFrame, write_cols: list, staging: str,
                     schema, ptypes: dict) -> None:
    """Write df (already carrying `_p_*` partition columns, already
    re-clustered by them) as Avro container files under `staging` using the
    same Hive-style directory layout the parquet writer produces, so
    _collect_data_files parses partitions identically.  Each task writes one
    file per partition value it holds."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()

    schema_json = schema.to_json()
    data_cols = schema.column_names()
    int_cols = {c for c in write_cols
                if ptypes.get(c[len("_p_"):], "") in ("int", "long")}

    def write_partition(batches):
        import pandas as pd

        from linkedin_iceberg_spark.schema import Schema as _S
        from linkedin_iceberg_spark.sources.avro_codec import write_avro
        schema_ = _S.from_json(schema_json)
        groups: dict = {}  # dir rel path -> list of row tuples
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if write_cols:
                key_frame = pdf[write_cols]
                keys = list(key_frame.itertuples(index=False, name=None))
            else:
                keys = [()] * len(pdf)
            data = list(pdf[data_cols].itertuples(index=False, name=None))
            for k, row in zip(keys, data):
                parts = []
                for col, v in zip(write_cols, k):
                    if v is None or v is pd.NA or v != v:
                        enc = "__HIVE_DEFAULT_PARTITION__"
                    else:
                        if col in int_cols:
                            v = int(v)
                        enc = urllib.parse.quote(str(v), safe="")
                    parts.append(f"{col}={enc}")
                groups.setdefault(os.path.join(*parts) if parts else "",
                                  []).append(row)
        for rel, rows in groups.items():
            d = os.path.join(staging, rel) if rel else staging
            os.makedirs(d, exist_ok=True)
            fname = f"part-{uuid.uuid4().hex[:16]}.avro"
            # normalize pandas NA/Timestamp scalars to python types
            clean = [tuple(None if (v is pd.NaT or v is pd.NA) else
                           (v.to_pydatetime() if isinstance(v, pd.Timestamp)
                            else v) for v in row) for row in rows]
            write_avro(os.path.join(d, fname), clean, schema_)
        yield pd.DataFrame({"n": [sum(len(v) for v in groups.values())]})

    df.mapInPandas(write_partition, "n long").agg(F.sum("n")).collect()
