"""Distributed ORC read with EXACT per-file row positions (S16 + r10).

Spark's reserved ``_metadata.row_index`` column is parquet-only, so the
native ``spark.read.orc`` path cannot carry the reference's ROW_POSITION
contract (core/.../MetadataColumns.java:35-50) and position deletes could
not target ORC data files.  This reader closes that gap the same way the
Avro path works (sources/avro_spark.py): file paths fan out to executors
and each task reads WHOLE files with pyarrow.orc — because one task owns
a whole file, a plain ``range(len)`` per file IS the exact in-file row
position, the number a position-delete writer recorded and the number
the reference's format-agnostic delete machinery expects
(core/.../deletes/Deletes.java:60-127).

Identity-partition constants for in-place-imported Hive-layout files
(whose partition values live in the directory path, not the file) are
injected per file from the manifest partition tuple — the pyarrow analog
of the native reader's ``basePath`` reconstruction, same recipe as
scan._to_df_planned's pconst and local_read's constant injection.

Scale: one task per file slice (files >> cores at scale), no shuffle,
arrow-native decode; only engine-managed ORC files take this path and
only when metadata columns or row-level deletes are required — plain
ORC scans keep the native vectorized reader.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_orc_files(spark: SparkSession, files: list, written,
                   pconst_by_path: dict = None) -> DataFrame:
    """DataFrame over ORC data files in the WRITTEN schema's names with
    ``_file`` and an exact ``_pos`` appended.

    ``files``: data-file paths; ``pconst_by_path``: optional per-path
    {written column name: encoded value} identity-partition constants for
    files that don't physically store those columns."""
    import pyarrow as pa

    from linkedin_iceberg_spark.catalog.local_read import type_to_arrow

    target = pa.schema([pa.field(f.name, type_to_arrow(f.type),
                                 nullable=True)
                        for f in written.fields])
    ser_schema = target.serialize().to_pybytes()
    pconst_by_path = pconst_by_path or {}

    n_slices = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    seed = spark.createDataFrame(
        [(p, json.dumps(pconst_by_path.get(p, {}))) for p in files],
        "path string, pconst string").repartition(n_slices)

    def decode(batches):
        import json as _j

        import pyarrow as _pa
        import pyarrow.compute as _pc

        tgt = _pa.ipc.read_schema(_pa.py_buffer(ser_schema))

        def emit(tbl, n, path, pconst, pos0):
            names = set(tbl.column_names) if tbl is not None else set()
            data = {}
            for f in tgt:
                if f.name in names:
                    arr = tbl[f.name]
                    if isinstance(arr, _pa.ChunkedArray):
                        arr = arr.combine_chunks()  # read_stripe gives
                    # plain Arrays; whole-table reads give ChunkedArrays
                    data[f.name] = arr if arr.type == f.type \
                        else arr.cast(f.type)
                elif f.name in pconst:
                    data[f.name] = _pc.cast(
                        _pa.array([pconst[f.name]] * n), f.type)
                else:
                    data[f.name] = _pa.nulls(n, f.type)
            out = _pa.table(data).to_pandas()
            out["_file"] = path
            out["_pos"] = range(pos0, pos0 + n)
            return out

        for pdf in batches:
            for path, pconst_s in zip(pdf["path"], pdf["pconst"]):
                from pyarrow import orc as _orc
                of = _orc.ORCFile(path)
                pconst = _j.loads(pconst_s)
                fnames = set(of.schema.names)
                # physical column pruning: read only the target fields
                # the file actually stores (a one-column ANALYZE over a
                # wide ORC file must not decode the whole file)
                want = [f.name for f in tgt if f.name in fnames]
                if want:
                    # stripe loop (r11): task memory is bounded by ONE
                    # stripe, not the whole file — an imported multi-GB
                    # ORC file no longer spikes a task.  The running
                    # offset keeps _pos exact across stripe boundaries
                    # (stripes are read in file order).
                    pos = 0
                    for si in range(of.nstripes):
                        tbl = of.read_stripe(si, columns=want)
                        yield emit(tbl, len(tbl), path, pconst, pos)
                        pos += len(tbl)
                    if of.nstripes == 0:
                        yield emit(None, 0, path, pconst, 0)
                else:
                    # NONE of the target fields stored (file written
                    # before every requested column existed): only the
                    # row COUNT matters — synthesize constants/nulls
                    # from file metadata (of.nrows) without decoding a
                    # single column, in bounded chunks
                    n = of.nrows
                    chunk = 1 << 17
                    if n == 0:
                        yield emit(None, 0, path, pconst, 0)
                    for pos in range(0, n, chunk):
                        yield emit(None, min(chunk, n - pos), path,
                                   pconst, pos)

    spark_schema = written.to_spark()
    ddl = ",".join(f"`{f.name}` {f.dataType.simpleString()}"
                   for f in spark_schema.fields)
    return seed.mapInPandas(decode, ddl + ", _file string, _pos bigint")
