"""Streaming source: read an engine table as a Structured Streaming stream.

ref: core/.../MicroBatches.java:41-123 (deterministic ordered file slices of
a snapshot, sliced at startFileIndex by target size) and
core/.../IncrementalDataTableScan.java (appends between snapshots).

Implementation: a PySpark (4.x) Python DataSource with a
``DataSourceStreamReader``.  Offsets are ``{"file_index": N}`` over the
deterministic (sequence_number, file_path) ordering — the (snapshotId,
position) pair MicroBatches uses.  ``partitions(start, end)`` maps the
appended files in that offset range to input partitions; executors read
each file with pyarrow and emit Arrow batches (vectorized, no Python row
loop).

IMPORTANT deployment constraint: Spark runs this class in separate Python
processes (the streaming-source runner and the executors) that may not have
this package on their path.  Everything below is therefore self-contained —
stdlib + pyarrow + pyspark only, table metadata read directly from the
metadata JSON / manifest parquet files, schema passed in as a JSON option —
and the module is registered with cloudpickle for pickle-by-value.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "linkedin_iceberg_stream"
DEFAULT_MAX_FILES_PER_BATCH = 64


def _current_files_self_contained(location: str,
                                  ref: str = None) -> list:
    """(sequence_number, file_path) of all live data files of the current
    snapshot — or of a NAMED REF's head when `ref` is given (stream a
    branch or tag: staged-data consumers read the branch head as it
    grows, release consumers pin a tag).  Stdlib+pyarrow only — safe to
    run in any Spark-spawned Python process."""
    import pyarrow.parquet as pq

    mdir = os.path.join(location, "metadata")
    v = 0
    try:
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            v = int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        v = 0
    while os.path.exists(os.path.join(mdir, f"v{v + 1}.metadata.json")):
        v += 1
    if v == 0:
        return []
    with open(os.path.join(mdir, f"v{v}.metadata.json")) as fh:
        md = json.load(fh)
    if ref and ref != "main":
        cur = md.get("refs", {}).get(ref)
        if cur is None:
            raise ValueError(f"unknown ref {ref!r} on table at {location}")
    else:
        cur = md.get("current-snapshot-id")
    snap = next((s for s in md.get("snapshots", [])
                 if s["snapshot-id"] == cur), None)
    if snap is None:
        return []
    ml = pq.read_table(os.path.join(mdir, snap["manifest-list"]),
                       columns=["manifest_path"]).to_pydict()
    out = []
    for mp in ml["manifest_path"]:
        t = pq.read_table(
            os.path.join(mdir, mp),
            columns=["status", "sequence_number", "content", "file_path"]
        ).to_pydict()
        for st, seq, ct, fp in zip(t["status"], t["sequence_number"],
                                   t["content"], t["file_path"]):
            if st != 2 and ct == 0:  # live, data content
                out.append((seq, fp))
    out.sort()
    return out


def appended_files_in_order(metadata, ops) -> list:
    """Package-API variant over loaded metadata (driver side)."""
    return _current_files_self_contained(ops.location)


def micro_batches(table, start_file_index: int = 0,
                  max_files_per_batch: int = DEFAULT_MAX_FILES_PER_BATCH) -> list:
    """Deterministic ordered slices of the current snapshot's files
    (MicroBatches.generate analog, batch-driven)."""
    files = _current_files_self_contained(table.location)
    files = files[start_file_index:]
    return [files[i:i + max_files_per_batch]
            for i in range(0, len(files), max_files_per_batch)]


class _FilesPartition(InputPartition):
    def __init__(self, paths: list, columns: list):
        self.paths = paths
        self.columns = columns


class _TableStreamReader(DataSourceStreamReader):
    def __init__(self, table_location: str, schema_cols: list,
                 max_files: int, ref: str = None):
        self.location = table_location
        self.columns = schema_cols
        self.max_files = max_files
        self.ref = ref

    def initialOffset(self) -> dict:
        return {"file_index": 0}

    def latestOffset(self) -> dict:
        return {"file_index":
                len(_current_files_self_contained(self.location,
                                                  self.ref))}

    def partitions(self, start: dict, end: dict):
        files = _current_files_self_contained(self.location, self.ref)
        lo, hi = start.get("file_index", 0), end.get("file_index", 0)
        window = [p for _seq, p in files[lo:hi]]
        if not window:
            return [_FilesPartition([], self.columns)]
        chunks = [window[i:i + self.max_files]
                  for i in range(0, len(window), self.max_files)]
        return [_FilesPartition(c, self.columns) for c in chunks]

    def read(self, partition: _FilesPartition):
        import pyarrow.parquet as pq
        for path in partition.paths:
            if not os.path.exists(path):
                continue
            if path.endswith(".orc"):
                from pyarrow import orc as pa_orc
                t = pa_orc.ORCFile(path).read(columns=partition.columns)
            else:
                t = pq.read_table(path, columns=partition.columns)
            yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass


class TableStreamDataSource(DataSource):
    """spark.readStream.format("linkedin_iceberg_stream")
         .option("location", table.location)
         .option("schemajson", <StructType.json()>).load()"""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self):
        from pyspark.sql.types import StructType
        sj = self.options.get("schemajson")
        if sj:
            return StructType.fromJson(json.loads(sj))
        raise ValueError("option 'schemaJson' is required "
                         "(use read_stream(spark, table))")

    def streamReader(self, schema) -> _TableStreamReader:
        return _TableStreamReader(
            self.options["location"],
            [f.name for f in schema.fields],
            int(self.options.get("maxfilesperbatch",
                                 DEFAULT_MAX_FILES_PER_BATCH)),
            self.options.get("ref") or None)


def register_stream_source(spark) -> str:
    """Idempotently register the source; returns the format name.

    The module is registered with cloudpickle for pickle-by-value so the
    source runner / executors never need this package installed."""
    import sys

    from pyspark import cloudpickle
    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass
    try:
        spark.dataSource.register(TableStreamDataSource)
    except Exception:
        pass  # already registered
    return SOURCE_NAME


def read_stream(spark, table, max_files_per_batch: Optional[int] = None,
                ref: Optional[str] = None):
    """Convenience: streaming DataFrame over the table's appends.

    `ref` streams a named branch/tag head instead of main; passing a
    BRANCH HANDLE (table.branch(name)) selects its branch
    automatically."""
    register_stream_source(spark)
    if ref is None:
        ref = getattr(table, "_branch", None)
    reader = (spark.readStream.format(SOURCE_NAME)
              .option("location", table.location)
              .option("schemaJson", table.schema.to_spark().json()))
    if ref:
        reader = reader.option("ref", ref)
    if max_files_per_batch:
        reader = reader.option("maxFilesPerBatch", str(max_files_per_batch))
    return reader.load()
