"""Incremental table statistics: per-FILE NDV sketches persisted beside
the table, merged per snapshot on demand.

Manifest metrics (min/max/null counts — ref: api/.../Metrics.java:32-44,
collected at write by stats.py) come free from footers, but NDV — the
statistic planners want most for join sizing and the one users ask of a
corpus ("how many distinct users/tokens/domains") — cannot be derived
from bounds.  This plane is the AnalyzeTable analog of the modern
format's stats files (absent from the 0.9-era reference, whose metrics
stop at bounds): one HLL sketch per (data file, column), persisted as
parquet under ``<location>/stats/<col>/``.

Why per FILE and not per snapshot: data files are immutable, so a file's
sketch never goes stale — any commit (append, CoW DML, compaction) only
changes WHICH files are live, and the snapshot-level answer is the
hll_union of the live files' sketches.  analyze_table is therefore
INCREMENTAL by construction: it sketches only live files missing from
the store (appends scan just the new tail; compaction re-sketches just
the rewritten output), and rows shadowed by v2 position/equality deletes
make the estimate an upper bound until the files are rewritten
(documented, matching how the manifest metrics behave).

Scale: one scan of the un-sketched files, partial-aggregated per file
(map-side combinable); the merge step unions sketch BYTES — per-column
driver work is O(live files), no data I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M


def _stats_dir(table, col: str) -> str:
    return os.path.join(table.location, "stats", col)


def analyze_table(table, columns: list) -> dict:
    """Bring the per-file sketch store up to date for ``columns``:
    sketch only the live data files missing from each column's store.
    Returns {column: files_sketched_now}."""
    names = set(table.schema.column_names())
    for c in columns:
        if c not in names:
            raise ValueError(f"no such column {c!r}")
    entries, _ = table._live_data_and_deletes()
    live = {e.data_file.file_path for e in entries}
    out = {}
    for col in columns:
        d = _stats_dir(table, col)
        have = set()
        if os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d)):
            have = {r["file_path"] for r in
                    table.spark.read.parquet(d)
                    .select("file_path").distinct().collect()}
        todo = sorted(live - have)
        out[col] = len(todo)
        if not todo:
            continue
        sketches = (table.spark.read.schema(table.schema.to_spark())
                    .parquet(*todo)
                    .select(F.regexp_replace(F.col("_metadata.file_path"),
                                             "^file:", "")
                            .alias("file_path"),
                            F.col(col))
                    .groupBy("file_path")
                    .agg(F.hll_sketch_agg(col).alias("sketch")))
        sketches.write.mode("append").parquet(d)
    return out


def suggest_broadcast(table, threshold_bytes: int = None,
                      decompression_factor: float = 3.0,
                      max_rows: int = None) -> bool:
    """Metadata-driven join-side advice: True when the table's ESTIMATED
    IN-MEMORY size — summed live file_size_in_bytes from the manifests
    (zero data I/O) times ``decompression_factor`` — fits the session's
    broadcast budget.  This is the engine-side analog of the stats the
    reference reports to Spark's planner (spark3/.../SparkBatchScan.
    java:186 estimateStatistics feeding CBO broadcast decisions):
    pure-Python can't implement the DSv2 hook, so the engine's OWN
    join-bearing operators consult this instead of caller hints —
    row_delta.merge broadcasts its target side iff this says it fits.

    The threshold defaults to the session's
    ``spark.sql.autoBroadcastJoinThreshold`` (so the advice and AQE
    agree on what "fits" means).  Parquet bytes usually DECOMPRESS 2-5x
    into Spark's unsafe rows — dictionary/RLE-heavy wide tables worse —
    so the estimate multiplies by ``decompression_factor`` (default 3x;
    pass 1.0 to compare raw file bytes, or higher for very compressible
    data).  ``max_rows``, when given, additionally bounds the summed
    manifest record_counts — a broadcast hash table's row OVERHEAD is
    per-row, so a deployment can refuse many-row builds regardless of
    byte size.  Conservative on unknowns: missing sizes -> False."""
    if threshold_bytes is None:
        raw = table.spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                                   "10485760")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        low = raw.strip().lower().rstrip("b")
        if low and low[-1] in mult:
            threshold_bytes = int(low[:-1]) * mult[low[-1]]
        else:
            threshold_bytes = int(low)
        if threshold_bytes < 0:  # broadcasts disabled for the session
            return False
    entries, _ = table._live_data_and_deletes()
    total = 0
    rows = 0
    for e in entries:
        size = e.data_file.file_size_in_bytes
        if not size and e.data_file.record_count:
            return False  # unknown size on a non-empty file: no advice
        total += size or 0
        rows += e.data_file.record_count or 0
    if max_rows is not None and rows > max_rows:
        return False
    return total * decompression_factor <= threshold_bytes


def column_stats(table, col: str) -> dict:
    """Snapshot-level statistics for ``col``: NDV from the hll_union of
    the LIVE files' persisted sketches (raises if analyze_table hasn't
    covered them), plus null_count/min/max straight from the manifest
    metrics — no data I/O at all for those."""
    entries, delete_entries = table._live_data_and_deletes()
    live = {e.data_file.file_path for e in entries}
    d = _stats_dir(table, col)
    if not os.path.isdir(d):
        raise ValueError(f"no stats for {col!r}; run analyze_table first")
    # semi-join, NOT isin: the live set is O(files) — at 1M files an
    # isin literal list is a codegen bomb, while a parallelized frame
    # joins fine (and AQE broadcasts it when small)
    live_df = table.spark.createDataFrame(
        [(p,) for p in sorted(live)], "file_path string")
    store = table.spark.read.parquet(d) \
        .join(live_df, "file_path", "left_semi")
    covered = store.select("file_path").distinct().count()
    if covered < len(live):
        raise ValueError(
            f"stats cover {covered}/{len(live)} live files for {col!r}; "
            "run analyze_table to sketch the missing tail")
    ndv = store.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("ndv")) \
        .collect()[0]["ndv"]

    fid = next(f.field_id for f in table.schema.fields if f.name == col)
    nulls = rows = 0
    lo = hi = None
    for e in entries:
        df_ = e.data_file
        rows += df_.record_count
        nulls += (df_.null_value_counts or {}).get(fid, 0)
        b_lo = (df_.lower_bounds or {}).get(fid)
        b_hi = (df_.upper_bounds or {}).get(fid)
        if b_lo is not None:
            lo = b_lo if lo is None else min(lo, b_lo)
        if b_hi is not None:
            hi = b_hi if hi is None else max(hi, b_hi)
    return {"column": col, "ndv": int(ndv), "row_count": rows,
            "null_count": nulls, "min": lo, "max": hi,
            "upper_bound": bool(delete_entries)}
