"""Local generic read: scan -> pyarrow Table / pandas, no Spark session.

ref: the reference's generic read path (data/src/.../IcebergGenerics.java,
GenericReader — "read a table's rows directly on one node, applying
projection, residual filtering, and row-level deletes"), re-expressed on
pyarrow instead of a record-object model.

The plan side is identical to the Spark path (same two-level pruning, same
delete matching, same residuals); only the execution differs: each planned
file is read with pyarrow, deletes are applied as masks/anti-joins,
the file's rows are aligned to the current schema BY FIELD ID, the per-file
residual runs as an arrow compute expression (vectorized; row Evaluator
fallback for transform terms), and the parts concatenate into one table.

Intended for drivers/tools that need table rows without a cluster —
sandbox-scale by design; to_df() is the distributed path.
"""

from __future__ import annotations

from typing import Optional

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.expressions.arrow import to_arrow_expression
from linkedin_iceberg_spark.expressions.evaluator import Evaluator
from linkedin_iceberg_spark.expressions.expressions import AlwaysTrue
from linkedin_iceberg_spark.schema import (
    ListTypeDef,
    MapTypeDef,
    StructTypeDef,
)


def type_to_arrow(t):
    import pyarrow as pa
    if isinstance(t, str):
        if t.startswith("decimal"):
            inner = t[t.index("(") + 1:t.index(")")]
            p, s = (int(x) for x in inner.split(","))
            return pa.decimal128(p, s)
        if t.startswith("fixed"):
            return pa.binary()
        prim = {
            "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "date": pa.date32(), "time": pa.time64("us"),
            "timestamp": pa.timestamp("us"),
            "timestamptz": pa.timestamp("us", tz="UTC"),
            "string": pa.string(), "uuid": pa.string(),
            "binary": pa.binary(),
        }
        if t in prim:
            return prim[t]
        raise TypeError(f"cannot convert type {t!r} to arrow")
    if isinstance(t, StructTypeDef):
        return pa.struct([pa.field(f.name, type_to_arrow(f.type),
                                   nullable=not f.required)
                          for f in t.fields])
    if isinstance(t, ListTypeDef):
        return pa.list_(type_to_arrow(t.element))
    if isinstance(t, MapTypeDef):
        return pa.map_(type_to_arrow(t.key), type_to_arrow(t.value))
    raise TypeError(f"cannot convert type {t!r} to arrow")


def _align_array(arr, written_t, current_t, length: int):
    """Arrow analog of scan._align_expr: produce an array of `current_t`
    from one of `written_t`, matching nested struct fields BY FIELD ID."""
    import pyarrow as pa
    target = type_to_arrow(current_t)
    if arr is None:
        return pa.nulls(length, type=target)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if written_t == current_t:
        # same engine type; file may still differ in arrow physical type
        # (e.g. tz-less timestamps) — cast to the canonical arrow type
        return arr if arr.type == target else arr.cast(target)
    if isinstance(current_t, str):
        return arr.cast(target)
    if isinstance(current_t, StructTypeDef):
        by_id = {f.field_id: f for f in written_t.fields} \
            if isinstance(written_t, StructTypeDef) else {}
        children = []
        for f in current_t.fields:
            wf = by_id.get(f.field_id)
            sub = arr.field(wf.name) if wf is not None else None
            children.append(_align_array(sub, wf.type if wf else None,
                                         f.type, len(arr)))
        return pa.StructArray.from_arrays(
            children, names=[f.name for f in current_t.fields],
            mask=arr.is_null())
    if isinstance(current_t, ListTypeDef):
        we = written_t.element if isinstance(written_t, ListTypeDef) else None
        values = _align_array(arr.values, we, current_t.element,
                              len(arr.values))
        # offsets alone don't carry entry validity — pass the mask or
        # NULL lists silently become empty lists
        return pa.ListArray.from_arrays(arr.offsets, values,
                                        mask=arr.is_null())
    if isinstance(current_t, MapTypeDef):
        # rebuild via cast — map key/value renames don't occur (no ids kept)
        return arr.cast(target)
    raise TypeError(f"cannot align type {current_t!r}")


def _read_file_arrow(task, written, columns: Optional[list] = None):
    """One data file -> pyarrow table in the WRITTEN schema's names."""
    import pyarrow as pa
    path = task.file.file_path
    fmt = task.file.file_format
    if fmt == "parquet":
        import pyarrow.parquet as pq
        return pq.read_table(path, columns=columns)
    if fmt == "orc":
        from pyarrow import orc
        t = orc.read_table(path)
        return t.select(columns) if columns else t
    if fmt == "avro":
        from linkedin_iceberg_spark.sources.avro_codec import read_avro
        rows = read_avro(path, written)
        names = [f.name for f in written.fields]
        arrays = []
        for i, f in enumerate(written.fields):
            arrays.append(pa.array([r[i] for r in rows],
                                   type=type_to_arrow(f.type)))
        t = pa.table(dict(zip(names, arrays)))
        return t.select(columns) if columns else t
    raise ValueError(f"unsupported local-read format: {fmt}")


def _apply_position_deletes(tbl, task):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    pos_paths = [d.data_file.file_path for d in task.deletes
                 if d.data_file.content == M.CONTENT_POSITION_DELETES]
    if not pos_paths:
        return tbl
    dead: set = set()
    for p in pos_paths:
        dt = pq.read_table(p, columns=["file_path", "pos"])
        mask = pc.equal(dt["file_path"], task.file.file_path)
        dead.update(dt.filter(mask)["pos"].to_pylist())
    if not dead:
        return tbl
    keep = pa.array([i not in dead for i in range(len(tbl))])
    return tbl.filter(keep)


def _apply_equality_deletes(tbl, task, current, written):
    """Null-safe anti-join against each equality delete file's keys
    (mirrors deletes.py's eqNullSafe left_anti)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    eq_files = [d.data_file for d in task.deletes
                if d.data_file.content == M.CONTENT_EQUALITY_DELETES]
    for f in eq_files:
        key_names = [current.name_for_id(i) for i in f.equality_ids]
        written_names = [written.name_for_id(i) for i in f.equality_ids]
        dt = pq.read_table(f.file_path, columns=key_names)
        dead = set(zip(*[dt[k].to_pylist() for k in key_names])) \
            if len(dt) else set()
        if not dead:
            continue
        cols = [tbl[w].to_pylist() for w in written_names]
        keep = pa.array([t not in dead for t in zip(*cols)]) \
            if len(tbl) else pa.array([], type=pa.bool_())
        tbl = tbl.filter(keep)
    return tbl


def scan_to_arrow(scan, metadata_columns: bool = False):
    """Execute a TableScan locally; returns one pyarrow Table in the
    current schema (selected columns only, residuals applied).

    ``metadata_columns`` appends the reference's reserved columns
    (MetadataColumns.java:35-50): ``_file`` (data file path) and
    ``_pos`` (the row's ORIGINAL in-file position — attached before
    delete application, so position deletes leave GAPS, the
    ROW_POSITION contract).  Exact for every format here: the local
    reader consumes whole files, so a per-file row counter IS the
    position — same recipe the Spark-side ORC/Avro readers use (r10)."""
    import pyarrow as pa
    md = scan.table.metadata
    current = md.schema
    tasks = scan.plan_files()

    target_fields = [pa.field(f.name, type_to_arrow(f.type),
                              nullable=not f.required)
                     for f in current.fields]
    if metadata_columns:
        target_fields += [pa.field("_file", pa.string()),
                          pa.field("_pos", pa.int64())]
    target = pa.schema(target_fields)
    parts = []
    for task in tasks:
        written = md.schema_by_id(task.file.schema_id)
        tbl = _read_file_arrow(task, written)
        if metadata_columns:
            # original positions ride the delete masks as a column
            tbl = tbl.append_column(
                "__pos", pa.array(range(len(tbl)), type=pa.int64()))
        tbl = _apply_position_deletes(tbl, task)
        tbl = _apply_equality_deletes(tbl, task, current, written)
        # in-place imported Hive-layout files lack their identity partition
        # columns; the value lives in the manifest partition tuple — inject
        # it as a constant (the pyarrow analog of the Spark path's basePath
        # partition reconstruction)
        # the file's OWN spec, not the default: after spec evolution a file
        # planned under an older spec may carry identity fields the current
        # default spec no longer has (would come back null otherwise)
        file_spec = md.spec_by_id(task.file.spec_id)
        pconst = {}
        for pf in file_spec.fields:
            if pf.transform_str == "identity" and \
                    pf.name in task.file.partition:
                pconst[pf.source_id] = task.file.partition[pf.name]
        # align to current schema by field id
        arrays = []
        for f in current.fields:
            old = written.name_for_id(f.field_id)
            wf = written.find_field(f.field_id) if old else None
            arr = tbl[old] if old is not None and old in tbl.column_names \
                else None
            if arr is None and f.field_id in pconst:
                arr = pa.array([pconst[f.field_id]] * len(tbl),
                               type=type_to_arrow(f.type))
                arrays.append(arr)
                continue
            arrays.append(_align_array(arr, wf.type if wf else None,
                                       f.type, len(tbl)))
        names = [f.name for f in current.fields]
        if metadata_columns:
            arrays += [
                pa.array([task.file.file_path] * len(tbl),
                         type=pa.string()),
                tbl["__pos"].combine_chunks() if len(tbl)
                else pa.array([], type=pa.int64())]
            names += ["_file", "_pos"]
        tbl = pa.table(dict(zip(names, arrays)), schema=target)
        residual = task.residual
        if residual is not None and not isinstance(residual, AlwaysTrue):
            try:
                tbl = tbl.filter(to_arrow_expression(residual))
            except NotImplementedError:
                ev = Evaluator(residual)
                rows = tbl.to_pylist()
                tbl = pa.Table.from_pylist(
                    [r for r in rows if ev.eval(r)], schema=target)
        parts.append(tbl)

    out = pa.concat_tables(parts) if parts \
        else pa.Table.from_pylist([], schema=target)
    if scan.selected:
        out = out.select(list(scan.selected))
    return out
