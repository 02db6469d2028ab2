"""Batch Python DataSource: ``spark.read.format("linkedin_iceberg")``.

The reference IS a Spark DataSourceV2 integration (spark3/.../source/
IcebergSource.java + SparkBatchScan.java: catalog-planned scans handed
to Spark as input partitions, with filter pushdown at plan time).  This
is the same integration re-expressed on PySpark 4's Python DataSource
API — the batch sibling of streaming/source.py:

* ``schema()``        -> the table's CURRENT schema (field-id mapped)
* ``pushFilters()``   -> supported conjuncts become an engine row
  filter: manifest pruning + file-metrics skipping happen at PLAN time
  (SparkScanBuilder.java:101-130's pushFilters, ours in Python).  Every
  filter is also RETURNED as unsupported, so Spark re-applies it above
  the scan — metadata pruning is inclusive, re-application makes the
  pushdown sound without a row-level residual in the worker.
* ``partitions()``    -> one InputPartition per planned FileScanTask,
  carrying PLAIN DATA ONLY (paths, column mappings, delete-file lists,
  a pyarrow target schema): scan planning runs in Spark's planning
  worker (the package ships via shipping.ship_package), and the row
  ``read()`` needs nothing but pyarrow — the same self-containment
  discipline as the stream reader.
* ``read()``          -> pyarrow scan of one data file: position-delete
  masks, equality-delete anti-joins, field-id column alignment
  (renames, promotions via cast, dropped/added columns, identity
  partition constants), yielding Arrow batches.

Nested-struct schema evolution aligns by FIELD ID through the same
recursive kernel local_read/to_df use (catalog/local_read._align_array),
so struct-internal renames/adds/drops/promotions read correctly here too.
"""

from __future__ import annotations

import json
from typing import Iterable, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)

import os

SOURCE_NAME = "linkedin_iceberg"


class _TaskPartition(InputPartition):
    def __init__(self, spec: dict):
        self.spec = spec


def _filter_to_expr(f: Filter):
    """One Spark Filter -> engine expression, or None when the shape
    is not pushable (nested attribute, exotic value type...).  Only
    used for PLAN-time pruning — unpushable filters simply prune
    nothing (Spark re-applies them all)."""
    from linkedin_iceberg_spark.expressions import (
        eq, gt, gt_eq, in_, is_null, lt, lt_eq, not_null)
    if len(f.attribute) != 1:
        return None
    name = f.attribute[0]
    if isinstance(f, IsNull):
        return is_null(name)
    if isinstance(f, IsNotNull):
        return not_null(name)
    if isinstance(f, StringStartsWith):
        from linkedin_iceberg_spark.expressions import starts_with
        return starts_with(name, f.value) \
            if isinstance(f.value, str) else None
    ok = (int, float, str, bool)
    import datetime
    ok = ok + (datetime.date, datetime.datetime)
    if isinstance(f, In):
        vals = [v for v in f.value if isinstance(v, ok)]
        if len(vals) != len(f.value) or not vals:
            return None
        return in_(name, vals)
    v = getattr(f, "value", None)
    if not isinstance(v, ok):
        return None
    return {EqualTo: eq, GreaterThan: gt, GreaterThanOrEqual: gt_eq,
            LessThan: lt, LessThanOrEqual: lt_eq}.get(type(f),
            lambda *_: None)(name, v)


class _TableBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.location = options["location"]

        def _alias(*names):
            # both spellings: the reference's hyphenated option names
            # (snapshot-id, start-snapshot-id, as-of-timestamp — drop-in
            # parity for TestDataSourceOptions users) and our
            # underscored ones
            for n in names:
                v = options.get(n)
                if v:
                    return int(v)
            return None

        self.snapshot_id = _alias("snapshot_id", "snapshot-id")
        self.ref = options.get("ref") or None
        self.as_of_ms = _alias("as_of_ms", "as-of-timestamp")
        # incremental scan options (ref: spark/.../TestDataSourceOptions
        # testIncrementalScanOptions; IncrementalDataTableScan
        # appendsBetween): rows APPENDED in (start, end] — append-only
        # semantics, row-level deletes are not applied, exactly the
        # reference's incremental contract
        self.start_snapshot_id = _alias("start_snapshot_id",
                                        "start-snapshot-id")
        self.end_snapshot_id = _alias("end_snapshot_id",
                                      "end-snapshot-id")
        if self.end_snapshot_id and not self.start_snapshot_id:
            raise ValueError(
                "end_snapshot_id requires start_snapshot_id")
        if self.start_snapshot_id and (self.snapshot_id or self.ref or
                                       self.as_of_ms):
            raise ValueError("incremental options cannot combine with "
                             "snapshot_id/ref/as_of_ms")

        # split-size / lookback / file-open-cost read options override
        # the table's read.split.* properties for this read only (ref:
        # spark/.../TestDataSourceOptions.java:178,290 — the same three
        # knobs, same precedence)
        def _opt_int(*names):
            for n in names:
                v = options.get(n)
                if v:
                    return int(v)
            return None

        self.split_size = _opt_int("split-size", "split_size")
        self.lookback = _opt_int("lookback")
        self.open_cost = _opt_int("file-open-cost", "file_open_cost")
        # reserved metadata columns (r10 — MetadataColumns.java parity
        # on the DataSource surface): _file + _pos appended to every
        # row; _pos is EXACT (each task reads whole files, so the
        # per-file row counter is ROW_POSITION, attached before delete
        # masks)
        self.meta_cols = str(options.get("metadata-columns")
                             or options.get("metadata_columns")
                             or "").lower() in ("true", "1", "yes")
        if self.split_size is not None and self.split_size <= 0:
            raise ValueError("split-size must be > 0")
        if self.lookback is not None and self.lookback <= 0:
            raise ValueError("lookback must be > 0")
        if self.open_cost is not None and self.open_cost < 0:
            raise ValueError("file-open-cost must be >= 0")
        self._expr = None

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        from linkedin_iceberg_spark.expressions import and_
        expr = None
        for f in filters:
            try:
                attr = getattr(f, "columnPath", None) or \
                    getattr(f, "attribute", None)
                if self.meta_cols and attr and attr[0] in ("_file",
                                                           "_pos"):
                    # filters on reserved columns never reach the engine
                    # scan (they are not table columns); Spark re-applies
                    # them row-level like every other returned filter
                    continue
                e = _filter_to_expr(f)
            except Exception:
                e = None
            if e is not None:
                expr = e if expr is None else and_(expr, e)
        self._expr = expr
        # every filter comes back "unsupported": pruning used them at
        # plan time, Spark re-applies them row-level — always sound
        return filters

    # -- plan time (Spark planning worker; package shipped) --------------
    def partitions(self):
        from linkedin_iceberg_spark.catalog import manifests as M
        from linkedin_iceberg_spark.catalog.local_read import type_to_arrow
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        from linkedin_iceberg_spark.catalog.table import Table
        import pyarrow as pa

        ops = TableOperations(self.location)
        md = ops.refresh()
        if md is None:
            raise ValueError(f"no table at {self.location}")
        t = Table(None, ops, md, getattr(md, "_version", 1))
        scan = t.new_scan()
        if self.ref:
            scan = scan.use_ref(self.ref)
        if self.snapshot_id:
            scan = scan.use_snapshot(self.snapshot_id)
        if self.as_of_ms:
            scan = scan.as_of_time(self.as_of_ms)
        if self._expr is not None:
            scan = scan.filter(self._expr)
        tasks = None
        if self.start_snapshot_id is not None:
            from linkedin_iceberg_spark.catalog.incremental import (
                appended_entries_between, prune_incremental_entries)
            end = self.end_snapshot_id or md.current_snapshot_id
            entries = appended_entries_between(
                t, self.start_snapshot_id, end)
            # prune directly on the incremental entries (partition +
            # metrics evaluators, same as plan_files) — NEVER by
            # intersecting with the end snapshot's live view: later
            # compaction / manifest merges rewrite that view and would
            # silently drop appended rows
            entries = prune_incremental_entries(md, entries, self._expr)

            class _IncTask:
                __slots__ = ("file", "deletes")

            tasks = []
            for e in entries:
                it = _IncTask()
                it.file = e.data_file
                it.deletes = []
                tasks.append(it)
        current = md.schema
        tfields = [pa.field(f.name, type_to_arrow(f.type),
                            nullable=not f.required)
                   for f in current.fields]
        if self.meta_cols:
            tfields += [pa.field("_file", pa.string()),
                        pa.field("_pos", pa.int64())]
        target = pa.schema(tfields)
        parts = []
        for task in (tasks if tasks is not None else scan.plan_files()):
            if task.file.file_format not in ("parquet", "orc", "avro"):
                raise ValueError(
                    f"{SOURCE_NAME} reads parquet/orc/avro data files; "
                    f"{task.file.file_format!r} needs local_read/to_df")
            written = md.schema_by_id(task.file.schema_id)
            file_spec = md.spec_by_id(task.file.spec_id)
            consts = {}
            for pf in file_spec.fields:
                if pf.transform_str == "identity" and \
                        pf.name in task.file.partition:
                    consts[pf.source_id] = task.file.partition[pf.name]
            out, read_cols = [], []
            for f in current.fields:
                wname = written.name_for_id(f.field_id)
                if wname is not None:
                    # carry the written/current ENGINE types so read()
                    # can align nested-struct evolution by field id
                    # (rename/add/drop/promote INSIDE a struct), not
                    # just cast flat columns
                    wt = written.find_field(f.field_id).type
                    out.append((f.name, "col", wname, wt, f.type))
                    read_cols.append(wname)
                elif f.field_id in consts:
                    out.append((f.name, "const", consts[f.field_id],
                                None, None))
                else:
                    out.append((f.name, "null", None, None, None))
            eq_deletes, pos_deletes = [], []
            for d in task.deletes:
                df_ = d.data_file
                if df_.content == M.CONTENT_POSITION_DELETES:
                    pos_deletes.append(df_.file_path)
                else:
                    dkeys = [current.name_for_id(i)
                             for i in df_.equality_ids]
                    wkeys = [written.name_for_id(i)
                             for i in df_.equality_ids]
                    if any(k is None for k in wkeys):
                        raise ValueError(
                            "equality delete on a column absent from "
                            "the data file's written schema; use to_df")
                    eq_deletes.append((df_.file_path, dkeys, wkeys))
                    for w in wkeys:
                        if w not in read_cols:
                            read_cols.append(w)
            parts.append(_TaskPartition({
                "bytes": int(task.file.file_size_in_bytes or 0),
                "written_schema":
                    written if task.file.file_format == "avro" else None,
                "path": task.file.file_path,
                "fmt": task.file.file_format,
                "read_cols": read_cols,
                "out": out,
                "target": target,
                "pos_deletes": pos_deletes,
                "eq_deletes": eq_deletes,
                "meta": self.meta_cols,
            }))
        if not parts:
            return [_TaskPartition({"empty": True, "target": target})]
        # size-based task coalescing (the split-planning discipline,
        # S6): a 100 TB table of small files must not become one Spark
        # task per file — lookback bin-packing with an open-file cost
        # floor (TableScanUtil.planTasks shape), sized by the table's
        # read.split.* properties and overridden per read by the
        # split-size/lookback/file-open-cost options
        from linkedin_iceberg_spark.catalog import split_planning as SP
        p_size, p_lb, p_cost = SP.props_for(md.properties)
        size = self.split_size if self.split_size is not None else p_size
        lb = self.lookback if self.lookback is not None else p_lb
        cost = self.open_cost if self.open_cost is not None else p_cost
        packs = list(SP.bin_pack(
            [p.spec for p in parts], size, lb,
            lambda s: max(s.get("bytes", 0), cost, 1),
            largest_bin_first=True))
        return [_TaskPartition({"specs": pack, "target": target})
                for pack in packs]

    # -- executor time (pyarrow only — no package import) -----------------
    def read(self, partition: _TaskPartition):
        import pyarrow as pa

        target: "pa.Schema" = partition.spec["target"]
        if partition.spec.get("empty"):
            yield from pa.Table.from_pylist([], schema=target).to_batches()
            return
        for s in partition.spec["specs"]:
            yield from self._read_one(s, target)

    def _read_one(self, s: dict, target):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if s["fmt"] == "orc":
            from pyarrow import orc
            tbl = orc.read_table(s["path"])
            tbl = tbl.select([c for c in s["read_cols"]])
        elif s["fmt"] == "avro":
            # the pure-Python codec rides the shipped package (the one
            # read path that is not pyarrow-native); the spec carries
            # the WRITTEN schema object (pickles fine)
            from linkedin_iceberg_spark.catalog.local_read import (
                type_to_arrow)
            from linkedin_iceberg_spark.sources.avro_codec import (
                read_avro)
            written = s["written_schema"]
            rows = read_avro(s["path"], written)
            names = [f.name for f in written.fields]
            arrays = [pa.array([r[i] for r in rows],
                               type=type_to_arrow(f.type))
                      for i, f in enumerate(written.fields)]
            tbl = pa.table(dict(zip(names, arrays)))
            tbl = tbl.select([c for c in s["read_cols"]])
        else:
            tbl = pq.read_table(s["path"], columns=s["read_cols"])
        if s.get("meta"):
            # original in-file positions ride the delete masks below
            tbl = tbl.append_column(
                "__pos", pa.array(range(len(tbl)), type=pa.int64()))
        dead: set = set()
        for p in s["pos_deletes"]:
            dt = pq.read_table(p, columns=["file_path", "pos"])
            dead.update(dt.filter(pc.equal(dt["file_path"], s["path"])
                                  )["pos"].to_pylist())
        if dead:
            # ONE mask over the original in-file positions — filtering
            # per delete file would shift indices under later masks
            tbl = tbl.filter(pa.array(
                [i not in dead for i in range(len(tbl))]))
        for (dpath, dkeys, wkeys) in s["eq_deletes"]:
            dt = pq.read_table(dpath, columns=dkeys)
            dead = set(zip(*[dt[k].to_pylist() for k in dkeys])) \
                if len(dt) else set()
            if not dead:
                continue
            cols = [tbl[w].to_pylist() for w in wkeys]
            keep = pa.array([t not in dead for t in zip(*cols)]) \
                if len(tbl) else pa.array([], type=pa.bool_())
            tbl = tbl.filter(keep)
        arrays = []
        # zip() pairs only the schema columns; the reserved metadata
        # fields (when present) append after the loop
        for (name, kind, v, wt, ct), field in zip(s["out"], target):
            if kind == "col":
                arr = tbl[v]
                if arr.type != field.type:
                    if isinstance(wt, str) and isinstance(ct, str):
                        arr = pc.cast(arr, field.type)
                    else:
                        # nested evolution (struct/list internals moved,
                        # renamed, promoted, added, dropped): recursive
                        # field-id alignment via the shipped package —
                        # the same kernel local_read/to_df use
                        from linkedin_iceberg_spark.catalog.local_read \
                            import _align_array
                        if isinstance(arr, pa.ChunkedArray):
                            arr = arr.combine_chunks()
                        arr = _align_array(arr, wt, ct, len(tbl))
                arrays.append(arr)
            elif kind == "const":
                arrays.append(pa.array([v] * len(tbl), type=field.type))
            else:
                arrays.append(pa.nulls(len(tbl), type=field.type))
        if s.get("meta"):
            arrays.append(pa.array([s["path"]] * len(tbl),
                                   type=pa.string()))
            arrays.append(tbl["__pos"].combine_chunks() if len(tbl)
                          else pa.array([], type=pa.int64()))
        out = pa.table(dict(zip([f.name for f in target], arrays)),
                       schema=target)
        yield from out.to_batches()


def _transform_column(arr, tstr: str, stype: str):
    """Arrow column -> Arrow column of Iceberg partition values for one
    transform — VECTORIZED (the write hot path must not run per-row
    Python): time ordinals via pyarrow/numpy epoch math, buckets via
    the shared numpy murmur3 kernel (`functions.bucket_udf.
    bucket_series` — byte-identical to the scalar parity reference),
    int/string truncate via array ops.  The engine's scalar
    ``Transform.apply`` stays the semantic reference (exercised against
    this in tests) and the fallback for exotic types."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def epoch_micros():
        ts = pc.cast(arr, pa.timestamp("us"))
        return pc.cast(ts, pa.int64())

    if tstr == "year":
        return pc.cast(pc.subtract(pc.year(arr), 1970), pa.int32())
    if tstr == "month":
        y = pc.subtract(pc.year(arr), 1970)
        return pc.cast(pc.add(pc.multiply(y, 12),
                              pc.subtract(pc.month(arr), 1)),
                       pa.int32())
    if tstr == "day":
        if pa.types.is_date(arr.type):
            return pc.cast(pc.cast(arr, pa.date32()), pa.int32())
        # floor division keeps pre-1970 ordinals correct
        micros = epoch_micros().to_numpy(zero_copy_only=False)
        mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
        out = np.where(mask, 0, micros) // 86_400_000_000
        return pa.array(np.where(mask, None, out), type=pa.int32(),
                        from_pandas=True)
    if tstr == "hour":
        micros = epoch_micros().to_numpy(zero_copy_only=False)
        mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
        out = np.where(mask, 0, micros) // 3_600_000_000
        return pa.array(np.where(mask, None, out), type=pa.int32(),
                        from_pandas=True)
    if tstr.startswith("bucket["):
        from linkedin_iceberg_spark.functions.bucket_udf import (
            bucket_series)
        n = int(tstr[7:-1])
        s = arr.to_pandas()
        return pa.Array.from_pandas(bucket_series(s, stype, n),
                                    type=pa.int32())
    if tstr.startswith("truncate["):
        w = int(tstr[9:-1])
        if pa.types.is_integer(arr.type):
            # numpy floor division = python floor-mod truncate, exact
            # for negatives
            vals = arr.to_numpy(zero_copy_only=False)
            mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
            safe = np.where(mask, 0, vals)
            out = (safe // w) * w
            return pa.array(np.where(mask, None, out), type=arr.type,
                            from_pandas=True)
        if pa.types.is_string(arr.type) or \
                pa.types.is_large_string(arr.type):
            return pc.utf8_slice_codeunits(arr, 0, w)
    # exotic types: the scalar parity reference
    from linkedin_iceberg_spark.transforms.transforms import (
        parse_transform)
    tr = parse_transform(tstr, stype)
    return pa.array([None if v is None else tr.apply(v)
                     for v in arr.to_pylist()])


class _FileCommit(WriterCommitMessage):
    def __init__(self, files):
        # [(staged path, partition dict)] — empty for a rowless task
        self.files = files

    @property
    def path(self):  # single-file convenience (tests, stream replay)
        return self.files[0][0] if self.files else None


class _TableBatchWriter(DataSourceArrowWriter):
    """``df.write.format("linkedin_iceberg")`` — the write half of the
    DataSourceV2 analog (spark3/.../source/SparkWriteBuilder-era batch
    writes): each task streams its Arrow batches into one staged
    parquet file (pyarrow only — no package import on executors), and
    ``commit`` turns the staged files into ONE engine snapshot (footer
    stats collected into DataFile entries; append, or an atomic
    full-replace swap for overwrite mode).  ``abort`` removes staged
    files — nothing uncommitted ever becomes visible (the snapshot IS
    the publication point).

    Partitioning: honored worker-side — each task computes the spec's
    partition values (identity via raw pyarrow grouping; bucket/time/
    truncate through the ENGINE's own transform objects, applied
    per-row on the shipped package, so partition math can never drift
    from scan-side projections), splits its batches per value
    combination, and stages one single-partition file each.  The
    per-row apply() is the parity-over-speed choice: table.append
    remains the vectorized write path (transforms as Spark columns)."""

    def __init__(self, options: dict, overwrite: bool,
                 part_fields: list = None, sort_by: list = None,
                 write_format: str = "parquet", engine_schema=None):
        import uuid as _uuid
        self.location = options["location"]
        self.overwrite = overwrite
        # the write-format OPTION overrides the table's
        # write.format.default property for this write only (ref:
        # spark/.../TestDataSourceOptions.java:78); resolved driver-side
        # in TableBatchDataSource.writer()
        self.write_format = write_format
        # engine Schema rides to the workers for the avro codec (it has
        # no pyarrow writer); None for parquet/orc
        self.engine_schema = engine_schema
        self.part_fields = part_fields or []  # [(pf, src, transform, type)]
        # the table's declared write order (write.sort-by): rows inside
        # each staged file cluster so parquet row-group stats stay
        # tight (zorder interleaves are left to table.append)
        self.sort_by = sort_by or []
        # extra snapshot metadata (ref: spark/.../TestDataSourceOptions
        # testExtraSnapshotMetadata, the SnapshotSummary EXTRA_METADATA
        # plane): .option("snapshotproperty.k", "v") lands k=v in the
        # committed snapshot's summary verbatim
        self.snapshot_props = {
            k[len("snapshotproperty."):]: v
            for k, v in options.items()
            if k.lower().startswith("snapshotproperty.")
            and k[len("snapshotproperty."):]}
        self.staging = os.path.join(
            self.location, "data", f"dsv2-{_uuid.uuid4().hex[:12]}")

    def write(self, iterator):
        import os as _os
        import uuid as _uuid
        import pyarrow as pa
        import pyarrow.parquet as pq
        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _FileCommit([])
        tbl = pa.Table.from_batches(batches)
        _os.makedirs(self.staging, exist_ok=True)

        def stage(part_tbl, pdict):
            if self.sort_by:
                part_tbl = part_tbl.sort_by(
                    [(c, "ascending") for c in self.sort_by])
            fmt = self.write_format
            path = _os.path.join(self.staging,
                                 f"part-{_uuid.uuid4().hex}.{fmt}")
            if fmt == "orc":
                from pyarrow import orc as _orc
                _orc.write_table(part_tbl, path)
            elif fmt == "avro":
                # the pure-Python codec from the shipped package (the
                # same one the read path uses); rows as per-field tuples
                from linkedin_iceberg_spark.sources.avro_codec import (
                    write_avro)
                names = [f.name for f in self.engine_schema.fields]
                cols = [part_tbl.column(n).to_pylist() for n in names]
                write_avro(path, list(zip(*cols)), self.engine_schema)
            else:
                pq.write_table(part_tbl, path, compression="snappy")
            # exact per-column NaN counts for float columns (parquet
            # footers cannot provide them): a RECORDED ZERO later lets
            # the scan fold the column's MAX from bounds — without it a
            # possible unrecorded NaN (Spark's largest value) forbids
            # the fold forever
            import pyarrow.compute as _pc
            nans = {}
            for f_ in part_tbl.schema:
                if pa.types.is_floating(f_.type):
                    s = _pc.sum(_pc.is_nan(part_tbl.column(f_.name)))
                    nans[f_.name] = int(s.as_py() or 0)
            return (path, pdict, part_tbl.num_rows, nans)

        if not self.part_fields:
            return _FileCommit([stage(tbl, {})])
        import pyarrow.compute as pc
        # one helper column per partition field holding the TRANSFORMED
        # value; identity reuses the raw column, others go through the
        # engine's transform apply() (exact parity with scan-side math)
        work = tbl
        gcols = []
        for (pf, src, tstr, stype) in self.part_fields:
            if tstr == "identity":
                gcols.append((pf, src))
                continue
            helper = f"_pt_{pf}"
            work = work.append_column(
                helper, _transform_column(work[src], tstr, stype))
            gcols.append((pf, helper))
        names = [c for _, c in gcols]
        combos = work.group_by(names).aggregate([]).to_pylist()
        files = []
        for combo in combos:
            mask = None
            for c in names:
                v = combo[c]
                m = pc.is_null(work[c]) if v is None \
                    else pc.equal(work[c], v)
                mask = m if mask is None else pc.and_(mask, m)
            pdict = {pf: combo[c] for (pf, c) in gcols}
            part_tbl = work.filter(mask).select(tbl.column_names)
            files.append(stage(part_tbl, pdict))
        return _FileCommit(files)

    def _staged_stats(self, md, path: str, nrows: int,
                      nans: dict = None) -> dict:
        """Footer stats per staged file, by format: parquet/orc read
        their footers; avro (no footer stats) records the exact row
        count the write task carried plus the file size — bounds-less
        entries are always sound (inclusive evaluators answer
        might-match without them).  ``nans`` (column name -> exact NaN
        count, computed by the write task from its Arrow batches) lands
        in nan_value_counts keyed by field id; an explicit zero is the
        signal that lets float MAX fold from bounds."""
        from linkedin_iceberg_spark.catalog.stats import (
            collect_file_stats, collect_orc_file_stats)
        if self.write_format == "orc":
            st = collect_orc_file_stats(path, md.schema)
        elif self.write_format == "avro":
            st = {"record_count": int(nrows),
                  "file_size_in_bytes": os.path.getsize(path),
                  "value_counts": {}, "null_value_counts": {},
                  "nan_value_counts": {}, "lower_bounds": {},
                  "upper_bounds": {}}
        else:
            mode = md.properties.get("write.metadata.metrics.default",
                                     "truncate(16)")
            cmodes = {k[len("write.metadata.metrics.column."):]: v
                      for k, v in md.properties.items()
                      if k.startswith("write.metadata.metrics.column.")}
            st = collect_file_stats(path, md.schema, mode,
                                    column_modes=cmodes)
        for name, n in (nans or {}).items():
            fid = md.schema.id_for_name(name)
            if fid is not None:
                st["nan_value_counts"][fid] = int(n)
        return st

    def commit(self, messages):
        from linkedin_iceberg_spark.catalog import manifests as M
        from linkedin_iceberg_spark.catalog.metadata import (
            OP_OVERWRITE, TableOperations)
        from linkedin_iceberg_spark.catalog.table import Table

        ops = TableOperations(self.location)
        md = ops.refresh()
        if md is None:
            raise ValueError(f"no table at {self.location}")
        t = Table(None, ops, md, getattr(md, "_version", 1))
        files = []
        for m in messages:
            for (path, pdict, nrows, *rest) in getattr(m, "files", []) or []:
                files.append(M.DataFile(
                    file_path=path, file_format=self.write_format,
                    partition=pdict, spec_id=md.default_spec_id,
                    schema_id=md.current_schema_id,
                    **self._staged_stats(md, path, nrows,
                                         rest[0] if rest else None)))
        if self.overwrite:
            data, dels = t._live_data_and_deletes()
            t._commit_file_swap(
                removed=data + dels, added=files,
                operation=OP_OVERWRITE,
                seen_paths={e.data_file.file_path
                            for e in data + dels},
                extra_summary=self.snapshot_props or None)
        elif files:
            t._commit_append_files(
                files, extra_summary=self.snapshot_props or None)

    def abort(self, messages):
        import shutil
        shutil.rmtree(self.staging, ignore_errors=True)


class _TableStreamWriter(_TableBatchWriter,
                         DataSourceStreamArrowWriter):
    """``df.writeStream.format("linkedin_iceberg")`` — exactly-once
    micro-batch appends through the stream-writer protocol (ref:
    spark2/.../StreamingWriter.java:42-107 commit(epochId, messages)):
    each epoch's staged files commit as ONE snapshot stamped with the
    (query, epoch) summary keys the foreachBatch sink uses
    (streaming/sink.py), so a replayed epoch is recognized and its
    staged files dropped — the same idempotence contract, spelled as a
    native format instead of foreachBatch."""

    def __init__(self, options: dict, part_fields: list = None,
                 sort_by: list = None, write_format: str = "parquet",
                 engine_schema=None):
        super().__init__(options, overwrite=False,
                         part_fields=part_fields, sort_by=sort_by,
                         write_format=write_format,
                         engine_schema=engine_schema)
        self.query_id = options.get("queryid") or "dsv2-stream"

    def commit(self, messages, batchId: int) -> None:
        from linkedin_iceberg_spark.catalog import manifests as M
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        from linkedin_iceberg_spark.catalog.table import Table
        from linkedin_iceberg_spark.streaming.sink import (
            EPOCH_KEY, QUERY_KEY, _committed_epochs)

        ops = TableOperations(self.location)
        md = ops.refresh()
        t = Table(None, ops, md, getattr(md, "_version", 1))
        staged = [fp for m in messages if m is not None
                  for fp in (getattr(m, "files", []) or [])]
        if batchId in _committed_epochs(t, self.query_id):
            for p, *_rest in staged:
                try:
                    os.remove(p)
                except OSError:
                    pass
            return
        files = [M.DataFile(
            file_path=p, file_format=self.write_format, partition=pdict,
            spec_id=md.default_spec_id, schema_id=md.current_schema_id,
            **self._staged_stats(md, p, nrows, rest[0] if rest else None))
            for (p, pdict, nrows, *rest) in staged]
        if files:
            t._commit_append_files(files, extra_summary={
                **getattr(self, "snapshot_props", {}),
                EPOCH_KEY: str(batchId), QUERY_KEY: self.query_id})

    def abort(self, messages, batchId: int) -> None:
        import shutil
        # the streaming runner constructs a FRESH writer instance per
        # commit/abort call, so self.staging is a brand-new uuid dir the
        # failed epoch's tasks never wrote to — the real staged paths
        # travel in the task messages (the same channel the
        # replayed-epoch branch of commit drains).  Delete those files,
        # then their now-empty per-writer staging dirs, so an aborted
        # epoch leaves no orphan parquet under <location>/data/.
        dirs = set()
        for m in messages or []:
            for p, *_rest in (getattr(m, "files", []) or []):
                try:
                    os.remove(p)
                    dirs.add(os.path.dirname(p))
                except OSError:
                    pass
        for d in dirs:
            try:
                os.rmdir(d)
            except OSError:
                pass  # non-empty (another epoch's files) or already gone
        shutil.rmtree(self.staging, ignore_errors=True)


class TableBatchDataSource(DataSource):
    """spark.read.format("linkedin_iceberg")
         .option("location", table.location)
         [.option("snapshot_id", ...) | .option("ref", ...) |
          .option("as_of_ms", ...)].load()"""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)
        sj = self.options.get("schemajson")
        if sj:
            return StructType.fromJson(json.loads(sj))
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        md = TableOperations(self.options["location"]).refresh()
        if md is None:
            raise ValueError(f"no table at {self.options['location']}")
        out = md.schema.to_spark()
        if str(self.options.get("metadata-columns")
               or self.options.get("metadata_columns")
               or "").lower() in ("true", "1", "yes"):
            clash = {f.name for f in out.fields} & {"_file", "_pos"}
            if clash:
                # the reference rejects reserved-name collisions
                # (MetadataColumns); a silent duplicate-name schema
                # would shadow one column ambiguously
                raise ValueError(
                    f"table schema already contains reserved metadata "
                    f"column(s) {sorted(clash)}; cannot attach _file/"
                    f"_pos via metadata-columns=true")
            out = StructType(list(out.fields) +
                             [StructField("_file", StringType(), True),
                              StructField("_pos", LongType(), True)])
        return out

    def reader(self, schema) -> _TableBatchReader:
        return _TableBatchReader(self.options)

    def streamReader(self, schema):
        # one format name for the whole surface: readStream delegates
        # to the table-as-stream reader (streaming/source.py — file-
        # slice offsets, Arrow batches, branch/tag refs)
        from linkedin_iceberg_spark.streaming.source import (
            DEFAULT_MAX_FILES_PER_BATCH, _TableStreamReader)
        return _TableStreamReader(
            self.options["location"],
            [f.name for f in schema.fields],
            int(self.options.get("maxfilesperbatch",
                                 DEFAULT_MAX_FILES_PER_BATCH)),
            self.options.get("ref") or None)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("stream writes are append-only")
        self._check_write_schema(schema)
        fmt, eng = self._write_format()
        return _TableStreamWriter(
            self.options, self._part_fields(schema), self._sort_by(),
            write_format=fmt, engine_schema=eng)

    def writer(self, schema, overwrite: bool) -> _TableBatchWriter:
        self._check_write_schema(schema)
        fmt, eng = self._write_format()
        return _TableBatchWriter(self.options, overwrite,
                                 self._part_fields(schema),
                                 self._sort_by(),
                                 write_format=fmt, engine_schema=eng)

    def _write_format(self):
        """(format, engine-schema-or-None): the write-format option
        overrides the table's write.format.default property (ref:
        spark/.../TestDataSourceOptions.java:78); the engine Schema is
        shipped to workers only for avro (its codec isn't pyarrow)."""
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        md = TableOperations(self.options["location"]).refresh()
        fmt = (self.options.get("write-format")
               or self.options.get("write_format")
               or (md.properties.get("write.format.default", "parquet")
                   if md else "parquet")).lower()
        if fmt not in ("parquet", "orc", "avro"):
            raise ValueError(
                f"write-format must be parquet|orc|avro, got {fmt!r}")
        eng = md.schema if (md is not None and fmt == "avro") else None
        if fmt == "avro" and eng is not None and any(
                not isinstance(f.type, str) for f in eng.fields):
            raise ValueError("avro format writes support primitive "
                             "columns; use table.append")
        return fmt, eng

    def _check_write_schema(self, schema) -> None:
        # staged parquet becomes table data verbatim, so the incoming
        # frame must already BE the table schema (names + types; the
        # engine's append() does richer alignment — route odd shapes
        # there)
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        md = TableOperations(self.options["location"]).refresh()
        if md is None:
            raise ValueError(f"no table at {self.options['location']}")
        want = [(f.name, f.dataType) for f in md.schema.to_spark().fields]
        got = [(f.name, f.dataType) for f in schema.fields]
        if want != got:
            raise ValueError(
                f"write schema {got} does not match table schema "
                f"{want}; use table.append for schema alignment")

    def _sort_by(self) -> list:
        """The table's declared write order as plain column names
        (zorder(...) stays with table.append — its interleave is a
        Spark-column computation)."""
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        md = TableOperations(self.options["location"]).refresh()
        prop = (md.properties.get("write.sort-by") or "") if md else ""
        if not prop or prop.lower().startswith("zorder"):
            return []
        return [c.strip() for c in prop.split(",") if c.strip()]

    def _part_fields(self, schema) -> list:
        """Partition fields as [(pf.name, source col, transform str,
        source type)] — every spec transform is writable (the worker
        applies the engine's own transform objects); only void/unknown
        raise."""
        from linkedin_iceberg_spark.catalog.metadata import TableOperations
        md = TableOperations(self.options["location"]).refresh()
        if md is None:
            raise ValueError(f"no table at {self.options['location']}")
        out = []
        for pf in md.spec.fields:
            if pf.transform_str in ("void",) or \
                    pf.transform_str.startswith("unknown"):
                raise ValueError(
                    f"format writes cannot compute "
                    f"{pf.transform_str}({pf.source_name}); use "
                    f"table.append")
            out.append((pf.name, pf.source_name, pf.transform_str,
                        md.schema.find_type(pf.source_name)))
        return out


def register_batch_source(spark) -> str:
    """Idempotently register; ships the package so planning workers can
    import it (read() itself needs pyarrow only)."""
    from linkedin_iceberg_spark.shipping import ship_package
    ship_package(spark)
    # runtime SQL conf (default false in 4.1): without it Spark refuses
    # any reader that implements pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(TableBatchDataSource)
    except Exception:
        pass  # already registered
    return SOURCE_NAME


def read_table(spark, table, snapshot_id=None, ref=None, as_of_ms=None,
               start_snapshot_id=None, end_snapshot_id=None):
    """Convenience: ``spark.read.format(...)`` over an engine table.
    ``start_snapshot_id``/``end_snapshot_id`` select the incremental
    append scan — rows appended in (start, end]."""
    register_batch_source(spark)
    r = spark.read.format(SOURCE_NAME) \
        .option("location", table.location) \
        .option("schemajson", json.dumps(
            table.schema.to_spark().jsonValue()))
    if snapshot_id:
        r = r.option("snapshot_id", str(snapshot_id))
    if ref:
        r = r.option("ref", ref)
    if as_of_ms:
        r = r.option("as_of_ms", str(as_of_ms))
    if start_snapshot_id:
        r = r.option("start_snapshot_id", str(start_snapshot_id))
    if end_snapshot_id:
        r = r.option("end_snapshot_id", str(end_snapshot_id))
    return r.load()
