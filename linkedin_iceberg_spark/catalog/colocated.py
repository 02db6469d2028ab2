"""Co-located bucket join: a ZERO-SHUFFLE join between two engine tables
bucketed on the join key.

The storage-partitioned-join idea (Iceberg's SPJ under Spark's DSv2
reportPartitioning, out of reach for a pure-Python source): when both
sides' partition specs bucket the join key with the SAME modulus, a row
with key k can only meet rows in the other table's SAME bucket — so the
join decomposes into n_buckets independent joins whose inputs are
already materialized as disjoint file sets.  A plain Spark join would
hash-shuffle BOTH tables end to end; here each bucket becomes ONE task
that reads both sides' bucket files and joins them in memory, and the
physical plan contains NO join operator and NO exchange at all — the
scan IS the join.  At 100 TB this is the difference between re-shuffling
two fact tables and streaming them once.

Scale shape and its cliff, named: per-bucket work is bounded by the
LARGER side's bucket bytes (both sides of one bucket must fit in a
task's memory for the pandas merge).  Bucket counts are chosen at table
design time exactly so that holds — the same contract Hive/Spark
bucketed joins and Iceberg SPJ carry.  A skewed bucket is a skewed task;
re-bucket with a higher n (spec evolution) when buckets outgrow memory.

Correctness contract: inner/left joins on the bucketed key, flat
schemas, parquet files, no pending row-level deletes, and every live
file bucketed under the CURRENT modulus.  Anything else falls back to
the plain Spark join (same rows, just with a shuffle) — the fallback is
the semantics; the co-located path is the fast plan.

ref: the reference plans bucketed scans but leaves join placement to
Spark (spark/src/.../IcebergSource.java); SPJ landed in the modern
format + Spark 3.3 DSv2 (SPARK-37377).
"""

from __future__ import annotations

import json as _json

from pyspark.sql import DataFrame


def _bucket_layout(table, key: str):
    """(modulus, {spec_id: partition_field_name}) from the CURRENT
    default spec's bucket on `key`; the map holds only specs whose
    bucket modulus MATCHES it, so files written under an older/other
    modulus (a table mid-rebucket) miss the map and force the fallback
    instead of mis-bucketing.  None when the current spec doesn't
    bucket the key."""
    import re
    md = table.metadata
    by_spec = {}   # spec_id -> (n, pname)
    for spec in md.bound_specs():
        for pf in spec.fields:
            m = re.match(r"bucket\[(\d+)\]$", pf.transform_str)
            if m and pf.source_name == key:
                by_spec[spec.spec_id] = (int(m.group(1)), pf.name)
    cur = by_spec.get(md.default_spec_id)
    if cur is None:
        return None
    n = cur[0]
    return n, {sid: pname for sid, (sn, pname) in by_spec.items()
               if sn == n}


def colocated_bucket_join(left, right, key: str, how: str = "inner",
                          left_cols: list = None,
                          right_cols: list = None,
                          right_key: str = None,
                          key_values: list = None,
                          left_filter=None,
                          right_filter=None) -> DataFrame:
    """Join two engine Tables on `key` (= `right_key` when the sides
    name it differently) bucket-by-bucket with no shuffle and no Spark
    join operator; falls back to the plain Spark join (one shuffle,
    identical rows) whenever the co-located contract doesn't hold.
    Bucket placement depends only on the VALUE (the spec's murmur3
    bucket transform), so equal keys land in equal buckets regardless
    of column name.  Non-key column names must be disjoint (alias
    first — the interval_join rule); with distinct key names both key
    columns appear in the output (SQL join semantics).

    ``key_values``: when the CALLER will restrict the key to these
    values anyway (a point-lookup join — `WHERE key IN (...)` applied
    on top of this frame), pass them and only the values' buckets are
    read on BOTH sides; rows of other keys sharing those buckets still
    come back, so the caller's filter stays load-bearing.  Sound for
    left joins too: left rows outside the values are exactly the rows
    the caller's filter drops.

    ``left_filter`` / ``right_filter`` (engine Expressions): FILE
    pruning only — each side plans through the standard scan pipeline
    (partition projection, metrics skip, dictionaries), dropping files
    that provably hold no rows satisfying the caller's post-join WHERE;
    surviving files are read WHOLE (no residual applied), so the caller
    must still apply the full WHERE.  Soundness is the caller's
    contract: a side filter must be a top-level AND conjunct of the
    post-join WHERE over that side's own columns — for how='left' pass
    left_filter only (pre-restricting the RIGHT side of a left join
    would change NULL-extension under IS-NULL-sensitive WHEREs; the SQL
    route enforces this)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    rkey = right_key or key
    lcols = left_cols or left.schema.column_names()
    rcols = right_cols or right.schema.column_names()
    if key not in lcols or rkey not in rcols:
        raise ValueError(f"join keys {key!r}/{rkey!r} must be selected "
                         "on their sides")
    shared = (set(lcols) & set(rcols)) - ({key} if key == rkey else set())
    if shared:
        raise ValueError("colocated_bucket_join requires disjoint "
                         f"non-key column names; shared: {sorted(shared)}")

    def _fallback():
        lf = left.to_df().select(*lcols)
        rf = right.to_df().select(*rcols)
        if key == rkey:
            return lf.join(rf, on=key, how=how)
        return lf.join(rf, on=lf[key] == rf[rkey], how=how)

    lb = _bucket_layout(left, key)
    rb = _bucket_layout(right, rkey)
    if lb is None or rb is None or lb[0] != rb[0]:
        return _fallback()  # unbucketed side or modulus mismatch

    sides = []
    for table, pnames, cols, flt in ((left, lb[1], lcols, left_filter),
                                     (right, rb[1], rcols,
                                      right_filter)):
        if any(not isinstance(f.type, str) for f in table.schema.fields):
            return _fallback()  # nested schemas: alignment is top-level
        scan = table.new_scan().filter(flt) if flt is not None \
            else table.new_scan()
        tasks = scan.plan_files()
        if any(t.deletes for t in tasks) or \
                any(t.file.file_format != "parquet" for t in tasks):
            return _fallback()
        by_bucket: dict = {}
        md = table.metadata
        current = md.schema
        rev_by_sid: dict = {}
        for t in tasks:
            pn = pnames.get(t.file.spec_id)
            b = (t.file.partition or {}).get(pn) if pn else None
            if b is None:
                return _fallback()  # un-bucketed file in the mix
            sid = t.file.schema_id
            if sid not in rev_by_sid:
                written = md.schema_by_id(sid)
                rev_by_sid[sid] = {
                    f.name: written.name_for_id(f.field_id)
                    for f in current.fields if f.name in cols
                    and written.name_for_id(f.field_id) is not None}
            by_bucket.setdefault(int(b), []).append(
                {"path": t.file.file_path, "sid": t.file.schema_id})
        sides.append((by_bucket, rev_by_sid, cols))

    (l_by, l_rev, _), (r_by, r_rev, _) = sides
    buckets = sorted(set(l_by)) if how == "left" \
        else sorted(set(l_by) & set(r_by))
    if key_values is not None:
        # point-lookup pruning: only the values' buckets can hold them
        kf = next(f for f in left.schema.fields if f.name == key)
        from linkedin_iceberg_spark.transforms.transforms import (
            parse_transform)
        tf = parse_transform(f"bucket[{lb[0]}]", kf.type)
        want = {tf.apply(v) for v in key_values if v is not None}
        buckets = [b for b in buckets if b in want]
    spark = left.spark
    from pyspark.sql.types import StructType
    out_schema = StructType(
        [next(f for f in left.schema.to_spark().fields
              if f.name == key)] +
        [f for f in left.schema.to_spark().fields
         if f.name in lcols and f.name != key] +
        ([next(f for f in right.schema.to_spark().fields
               if f.name == rkey)] if rkey != key else []) +
        [f for f in right.schema.to_spark().fields
         if f.name in rcols and f.name != rkey])
    if not buckets:
        return spark.createDataFrame([], out_schema)

    descs = []
    for b in buckets:
        descs.append((b, _json.dumps({
            "left": l_by.get(b, []), "right": r_by.get(b, []),
            "l_rev": {str(s): m for s, m in l_rev.items()},
            "r_rev": {str(s): m for s, m in r_rev.items()},
        })))
    l_names = [c for c in lcols if c != key]
    r_names = [c for c in rcols if c != rkey]
    out_names = [key] + l_names + ([rkey] if rkey != key else []) + r_names
    how_ = how
    # target arrow types per output column: missing columns (schema
    # evolution) materialize as TYPED null arrays, and every file's
    # physical type casts up to the current engine type
    import pyarrow as pa

    from linkedin_iceberg_spark.catalog.local_read import type_to_arrow
    arrow_types = {}
    for tbl_, cols_ in ((left, lcols), (right, rcols)):
        for f in tbl_.schema.fields:
            if f.name in cols_:
                arrow_types[f.name] = type_to_arrow(f.type)
    ser_types = pa.schema(
        [pa.field(n, t) for n, t in sorted(arrow_types.items())]) \
        .serialize().to_pybytes()

    def join_bucket(batches):
        import json as _j

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tgt = {f.name: f.type for f in
               _pa.ipc.read_schema(_pa.py_buffer(ser_types))}

        def read_side(splits, rev, want):
            tbls = []
            for sp in splits:
                m = rev.get(str(sp["sid"]), {})
                pf = _pq.ParquetFile(sp["path"])
                have = set(pf.schema_arrow.names)
                cols = [m[c] for c in want if m.get(c) in have]
                t = pf.read(columns=cols or None)
                # current-name alignment (renames are field-id safe)
                t = t.rename_columns(
                    [next((c for c, s in m.items() if s == n), n)
                     for n in t.column_names])
                data = {}
                for c in want:
                    if c in t.column_names:
                        arr = t[c].combine_chunks()
                        data[c] = arr if arr.type == tgt[c] \
                            else arr.cast(tgt[c])
                    else:
                        data[c] = _pa.nulls(len(t), tgt[c])
                tbls.append(_pa.table(data))
            if not tbls:
                return None
            # arrow-backed dtypes: integer NULLs survive the merge (a
            # numpy-backed frame would float-promote them and the
            # arrow write-back of a left join's missing side would
            # reject NaN-as-int)
            return _pa.concat_tables(tbls) \
                .to_pandas(types_mapper=_pd.ArrowDtype)

        for pdf in batches:
            for desc_s in pdf["desc"]:
                d = _j.loads(desc_s)
                lp = read_side(d["left"], d["l_rev"], [key] + l_names)
                if lp is None or not len(lp):
                    continue
                rp = read_side(d["right"], d["r_rev"], [rkey] + r_names)
                lonely = [rkey] + r_names if rkey != key else r_names
                if rp is None or not len(rp):
                    if how_ == "inner":
                        continue
                    out = lp.copy()
                    for c in lonely:  # lonely left bucket: NULL right
                        out[c] = None
                elif rkey == key:
                    out = lp.merge(rp, on=key, how=how_)
                else:
                    out = lp.merge(rp, left_on=key, right_on=rkey,
                                   how=how_)
                if len(out):
                    yield out[out_names]

    rdd = spark.sparkContext.parallelize(descs, len(descs))
    seed = spark.createDataFrame(rdd, "bucket long, desc string")
    return seed.mapInPandas(join_bucket, schema=out_schema)


def colocated_feature_assembly(base, key: str, features: list,
                               base_cols: list = None,
                               how: str = "left",
                               key_values: list = None) -> DataFrame:
    """N-way zero-shuffle feature assembly over a shared entity key —
    the training-data pattern (user/document features scattered across
    N tables, all bucketed on the entity id, assembled into one wide
    frame) that would otherwise cost N-1 full shuffles of the base.

    ``features`` is a list of ``(table, feature_key, cols)`` (cols may
    be None = all): every table, base included, must bucket its key
    with ONE modulus.  Each bucket becomes one task that reads the
    base's and every feature's bucket files and merges them in memory
    (how='left' keeps every base row, NULL-filling absent features —
    the assembly default; 'inner' intersects).  The output carries the
    key once plus each side's non-key columns (disjoint names
    required).  Any contract violation falls back to chained Spark
    joins with identical rows.  ``key_values`` prunes to the values'
    buckets, as in colocated_bucket_join.

    Scale cliff, named: one task holds ONE bucket of every side at
    once — bucket counts must be sized so the WIDEST assembly fits a
    task (the same contract as the 2-way join, times N sides)."""
    import json as _json2

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    bcols = base_cols or base.schema.column_names()
    if key not in bcols:
        raise ValueError(f"key {key!r} must be selected on the base")
    feats = [(t, fk, cols or t.schema.column_names())
             for t, fk, cols in features]
    for t, fk, cols in feats:
        if fk not in cols:
            raise ValueError(f"feature key {fk!r} must be selected")
    claimed = set(bcols) - {key}
    for _t, fk, cols in feats:
        non_key = set(cols) - {fk}
        clash = claimed & non_key
        if fk != key and fk in claimed:
            clash |= {fk}  # a feature key shadowing another side's col
        if clash:
            raise ValueError("colocated_feature_assembly requires "
                             f"disjoint non-key columns; shared: "
                             f"{sorted(clash)}")
        claimed |= non_key

    def _fallback():
        out = base.to_df().select(*bcols)
        for t, fk, cols in feats:
            f_df = t.to_df().select(*cols)
            if fk == key:
                out = out.join(f_df, on=key, how=how)
            else:
                out = out.join(f_df, on=out[key] == f_df[fk], how=how) \
                    .drop(fk)
        return out

    layouts = [_bucket_layout(base, key)] + \
        [_bucket_layout(t, fk) for t, fk, _ in feats]
    if any(lo is None for lo in layouts) or \
            len({lo[0] for lo in layouts}) != 1:
        return _fallback()

    all_sides = [(base, key, bcols, layouts[0][1])] + \
        [(t, fk, cols, lo[1]) for (t, fk, cols), lo
         in zip(feats, layouts[1:])]
    planned = []
    for table, skey, cols, pnames in all_sides:
        if any(not isinstance(f.type, str) for f in table.schema.fields):
            return _fallback()
        tasks = table.new_scan().plan_files()
        if any(t.deletes for t in tasks) or \
                any(t.file.file_format != "parquet" for t in tasks):
            return _fallback()
        by_bucket: dict = {}
        md = table.metadata
        rev_by_sid: dict = {}
        for t in tasks:
            pn = pnames.get(t.file.spec_id)
            b = (t.file.partition or {}).get(pn) if pn else None
            if b is None:
                return _fallback()
            sid = t.file.schema_id
            if sid not in rev_by_sid:
                written = md.schema_by_id(sid)
                rev_by_sid[sid] = {
                    f.name: written.name_for_id(f.field_id)
                    for f in md.schema.fields if f.name in cols
                    and written.name_for_id(f.field_id) is not None}
            by_bucket.setdefault(int(b), []).append(
                {"path": t.file.file_path, "sid": t.file.schema_id})
        planned.append((by_bucket, rev_by_sid))

    buckets = set(planned[0][0])
    if how == "inner":
        for by, _ in planned[1:]:
            buckets &= set(by)
    buckets = sorted(buckets)
    if key_values is not None:
        kf = next(f for f in base.schema.fields if f.name == key)
        from linkedin_iceberg_spark.transforms.transforms import (
            parse_transform)
        tf = parse_transform(f"bucket[{layouts[0][0]}]", kf.type)
        want = {tf.apply(v) for v in key_values if v is not None}
        buckets = [b for b in buckets if b in want]

    import pyarrow as pa

    from linkedin_iceberg_spark.catalog.local_read import type_to_arrow
    spark = base.spark
    from pyspark.sql.types import StructType
    side_names = []   # per side: [key-or-fk] + non-key cols, in order
    out_fields = [next(f for f in base.schema.to_spark().fields
                       if f.name == key)]
    arrow_types = {}
    for i, (table, skey, cols, _pn) in enumerate(all_sides):
        names = [skey] + [c for c in cols if c != skey]
        side_names.append(names)
        sf = {f.name: f for f in table.schema.to_spark().fields}
        for f in table.schema.fields:
            if f.name in names:
                arrow_types[(i, f.name)] = type_to_arrow(f.type)
        out_fields += [sf[c] for c in names[1:]]
    out_schema = StructType(out_fields)
    if not buckets:
        return spark.createDataFrame([], out_schema)
    ser_types = pa.schema(
        [pa.field(f"{i}::{n}", t)
         for (i, n), t in sorted(arrow_types.items())]) \
        .serialize().to_pybytes()

    descs = []
    for b in buckets:
        descs.append((b, _json2.dumps([
            {"splits": by.get(b, []),
             "rev": {str(s): mm for s, mm in rev.items()}}
            for by, rev in planned])))
    keys_per_side = [names[0] for names in side_names]
    nonkey_per_side = [names[1:] for names in side_names]
    out_names = [key] + [c for names in nonkey_per_side for c in names]
    how_ = how

    def assemble(batches):
        import json as _j

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tgt = {}
        for f in _pa.ipc.read_schema(_pa.py_buffer(ser_types)):
            i, n = f.name.split("::", 1)
            tgt[(int(i), n)] = f.type

        def read_side(i, splits, rev, want):
            tbls = []
            for sp in splits:
                m = rev.get(str(sp["sid"]), {})
                pf = _pq.ParquetFile(sp["path"])
                have = set(pf.schema_arrow.names)
                cols = [m[c] for c in want if m.get(c) in have]
                t = pf.read(columns=cols or None)
                t = t.rename_columns(
                    [next((c for c, s in m.items() if s == n), n)
                     for n in t.column_names])
                data = {}
                for c in want:
                    ty = tgt[(i, c)]
                    if c in t.column_names:
                        arr = t[c].combine_chunks()
                        data[c] = arr if arr.type == ty \
                            else arr.cast(ty)
                    else:
                        data[c] = _pa.nulls(len(t), ty)
                tbls.append(_pa.table(data))
            if not tbls:
                return None
            return _pa.concat_tables(tbls) \
                .to_pandas(types_mapper=_pd.ArrowDtype)

        for pdf in batches:
            for desc_s in pdf["desc"]:
                sides_d = _j.loads(desc_s)
                out = read_side(0, sides_d[0]["splits"],
                                sides_d[0]["rev"],
                                [keys_per_side[0]] + nonkey_per_side[0])
                if out is None or not len(out):
                    continue
                alive = True
                for i in range(1, len(sides_d)):
                    fk = keys_per_side[i]
                    want = [fk] + nonkey_per_side[i]
                    fp = read_side(i, sides_d[i]["splits"],
                                   sides_d[i]["rev"], want)
                    if fp is None or not len(fp):
                        if how_ == "inner":
                            alive = False
                            break
                        for c in nonkey_per_side[i]:
                            out[c] = None
                        continue
                    if fk == key:
                        out = out.merge(fp, on=key, how=how_)
                    else:
                        out = out.merge(fp, left_on=key, right_on=fk,
                                        how=how_).drop(columns=[fk])
                    if not len(out):
                        alive = False
                        break
                if alive and len(out):
                    yield out[out_names]

    rdd = spark.sparkContext.parallelize(descs, len(descs))
    seed = spark.createDataFrame(rdd, "bucket long, desc string")
    return seed.mapInPandas(assemble, schema=out_schema)


def colocated_multikey_assembly(base, key_feats: list,
                                base_cols: list = None,
                                how: str = "left") -> DataFrame:
    """TWO-KEY (N-key) zero-shuffle star assembly (r11): dims anchor
    DIFFERENT base keys — ``FROM base JOIN d1 ON base.k1 = d1.a JOIN
    d2 ON base.k2 = d2.b`` — and the base's spec buckets EVERY anchored
    key (a multi-field bucket spec), each dim bucketing its key with
    its key group's modulus (moduli may differ ACROSS keys).

    Decomposition: a base partition is a GRID CELL (bucket(k1)=i,
    bucket(k2)=j, ...); a base row in cell (i, j) can only meet d1 rows
    in d1's bucket i and d2 rows in d2's bucket j, so each occupied
    cell is one independent in-memory assembly — no exchange, no Spark
    join operator, the scan is the join (the same argument as
    `colocated_feature_assembly`, once per key axis).

    Scale trade-off, named: dim bucket i of key k1 is read by EVERY
    occupied cell (i, *) — up to prod(other keys' moduli) times.  The
    grid wins when dims are feature tables much smaller than the base
    (the star norm); for dims comparable to the base a shuffle join
    reads less total bytes — callers choose, and every contract
    violation falls back to chained Spark joins with identical rows.

    ``key_feats``: list of (base_key, feature_table, feature_key,
    cols-or-None)."""
    import json as _json2

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    bcols = base_cols or base.schema.column_names()
    base_keys = []
    for bk, _t, _fk, _c in key_feats:
        if bk not in base_keys:
            base_keys.append(bk)
    for bk in base_keys:
        if bk not in bcols:
            raise ValueError(f"key {bk!r} must be selected on the base")
    feats = [(bk, t, fk, cols or t.schema.column_names())
             for bk, t, fk, cols in key_feats]
    for _bk, t, fk, cols in feats:
        if fk not in cols:
            raise ValueError(f"feature key {fk!r} must be selected")
    claimed = set(bcols)
    for _bk, _t, fk, cols in feats:
        non_key = set(cols) - {fk}
        clash = claimed & non_key
        if fk not in base_keys and fk in claimed:
            clash |= {fk}
        if clash:
            raise ValueError("colocated_multikey_assembly requires "
                             f"disjoint non-key columns; shared: "
                             f"{sorted(clash)}")
        claimed |= non_key

    def _fallback():
        out = base.to_df().select(*bcols)
        for bk, t, fk, cols in feats:
            f_df = t.to_df().select(*cols)
            if fk == bk:
                out = out.join(f_df, on=bk, how=how)
            else:
                out = out.join(f_df, on=out[bk] == f_df[fk], how=how) \
                    .drop(fk)
        return out

    # per key group: base layout + each anchored dim's layout, one
    # modulus within the group
    base_lo = {bk: _bucket_layout(base, bk) for bk in base_keys}
    if any(lo is None for lo in base_lo.values()):
        return _fallback()
    feat_lo = []
    for bk, t, fk, _cols in feats:
        lo = _bucket_layout(t, fk)
        if lo is None or lo[0] != base_lo[bk][0]:
            return _fallback()
        feat_lo.append(lo)

    # plan the base into grid cells and each dim into buckets
    def _plan(table, cols, cell_of):
        """{cell: [split dicts]}, rev maps; None on contract breach."""
        if any(not isinstance(f.type, str)
               for f in table.schema.fields):
            return None
        tasks = table.new_scan().plan_files()
        if any(t.deletes for t in tasks) or \
                any(t.file.file_format != "parquet" for t in tasks):
            return None
        by_cell: dict = {}
        md = table.metadata
        rev_by_sid: dict = {}
        for t in tasks:
            cell = cell_of(t.file)
            if cell is None:
                return None
            sid = t.file.schema_id
            if sid not in rev_by_sid:
                written = md.schema_by_id(sid)
                rev_by_sid[sid] = {
                    f.name: written.name_for_id(f.field_id)
                    for f in md.schema.fields if f.name in cols
                    and written.name_for_id(f.field_id) is not None}
            by_cell.setdefault(cell, []).append(
                {"path": t.file.file_path, "sid": t.file.schema_id})
        return by_cell, rev_by_sid

    def _base_cell(file):
        out = []
        for bk in base_keys:
            pn = base_lo[bk][1].get(file.spec_id)
            b = (file.partition or {}).get(pn) if pn else None
            if b is None:
                return None
            out.append(int(b))
        return tuple(out)

    planned_base = _plan(base, bcols, _base_cell)
    if planned_base is None:
        return _fallback()
    planned_feats = []
    for (bk, t, fk, cols), lo in zip(feats, feat_lo):
        def _feat_cell(file, _pn=lo[1]):
            pn = _pn.get(file.spec_id)
            b = (file.partition or {}).get(pn) if pn else None
            return None if b is None else int(b)
        pf = _plan(t, cols, _feat_cell)
        if pf is None:
            return _fallback()
        planned_feats.append(pf)

    cells = set(planned_base[0])
    if how == "inner":
        for (bk, _t, _fk, _c), (by, _rev) in zip(feats, planned_feats):
            axis = base_keys.index(bk)
            cells = {c for c in cells if c[axis] in by}
    cells = sorted(cells)

    import pyarrow as pa

    from linkedin_iceberg_spark.catalog.local_read import type_to_arrow
    spark = base.spark
    from pyspark.sql.types import StructType
    all_sides = [(base, None, bcols)] + \
        [(t, fk, cols) for _bk, t, fk, cols in feats]
    arrow_types = {}
    sf_base = {f.name: f for f in base.schema.to_spark().fields}
    out_fields = [sf_base[c] for c in bcols]
    for i, (table, fk, cols) in enumerate(all_sides):
        for f in table.schema.fields:
            if f.name in cols:
                arrow_types[(i, f.name)] = type_to_arrow(f.type)
        if i > 0:
            sf = {f.name: f for f in table.schema.to_spark().fields}
            out_fields += [sf[c] for c in cols if c != fk]
    out_schema = StructType(out_fields)
    if not cells:
        return spark.createDataFrame([], out_schema)
    ser_types = pa.schema(
        [pa.field(f"{i}::{n}", t)
         for (i, n), t in sorted(arrow_types.items())]) \
        .serialize().to_pybytes()

    descs = []
    for c in cells:
        sides = [{"splits": planned_base[0][c],
                  "rev": {str(s): mm for s, mm
                          in planned_base[1].items()}}]
        for (bk, _t, _fk, _cl), (by, rev) in zip(feats, planned_feats):
            axis = base_keys.index(bk)
            sides.append({"splits": by.get(c[axis], []),
                          "rev": {str(s): mm for s, mm
                                  in rev.items()}})
        descs.append((int(c[0]), _json2.dumps(sides)))
    anchor_per_feat = [bk for bk, _t, _fk, _c in feats]
    fkey_per_feat = [fk for _bk, _t, fk, _c in feats]
    nonkey_per_feat = [[c for c in cols if c != fk]
                       for _bk, _t, fk, cols in feats]
    out_names = list(bcols) + [c for nk in nonkey_per_feat for c in nk]
    how_ = how
    bcols_ = list(bcols)

    def assemble(batches):
        import json as _j

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tgt = {}
        for f in _pa.ipc.read_schema(_pa.py_buffer(ser_types)):
            i, n = f.name.split("::", 1)
            tgt[(int(i), n)] = f.type

        def read_side(i, splits, rev, want):
            tbls = []
            for sp in splits:
                m = rev.get(str(sp["sid"]), {})
                pf = _pq.ParquetFile(sp["path"])
                have = set(pf.schema_arrow.names)
                cols = [m[c] for c in want if m.get(c) in have]
                t = pf.read(columns=cols or None)
                t = t.rename_columns(
                    [next((c for c, s in m.items() if s == n), n)
                     for n in t.column_names])
                data = {}
                for c in want:
                    ty = tgt[(i, c)]
                    if c in t.column_names:
                        arr = t[c].combine_chunks()
                        data[c] = arr if arr.type == ty \
                            else arr.cast(ty)
                    else:
                        data[c] = _pa.nulls(len(t), ty)
                tbls.append(_pa.table(data))
            if not tbls:
                return None
            return _pa.concat_tables(tbls) \
                .to_pandas(types_mapper=_pd.ArrowDtype)

        for pdf in batches:
            for desc_s in pdf["desc"]:
                sides_d = _j.loads(desc_s)
                out = read_side(0, sides_d[0]["splits"],
                                sides_d[0]["rev"], bcols_)
                if out is None or not len(out):
                    continue
                alive = True
                for i in range(1, len(sides_d)):
                    bk = anchor_per_feat[i - 1]
                    fk = fkey_per_feat[i - 1]
                    want = [fk] + nonkey_per_feat[i - 1]
                    fp = read_side(i, sides_d[i]["splits"],
                                   sides_d[i]["rev"], want)
                    if fp is None or not len(fp):
                        if how_ == "inner":
                            alive = False
                            break
                        for c in nonkey_per_feat[i - 1]:
                            out[c] = None
                        continue
                    if fk == bk:
                        out = out.merge(fp, on=bk, how=how_)
                    else:
                        out = out.merge(fp, left_on=bk, right_on=fk,
                                        how=how_).drop(columns=[fk])
                    if not len(out):
                        alive = False
                        break
                if alive and len(out):
                    yield out[out_names]

    rdd = spark.sparkContext.parallelize(descs, len(descs))
    seed = spark.createDataFrame(rdd, "bucket long, desc string")
    return seed.mapInPandas(assemble, schema=out_schema)


_GROUPBY_FUNCS = {"count", "count_distinct", "sum", "min", "max", "avg"}


def colocated_groupby(table, key, aggs: list,
                      key_values: list = None) -> DataFrame:
    """ZERO-SHUFFLE GROUP BY containing the bucket key: when the
    table's current spec buckets one of the group columns, every group
    lives wholly inside one bucket (the bucket key functionally
    determines the bucket), so the aggregation decomposes into
    n_buckets independent jobs whose inputs are already materialized as
    disjoint file sets — each bucket becomes ONE task that
    partial-aggregates its files and combines in memory, and the
    physical plan contains NO exchange and NO Spark aggregate operator
    at all.  A plain `groupBy` would hash-shuffle the whole table; at
    100 TB on a pre-bucketed entity key (user_id, doc_id) this is the
    shuffle the layout already paid for at write time.

    ``key`` is the group column list (a string is a single-column
    group); exactly the SQL GROUP BY list, in output order.  One of
    them must be the bucketed column — secondary group columns
    (GROUP BY user_id, event_type) ride along free because they cannot
    split a group across buckets.

    ``aggs`` is a list of ``(func, col, alias)`` with func in
    count / count_distinct / sum / min / max / avg (col None = count(*)).
    Groups with only NULLs yield SQL semantics (sum/min/max/avg NULL,
    counts 0); NULL values in SECONDARY group columns form their own
    groups (SQL GROUP BY), while rows with a NULL bucket key live in
    the spec's null partition and force the fallback (their files carry
    no bucket ordinal).

    ``key_values``: restrict the result to these bucket-key values —
    only their buckets are READ (file-level pruning) and the key filter
    applies exactly in the task (filtering on a group column commutes
    with grouping, so this equals WHERE key IN (...) GROUP BY ...).

    Falls back to the plain Spark groupBy (identical rows, one shuffle)
    whenever the co-located contract doesn't hold: unbucketed or
    mid-rebucket layout, pending row-level deletes, non-parquet files,
    nested schemas.

    Scale shape and its cliff, named: task memory is bounded by the
    GROUP count per bucket (plus distinct (group, col) tuples for
    count_distinct), not rows — files partial-aggregate one at a time.
    ref: the reference plans bucketed scans but leaves aggregation to
    Spark (spark/src/.../IcebergSource.java); storage-partitioned
    aggregation is the SPJ idea (SPARK-37377) applied to GROUP BY."""
    import json as _json3

    gcols = [key] if isinstance(key, str) else list(key)
    if not gcols or len(set(gcols)) != len(gcols):
        raise ValueError(f"invalid group column list {gcols!r}")
    known = set(table.schema.column_names())
    for c in gcols:
        if c not in known:
            raise ValueError(f"no such column {c!r}")
    for fn, col, alias in aggs:
        if fn not in _GROUPBY_FUNCS:
            raise ValueError(f"unsupported agg {fn!r} (supported: "
                             f"{sorted(_GROUPBY_FUNCS)})")
        if col is None and fn != "count":
            raise ValueError(f"{fn} requires a column")
        if col is not None and col not in known:
            raise ValueError(f"no such column {col!r}")
    if len({a for _, _, a in aggs}) != len(aggs):
        raise ValueError("duplicate output aliases")

    from pyspark.sql import functions as F

    bucket_col = next((c for c in gcols
                       if _bucket_layout(table, c) is not None), None)

    def _fallback():
        df = table.to_df()
        if key_values is not None:
            kc = bucket_col or gcols[0]
            df = df.filter(F.col(kc).isin(list(key_values)))
        sparks = []
        for fn, col, alias in aggs:
            if fn == "count":
                sparks.append((F.count(F.lit(1)) if col is None
                               else F.count(F.col(col))).alias(alias))
            elif fn == "count_distinct":
                sparks.append(F.count_distinct(F.col(col)).alias(alias))
            elif fn == "avg":
                sparks.append(F.avg(F.col(col)).alias(alias))
            else:
                sparks.append(getattr(F, fn)(F.col(col)).alias(alias))
        return df.groupBy(*gcols).agg(*sparks)

    if bucket_col is None:
        return _fallback()
    if any(not isinstance(f.type, str) for f in table.schema.fields):
        return _fallback()
    n_buckets, pnames = _bucket_layout(table, bucket_col)
    tasks = table.new_scan().plan_files()
    if any(t.deletes for t in tasks) or \
            any(t.file.file_format != "parquet" for t in tasks):
        return _fallback()
    need = sorted(set(gcols) | {c for _, c, _ in aggs if c is not None})
    md = table.metadata
    current = md.schema
    by_bucket: dict = {}
    rev_by_sid: dict = {}
    for t in tasks:
        pn = pnames.get(t.file.spec_id)
        b = (t.file.partition or {}).get(pn) if pn else None
        if b is None:
            return _fallback()  # un-bucketed (or null-key) file
        sid = t.file.schema_id
        if sid not in rev_by_sid:
            written = md.schema_by_id(sid)
            rev_by_sid[sid] = {
                f.name: written.name_for_id(f.field_id)
                for f in current.fields if f.name in need
                and written.name_for_id(f.field_id) is not None}
        by_bucket.setdefault(int(b), []).append(
            {"path": t.file.file_path, "sid": t.file.schema_id})

    buckets = sorted(by_bucket)
    if key_values is not None:
        kf = next(f for f in table.schema.fields
                  if f.name == bucket_col)
        from linkedin_iceberg_spark.transforms.transforms import (
            parse_transform)
        tf = parse_transform(f"bucket[{n_buckets}]", kf.type)
        want_b = {tf.apply(v) for v in key_values if v is not None}
        buckets = [b for b in buckets if b in want_b]

    import pyarrow as pa
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from linkedin_iceberg_spark.catalog.local_read import type_to_arrow
    spark_fields = {f.name: f for f in table.schema.to_spark().fields}
    out_fields = [spark_fields[c] for c in gcols]
    for fn, col, alias in aggs:
        if fn in ("count", "count_distinct"):
            out_fields.append(StructField(alias, LongType(), False))
        elif fn == "avg":
            out_fields.append(StructField(alias, DoubleType(), True))
        elif fn == "sum":
            src = spark_fields[col].dataType.simpleString()
            out_fields.append(StructField(
                alias, LongType() if src in ("int", "bigint")
                else DoubleType(), True))
        else:  # min/max keep the column's type
            out_fields.append(StructField(
                alias, spark_fields[col].dataType, True))
    out_schema = StructType(out_fields)
    spark = table.spark
    if not buckets:
        return spark.createDataFrame([], out_schema)

    arrow_types = {c: type_to_arrow(
        next(f.type for f in table.schema.fields if f.name == c))
        for c in need}
    ser_types = pa.schema(
        [pa.field(n, t) for n, t in sorted(arrow_types.items())]) \
        .serialize().to_pybytes()
    descs = [(b, _json3.dumps({
        "splits": by_bucket[b],
        "rev": {str(s): m for s, m in rev_by_sid.items()},
    })) for b in buckets]
    aggs_ = list(aggs)
    kv = sorted(key_values) if key_values is not None else None
    out_names = list(gcols) + [a for _, _, a in aggs_]
    gcols_ = list(gcols)
    bkey = bucket_col

    def agg_bucket(batches):
        import json as _j

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tgt = {f.name: f.type for f in
               _pa.ipc.read_schema(_pa.py_buffer(ser_types))}
        lv = list(range(len(gcols_)))

        def read_file(sp, rev):
            m = rev.get(str(sp["sid"]), {})
            pf = _pq.ParquetFile(sp["path"])
            have = set(pf.schema_arrow.names)
            cols = [m[c] for c in need if m.get(c) in have]
            t = pf.read(columns=cols or None)
            t = t.rename_columns(
                [next((c for c, s in m.items() if s == n), n)
                 for n in t.column_names])
            data = {}
            for c in need:
                if c in t.column_names:
                    arr = t[c].combine_chunks()
                    data[c] = arr if arr.type == tgt[c] \
                        else arr.cast(tgt[c])
                else:
                    data[c] = _pa.nulls(len(t), tgt[c])
            return _pa.table(data).to_pandas(types_mapper=_pd.ArrowDtype)

        for pdf in batches:
            for desc_s in pdf["desc"]:
                d = _j.loads(desc_s)
                partials = []   # per-file partial aggregate frames
                pairs = []      # per-file distinct (group, col) frames
                raw_keys = []   # per-file group keys BEFORE any dropna
                only_distinct = all(fn == "count_distinct"
                                    for fn, _c, _a in aggs_)
                for sp in d["splits"]:
                    f = read_file(sp, d["rev"])
                    f = f[f[bkey].notna()]
                    if kv is not None:
                        f = f[f[bkey].isin(kv)]
                    if not len(f):
                        continue
                    if only_distinct:
                        # distinct-only agg lists have no partial-agg
                        # index to define the group set; groups all-NULL
                        # in every counted column must still appear
                        # (SQL returns them with count 0)
                        raw_keys.append(f[gcols_].drop_duplicates())
                    # dropna=False: NULLs in SECONDARY group columns
                    # form their own groups, SQL GROUP BY semantics
                    g = f.groupby(gcols_, sort=False, dropna=False)
                    part = {}
                    for fn, col, alias in aggs_:
                        if fn == "count":
                            part[f"c::{alias}"] = g.size() if col is None \
                                else g[col].count()
                        elif fn == "sum":
                            part[f"s::{alias}"] = g[col].sum(min_count=1)
                        elif fn == "min":
                            part[f"n::{alias}"] = g[col].min()
                        elif fn == "max":
                            part[f"x::{alias}"] = g[col].max()
                        elif fn == "avg":
                            part[f"as::{alias}"] = g[col].sum(min_count=1)
                            part[f"ac::{alias}"] = g[col].count()
                        elif fn == "count_distinct":
                            # a group column counted DISTINCT would
                            # duplicate the pandas label — select it
                            # once (distinct-of-key within a key group
                            # is 1 non-null row)
                            sel = f[gcols_] if col in gcols_ \
                                else f[gcols_ + [col]]
                            pairs.append((alias, sel
                                          .dropna(subset=[col])
                                          .drop_duplicates()))
                    if part:
                        partials.append(_pd.DataFrame(part))
                if not partials and not pairs and not raw_keys:
                    continue
                merged = None
                if partials:
                    allp = _pd.concat(partials)

                    def _sum_keep_null(x):
                        # SQL sum over only-NULL partials is NULL, not 0
                        return x.sum(min_count=1)

                    combine = {}
                    for c in allp.columns:
                        kind = c.split("::", 1)[0]
                        combine[c] = {"c": "sum", "s": _sum_keep_null,
                                      "n": "min", "x": "max",
                                      "as": _sum_keep_null,
                                      "ac": "sum"}[kind]
                    merged = allp.groupby(level=lv, sort=False,
                                          dropna=False).agg(combine)

                def _distinct_counts(alias):
                    pf_ = [p for a, p in pairs if a == alias]
                    if not pf_:
                        return None
                    u = _pd.concat(pf_).drop_duplicates()
                    return u.groupby(gcols_, sort=False,
                                     dropna=False).size()

                if merged is not None:
                    idx = merged.index
                else:
                    # all-distinct agg list: the group set comes from
                    # the RAW pre-dropna group keys, so groups whose
                    # rows are NULL in every counted column survive
                    idx = (_pd.concat(raw_keys).drop_duplicates()
                           .groupby(gcols_, sort=False, dropna=False)
                           .size().index)
                out = _pd.DataFrame(index=idx)
                for fn, col, alias in aggs_:
                    if fn == "count":
                        out[alias] = merged[f"c::{alias}"].fillna(0)
                    elif fn == "sum":
                        out[alias] = merged[f"s::{alias}"]
                    elif fn == "min":
                        out[alias] = merged[f"n::{alias}"]
                    elif fn == "max":
                        out[alias] = merged[f"x::{alias}"]
                    elif fn == "avg":
                        s = merged[f"as::{alias}"].astype("float64[pyarrow]")
                        c = merged[f"ac::{alias}"]
                        out[alias] = s / c.where(c > 0)
                    elif fn == "count_distinct":
                        cd = _distinct_counts(alias)
                        out[alias] = (cd.reindex(out.index).fillna(0)
                                      if cd is not None else 0)
                if len(out):
                    yield out.reset_index(names=gcols_)[out_names]

    rdd = spark.sparkContext.parallelize(descs, len(descs))
    seed = spark.createDataFrame(rdd, "bucket long, desc string")
    return seed.mapInPandas(agg_bucket, schema=out_schema)
