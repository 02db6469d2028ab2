"""Per-file column metrics from Parquet footers.

ref: api/.../Metrics.java:32-44 (recordCount, valueCounts, nullValueCounts,
nanValueCounts, lowerBounds, upperBounds), core/.../MetricsModes.java:34-96
(default truncate(16)), api/.../util/UnicodeUtil.java (string bound
truncation with upper-bound increment).

The write path reads footers back with pyarrow — exact stats, no second data
pass (same strategy as the reference's SparkAppenderFactory footer
collection).  Row-group stats are aggregated to file level."""

from __future__ import annotations

import datetime as _dt
import math
import re
from decimal import Decimal
from typing import Optional

import pyarrow.parquet as pq

TRUNCATE_LEN = 16


def truncate_lower(s: str, length: int = TRUNCATE_LEN) -> str:
    return s[:length]


def truncate_upper(s: str, length: int = TRUNCATE_LEN):
    """Truncate an upper bound UP: increment the last kept char so the
    truncated bound still sorts >= every real value (ref: UnicodeUtil
    truncateStringMax).  Returns None if un-incrementable (all U+10FFFF)."""
    if len(s) <= length:
        return s
    prefix = s[:length]
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp == 0xD7FF:
            # skip the surrogate block — U+D800..U+DFFF are not valid
            # scalar values (ref: UnicodeUtil.truncateStringMax skips
            # invalid code points)
            chars[i] = chr(0xE000)
            return "".join(chars[: i + 1])
        if cp < 0x10FFFF:
            chars[i] = chr(cp + 1)
            return "".join(chars[: i + 1])
    return None


def _normalize(v, type_str: str):
    """pyarrow footer stat -> native comparable (matching serde decode types)."""
    if v is None:
        return None
    if type_str == "date":
        if isinstance(v, _dt.date):
            return v
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
    if type_str in ("timestamp", "timestamptz"):
        if isinstance(v, _dt.datetime):
            return v.replace(tzinfo=None) if v.tzinfo else v
        return v
    if type_str.startswith("decimal"):
        return v if isinstance(v, Decimal) else Decimal(str(v))
    if type_str in ("float", "double"):
        return float(v)
    if type_str in ("int", "long", "time"):
        return int(v)
    if type_str == "string":
        return v if isinstance(v, str) else v.decode("utf-8", "replace")
    if type_str == "binary" or type_str.startswith("fixed"):
        return bytes(v) if not isinstance(v, bytes) else v
    return v


def _parse_metrics_mode(mode: str) -> tuple:
    """mode string -> (kind, trunc_len): kind none|counts|bounds,
    trunc_len None = untruncated (``full``)."""
    mode = (mode or "").strip().lower()
    if mode == "none":
        return ("none", None)
    if mode == "counts":
        return ("counts", None)
    if mode.startswith("truncate"):
        m = re.match(r"truncate\((\d+)\)", mode)
        return ("bounds", int(m.group(1)) if m else TRUNCATE_LEN)
    return ("bounds", None)  # "full"


def collect_file_stats(path: str, schema, mode: str = "truncate(16)",
                       column_modes: Optional[dict] = None) -> dict:
    """Returns dict with record_count, file_size, value_counts,
    null_value_counts, nan_value_counts, lower_bounds, upper_bounds —
    all keyed by our field ids (top-level primitive columns only; nested
    columns get counts but no bounds, like the reference's default).

    ``mode`` mirrors MetricsModes.java:34-96 — ``none`` (record count
    only), ``counts`` (value/null counts, no bounds), ``truncate(N)``
    (bounds, strings truncated to N; the reference default N=16), ``full``
    (untruncated bounds).  ``column_modes`` overrides per COLUMN NAME
    (the reference's write.metadata.metrics.column.<name> properties),
    e.g. {"payload": "none", "url": "full"}."""
    md = pq.read_metadata(path)
    kind, trunc_len = _parse_metrics_mode(mode)
    overrides = {name: _parse_metrics_mode(m)
                 for name, m in (column_modes or {}).items()}
    if kind == "none" and not overrides:
        return {
            "record_count": md.num_rows,
            "file_size_in_bytes": _file_size(path),
            "value_counts": {}, "null_value_counts": {},
            "nan_value_counts": {}, "lower_bounds": {}, "upper_bounds": {},
        }
    # leaf column index -> dotted path
    leaf_paths = [md.schema.column(i).path for i in range(md.num_columns)]

    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    nan_counts: dict[int, int] = {}
    lowers: dict[int, object] = {}
    uppers: dict[int, object] = {}

    # our field name -> (field_id, type, kind, trunc) for top-level
    # primitives, with per-column mode overrides resolved
    fields = {}
    truncs = {}
    for f in schema.fields:
        if isinstance(f.type, str):
            k, tl = overrides.get(f.name, (kind, trunc_len))
            fields[f.name] = (f.field_id, f.type, k)
            truncs[f.field_id] = tl

    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            col_path = leaf_paths[ci]
            if col_path not in fields:
                continue
            fid, type_str, col_kind = fields[col_path]
            if col_kind == "none":
                continue
            st = col.statistics
            if st is None:
                continue
            n = st.num_values + (st.null_count or 0) if st.has_null_count \
                else st.num_values
            value_counts[fid] = value_counts.get(fid, 0) + n
            if st.has_null_count:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            if col_kind == "counts":
                continue
            if st.has_min_max:
                try:
                    lo = _normalize(st.min, type_str)
                    hi = _normalize(st.max, type_str)
                except Exception:  # noqa: BLE001
                    # pyarrow cannot decode stats for some physical
                    # types (e.g. decimal FIXED_LEN_BYTE_ARRAY);
                    # absent bounds are always safe — inclusive
                    # evaluators answer might-match without them
                    lo = hi = None
                if type_str in ("float", "double") and (
                        (lo is not None and math.isnan(lo))
                        or (hi is not None and math.isnan(hi))):
                    lo = hi = None  # NaN bounds are useless; drop
                if lo is not None:
                    cur = lowers.get(fid)
                    lowers[fid] = lo if cur is None or lo < cur else cur
                if hi is not None:
                    cur = uppers.get(fid)
                    uppers[fid] = hi if cur is None or hi > cur else cur

    # string truncation (metrics mode truncate(N); "full" keeps exact
    # bounds) — per-column truncation lengths after overrides
    for fid in list(lowers):
        tl = truncs.get(fid)
        if tl is not None and isinstance(lowers[fid], str):
            lowers[fid] = truncate_lower(lowers[fid], tl)
    for fid in list(uppers):
        tl = truncs.get(fid)
        if tl is not None and isinstance(uppers[fid], str):
            t = truncate_upper(uppers[fid], tl)
            if t is None:
                del uppers[fid]
            else:
                uppers[fid] = t

    return {
        "record_count": md.num_rows,
        "file_size_in_bytes": _file_size(path),
        "value_counts": value_counts,
        "null_value_counts": null_counts,
        "nan_value_counts": nan_counts,
        "lower_bounds": lowers,
        "upper_bounds": uppers,
    }


def _file_size(path: str) -> int:
    import os
    return os.path.getsize(path)


def collect_orc_file_stats(path: str, schema) -> dict:
    """ORC variant: metrics mode "counts" (ref: MetricsModes.java — the
    reference supports none/counts/truncate/full per column).  pyarrow.orc
    exposes row counts but not per-column min/max, so ORC files carry exact
    record counts and no bounds — scans stay correct (no bounds -> the
    metrics evaluators conservatively keep the file)."""
    from pyarrow import orc as pa_orc

    f = pa_orc.ORCFile(path)
    return {
        "record_count": f.nrows,
        "file_size_in_bytes": _file_size(path),
        "value_counts": {},
        "null_value_counts": {},
        "nan_value_counts": {},
        "lower_bounds": {},
        "upper_bounds": {},
    }
