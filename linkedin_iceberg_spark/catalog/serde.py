"""JSON-safe value serialization for metadata (bounds, partition values).

The reference serializes stats bounds as little-endian binary
(api/.../types/Conversions.java:83-125); our metadata is internal so we store
JSON-typed values instead — simpler and debuggable, no byte-compat needed
(SURVEY.md §1.2)."""

from __future__ import annotations

import base64
import datetime as _dt
import math
from decimal import Decimal

_EPOCH_DATE = _dt.date(1970, 1, 1)


def encode_value(v, type_str: str):
    """native -> JSON-safe."""
    if v is None:
        return None
    if type_str == "date":
        if isinstance(v, _dt.datetime):
            v = v.date()
        if isinstance(v, _dt.date):
            return v.isoformat()
        return (_EPOCH_DATE + _dt.timedelta(days=int(v))).isoformat()
    if type_str in ("timestamp", "timestamptz"):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v.isoformat()
        return str(v)
    if type_str.startswith("decimal"):
        return str(v)
    if type_str in ("binary",) or type_str.startswith("fixed"):
        return base64.b64encode(bytes(v)).decode("ascii")
    if type_str in ("float", "double"):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        return f
    if type_str in ("int", "long", "time"):
        return int(v)
    if type_str == "boolean":
        return bool(v)
    return str(v) if not isinstance(v, (str, int, float, bool)) else v


def decode_value(s, type_str: str):
    """JSON-safe -> native comparable."""
    if s is None:
        return None
    if type_str == "date":
        return _dt.date.fromisoformat(s) if isinstance(s, str) else \
            _EPOCH_DATE + _dt.timedelta(days=int(s))
    if type_str in ("timestamp", "timestamptz"):
        return _dt.datetime.fromisoformat(s) if isinstance(s, str) else s
    if type_str.startswith("decimal"):
        return Decimal(s)
    if type_str in ("binary",) or type_str.startswith("fixed"):
        return base64.b64decode(s) if isinstance(s, str) else bytes(s)
    if type_str in ("float", "double"):
        if s == "NaN":
            return float("nan")
        if s == "Infinity":
            return float("inf")
        if s == "-Infinity":
            return float("-inf")
        return float(s)
    if type_str in ("int", "long", "time"):
        return int(s)
    if type_str == "boolean":
        return bool(s)
    return s
