"""Arrow-vectorized pandas UDFs for transforms Spark can't express natively.

Only the *write path* of bucketed/decimal-truncated columns pays this cost
(one pass per append); reads and pruning never evaluate these on data.
Bucket parity with the reference's murmur3 recipes is mandatory — a mismatch
makes bucket pruning silently return wrong files
(ref: api/.../transforms/Bucket.java:155-311).
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkedin_iceberg_spark.transforms.bucket_hash import murmur3_32, to_hash_bytes


def _to_i64_micros(dt_vals) -> "object":
    """datetime64[*] ndarray -> int64 epoch micros."""
    import numpy as np
    unit = np.datetime_data(dt_vals.dtype)[0]
    i = dt_vals.view("i8")
    if unit == "ns":
        return i // 1000
    if unit == "us":
        return i
    if unit == "ms":
        return i * 1000
    if unit == "s":
        return i * 1_000_000
    raise ValueError(f"unsupported datetime unit {unit}")


def bucket_series(s: "pd.Series", src_type: str, n: int) -> "pd.Series":
    """Vectorized Iceberg bucket ids over a pandas Series — the shared
    kernel behind bucket_udf AND the DataSource writer's worker-side
    partition computation (one hash over the whole batch in numpy,
    scalar murmur3 parity fallback for exotic inputs)."""
    import numpy as np

    from linkedin_iceberg_spark.transforms.bucket_hash import (
        murmur3_32_vec_bytes,
        murmur3_32_vec_i64,
    )

    def _one(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        return (murmur3_32(to_hash_bytes(v, src_type)) & 0x7FFFFFFF) % n

    def _ids(h: "np.ndarray", mask: "np.ndarray") -> pd.Series:
        out = (h.astype(np.int64) & 0x7FFFFFFF) % n
        s = pd.Series(out, dtype="Int32")
        s[mask] = pd.NA
        return s

    def _bucket(s: pd.Series) -> pd.Series:
        try:
            if src_type in ("int", "long", "time"):
                mask = s.isna().to_numpy()
                v = pd.to_numeric(s).fillna(0).to_numpy(np.int64)
                return _ids(murmur3_32_vec_i64(v), mask)
            if src_type in ("timestamp", "timestamptz"):
                dt = pd.to_datetime(s)
                if getattr(dt.dt, "tz", None) is not None:
                    dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
                mask = dt.isna().to_numpy()
                micros = _to_i64_micros(dt.to_numpy())
                micros = np.where(mask, 0, micros)
                return _ids(murmur3_32_vec_i64(micros), mask)
            if src_type == "date":
                dt = pd.to_datetime(s)
                mask = dt.isna().to_numpy()
                days = _to_i64_micros(dt.to_numpy()) // 86_400_000_000
                days = np.where(mask, 0, days)
                return _ids(murmur3_32_vec_i64(days), mask)
            if src_type == "string":
                mask = s.isna().to_numpy()
                items = [b"" if m else str(v).encode("utf-8")
                         for v, m in zip(s.to_numpy(), mask)]
                return _ids(murmur3_32_vec_bytes(items), mask)
            if src_type.startswith(("decimal", "fixed")) or \
                    src_type in ("binary", "uuid"):
                mask = s.isna().to_numpy()
                items = [b"" if m else to_hash_bytes(v, src_type)
                         for v, m in zip(s.to_numpy(), mask)]
                return _ids(murmur3_32_vec_bytes(items), mask)
        except (TypeError, ValueError, OverflowError):
            pass  # fall back to the scalar parity path
        return s.map(_one).astype("Int32")

    return _bucket(s)


@lru_cache(maxsize=64)
def bucket_udf(src_type: str, n: int):
    """Returns a pandas UDF computing Iceberg bucket ids for `src_type`
    (the Spark-column route; `bucket_series` is the raw kernel)."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()  # executors must import this module

    @F.pandas_udf(T.IntegerType())
    def _udf(s: pd.Series) -> pd.Series:
        return bucket_series(s, src_type, n)

    return _udf


@lru_cache(maxsize=64)
def truncate_udf(src_type: str, w: int):
    """Decimal truncate (string/int/binary are handled with built-ins)."""
    from decimal import Decimal

    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()

    def _one(v):
        if v is None:
            return None
        exp = v.as_tuple().exponent
        unscaled = int(v.scaleb(-exp))
        trunc = unscaled - (((unscaled % w) + w) % w)
        return Decimal(trunc).scaleb(exp)

    @F.pandas_udf(T.StringType())
    def _truncate(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else str(_one(v)))

    return _truncate
