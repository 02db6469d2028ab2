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


@lru_cache(maxsize=64)
def bucket_udf(src_type: str, n: int):
    """Returns a pandas UDF computing Iceberg bucket ids for `src_type`."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()  # executors must import this module

    def _one(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        return (murmur3_32(to_hash_bytes(v, src_type)) & 0x7FFFFFFF) % n

    @F.pandas_udf(T.IntegerType())
    def _bucket(s: pd.Series) -> pd.Series:
        return s.map(_one).astype("Int32")

    return _bucket


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
