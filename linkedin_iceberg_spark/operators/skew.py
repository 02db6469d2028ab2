"""Skew mitigation helpers: salted joins and two-phase salted aggregation.

At 100 TB a handful of hot keys (the empty-string user id, the null-ish
default account, the bot session) concentrate a shuffle partition onto one
executor.  AQE's skew-join split handles sort-merge joins; these helpers
cover the remaining cases explicitly and deterministically:

  salted_join  — replicate the SMALL side `salt` times and scatter the big
                 side's hot keys across (key, salt) sub-partitions.  Row
                 multiplication is salt x small-side (bounded, chosen), and
                 the result is exactly the plain join's.
  salted_agg   — classic two-phase aggregation: partial agg on
                 (keys, salt), final agg on keys.  Algebraic aggregates
                 only (sum/count/min/max) — exactly the set that
                 decomposes.

Salt assignment uses a uniform random int per row: correctness never
depends on WHICH salt a row gets (the join replicates every salt; the agg
re-combines them), only that hot keys spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(big: DataFrame, small: DataFrame, on: list,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key shuffle spread over `salt` sub-keys.

    `big` is the skewed side (each row gets one random salt);
    `small` is replicated `salt` times (use for the dimension-ish side a
    broadcast can't fit).  Supported how: inner, left."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    on = [on] if isinstance(on, str) else list(on)
    b = big.withColumn(_SALT, (F.rand() * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(_SALT)
    s = small.select("*", salts)
    out = b.join(s, on + [_SALT], how)
    return out.drop(_SALT)


def salted_agg(df: DataFrame, keys: list, aggs: dict,
               salt: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    aggs: output_name -> (func, column) with func in sum|count|min|max.
    Phase 1 partially aggregates on (keys, salt); phase 2 combines — the
    shuffle into phase 2 carries at most `salt` rows per key."""
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in first:
            raise ValueError(
                f"{fn} is not algebraic; salted_agg supports {list(first)}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(_SALT, (F.rand() * salt).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*[
        first[fn](col).alias(f"_p_{name}")
        for name, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        combine[fn](f"_p_{name}").alias(name)
        for name, (fn, _col) in aggs.items()])
