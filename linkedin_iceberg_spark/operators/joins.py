"""Join operators Spark lacks natively, as reusable DataFrame functions.

as-of join (SURVEY.md §2B): each left row matched to the single most
recent right row at or before (backward) / the earliest at or after
(forward) its timestamp, equi-matched on key columns — the standard
time-series enrichment join (pandas merge_asof semantics, distributed).

Shape: range join + windowed dedupe, the composition SURVEY prescribes —
no UDFs, all codegen.  Scale notes:
  - the range join fans out per key before the dedupe window collapses it;
    bound the fan-out with `tolerance` (right rows older than
    left.ts - tolerance never match, so Catalyst's range condition prunes
    them at the join) — at 100 TB an unbounded backward as-of against a
    long history is the classic blow-up, tolerance is the fix;
  - both sides shuffle on the `by` key (equi condition); skewed hot keys
    respond to AQE skew-join or salting like any equi join;
  - the dedupe window partitions by the LEFT ROW key, so its shuffle is
    proportional to the joined (already key-partitioned) result.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, left_on: str,
              right_on: str, by_left: str, by_right: str,
              direction: str = "backward",
              tolerance: Optional[Column] = None,
              left_id: Optional[str] = None,
              tiebreak: Optional[list] = None) -> DataFrame:
    """As-of join: for every left row, the single nearest right row with
    right_on <= left_on (backward) or right_on >= left_on (forward),
    matching by_left == by_right.  Right columns come through as-is (name
    collisions should be renamed by the caller).  `tolerance` (a Column
    interval / duration expression) bounds how far back/forward a match
    may be.  `left_id` names a column that uniquely identifies left rows
    (defaults to by_left + left_on, which must then be unique per row).
    `tiebreak` lists extra right-side ordering Columns applied after the
    timestamp, making the choice among equal-timestamp right rows
    deterministic (unset, ties resolve arbitrarily, like merge_asof).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lts, rts = F.col(left_on), F.col(right_on)
    cond = (F.col(by_left) == F.col(by_right)) & \
        ((rts <= lts) if direction == "backward" else (rts >= lts))
    if tolerance is not None:
        cond = cond & ((rts >= lts - tolerance)
                       if direction == "backward"
                       else (rts <= lts + tolerance))
    joined = left.join(right, cond, "inner")

    keys = [left_id] if left_id else [by_left, left_on]
    order = [rts.desc()] if direction == "backward" else [rts.asc()]
    if tiebreak:
        order.extend(tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    return (joined.withColumn("_asof_rn", F.row_number().over(w))
            .filter(F.col("_asof_rn") == 1).drop("_asof_rn"))
