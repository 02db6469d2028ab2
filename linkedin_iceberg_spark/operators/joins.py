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


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str, start_col: str, end_col: str,
                  bucket_width: float, by: Optional[list] = None,
                  how: str = "inner") -> DataFrame:
    """Point-in-interval join WITHOUT the nested-loop trap: each point
    row pairs with every interval row whose [start, end) contains its
    timestamp (optionally also equi-matched on `by` key pairs
    [(left_col, right_col), ...]).

    Spelled naively (`p.ts >= i.start AND p.ts < i.end`) Spark has no
    equi key, so Catalyst plans BroadcastNestedLoopJoin — at scale the
    classic blow-up.  This operator manufactures the equi key: every
    interval is replicated into the fixed-width time BUCKETS it covers
    (sequence + explode), points map to their single bucket, and the
    join runs as a plain hash equi-join on (keys..., bucket) with the
    range predicate as a residual filter.  Each qualifying (point,
    interval) pair matches exactly once — a point has ONE bucket, and
    an interval has at most one copy in it.

    Cost model (pick `bucket_width` accordingly): interval replication
    is sum(ceil(length / width) + 1) rows, the join is a hash shuffle
    on (keys, bucket).  width ~ the median interval length keeps
    replication ~2x; very SHORT widths explode long intervals, very
    LONG widths degrade the bucket's selectivity (more residual
    filtering, same correctness).  Timestamps participate as epoch
    seconds (cast to double — exact for any epoch second up to 2^53).

    `how`: "inner" (matched pairs) or "left" (points without any
    containing interval survive with NULL interval columns).

    Published basis: the standard bucketized range/interval join
    (e.g. the overlap-interval binning in ranged joins of Spark's own
    range-join hints and the ADAM/Hail genomics joins); no reference
    analog (the 0.9-era fork delegates joins to engines)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        # the output carries BOTH sides' columns verbatim (and the left
        # path NULL-fills the interval side), so a shared name would be
        # ambiguous in the inner result and silently NULL the point's
        # own column in the left result — require disjoint names
        raise ValueError(
            f"interval_join requires disjoint column names; shared: "
            f"{sorted(shared)} — alias one side first")
    by = by or []
    w = F.lit(float(bucket_width))

    def num(df: DataFrame, name: str):
        # timestamps (tz AND ntz — ntz refuses a direct double cast) go
        # through epoch seconds; numerics cast straight
        dt = dict(df.dtypes)[name]
        c = F.col(name)
        if dt.startswith("timestamp"):
            c = c.cast("timestamp")
        return c.cast("double")

    pts = points.withColumn("_ij_b",
                            F.floor(num(points, point_ts) / w))
    ivs = (intervals
           .withColumn("_ij_b", F.explode(F.sequence(
               F.floor(num(intervals, start_col) / w),
               F.floor(num(intervals, end_col) / w))))
           # a [start, end) interval ending ON a bucket edge owns no
           # point in that edge bucket, but floor(end/w) still emits it:
           # harmless (residual filter kills it) and keeps the math
           # simple/exact
           )
    on = [pts["_ij_b"] == ivs["_ij_b"]]
    for l_col, r_col in by:
        on.append(pts[l_col] == ivs[r_col])
    cond = (pts[point_ts] >= ivs[start_col]) & \
           (pts[point_ts] < ivs[end_col])
    c = on[0]
    for extra in on[1:]:
        c = c & extra
    if how == "inner":
        out = pts.join(ivs, c & cond, "inner")
        return out.drop(pts["_ij_b"]).drop(ivs["_ij_b"])
    # left: keep unmatched points — join inner first, then add back
    matched = pts.join(ivs, c & cond, "inner")
    out = matched.drop(pts["_ij_b"]).drop(ivs["_ij_b"])
    lonely = pts.join(ivs, c & cond, "left_anti").drop("_ij_b")
    for col in ivs.columns:
        if col != "_ij_b":
            lonely = lonely.withColumn(col, F.lit(None))
    return out.unionByName(lonely)
