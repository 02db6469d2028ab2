"""Event-sequence analytics: ordered funnels and cohort retention over
an event stream."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: list, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           within_seconds: Optional[int] = None) -> DataFrame:
    """Ordered-funnel conversion: one row per user who completed step 1,
    with ``t_1..t_k`` = the earliest completion time of each step GIVEN
    the previous step completed STRICTLY earlier (and, with
    `within_seconds`, no later than that many seconds after it).  NULL
    ``t_i`` marks where the user's funnel broke; each step's converted
    population is simply ``count(t_i)``.

    Greedy-earliest semantics (the standard funnel definition): step i is
    anchored to the EARLIEST valid completion of step i-1.  This can
    under-count versus "any matching subsequence" when a later anchor
    would have opened a window the earliest one missed — the trade-off
    every O(n) funnel makes, and the one that replays in plain SQL.

    Scale: each step filters the stream to ONE event type before its
    per-user min-aggregate (map-side combinable), then equi-joins the
    previous step's (user, time) — k small joins on the user key, no
    window over the global stream, no ordering, no state.  Skewed users
    cost one hot aggregate key, not a cross product."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("within_seconds must be positive")
    out = (df.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("t_1")))
    prev = out
    for i, step in enumerate(steps[1:], start=2):
        prev_t, cur_t = f"t_{i - 1}", f"t_{i}"
        ev = df.filter(F.col(type_col) == step).select(user_col, ts_col)
        j = ev.join(prev.select(user_col, prev_t), user_col) \
            .filter(F.col(ts_col) > F.col(prev_t))
        if within_seconds is not None:
            j = j.filter(
                F.col(ts_col) <=
                F.col(prev_t) + F.expr(f"INTERVAL {within_seconds} SECONDS"))
        cur = j.groupBy(user_col).agg(F.min(ts_col).alias(cur_t))
        out = out.join(cur, user_col, "left")
        prev = cur
    return out


def retention(df: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", max_day: int = 7,
              broadcast_cohorts: bool = False) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day
    (cohort), counted once per subsequent activity day out to
    ``max_day`` — the classic DAU-retention input.

    Shape: one per-user min-aggregate builds the (user, cohort) map,
    an equi-join on the user key stamps each event with its cohort,
    then one distinct + one count aggregate.  No window over the global
    stream, no state.

    Scale: the cohort map has ONE ROW PER USER — at 100 TB that is
    billions of rows, so the join is left to AQE by default (it picks a
    broadcast only when the built side actually fits).  Pass
    ``broadcast_cohorts=True`` only when the user population is known
    small (a cohort study, a single tenant); forcing it on the open
    population OOMs the driver and every executor."""
    if max_day < 0:
        raise ValueError("max_day must be >= 0")
    first = (df.groupBy(user_col)
             .agg(F.min(ts_col).cast("date").alias("cohort")))
    if broadcast_cohorts:
        first = F.broadcast(first)
    act = (df.join(first, user_col)
           .select(user_col, "cohort",
                   F.datediff(F.col(ts_col).cast("date"), "cohort")
                   .alias("day_n"))
           .distinct())
    return (act.filter(F.col("day_n") <= max_day)
            .groupBy("cohort", "day_n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))
