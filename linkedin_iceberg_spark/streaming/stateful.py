"""Custom stateful streaming operators via applyInPandasWithState.

The reference's streaming plane is sink idempotency + micro-batch slicing
(SURVEY.md S9/S17-S18); everything stateful is delegated to the host
engine.  This module supplies the delegated piece our engine must expose
natively (SURVEY.md §2B Streaming): arbitrary per-key state machines that
Spark's built-in operators can't express.

``sessionize_capped`` is the canonical example: gap-based sessionization
with an event-count cap per session.  ``F.session_window`` handles the gap
but cannot cap session size or carry custom per-session accumulators — the
exact case Structured Streaming's applyInPandasWithState exists for.

Scale design: state lives per grouping key in the state store (RocksDB on a
real cluster), partitioned by the groupBy shuffle; the event-time timeout +
watermark bound state size — an abandoned key is flushed and dropped as the
watermark passes its gap deadline.  Data crosses the JVM/Python boundary in
Arrow batches (one pandas DataFrame per key per micro-batch), never row at
a time.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# state: open session accumulator (timestamps as epoch micros — primitive
# state columns survive arbitrary state-store serde)
_STATE_TYPE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", LongType()),
])


def _out_type(key_type: str) -> StructType:
    spark_key = {"string": StringType(), "int": IntegerType(),
                 "long": LongType()}[key_type]
    return StructType([
        StructField("key", spark_key),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", LongType()),
        StructField("closed_by", StringType()),  # gap | cap | timeout
    ])


def sessionize_capped(events: DataFrame, key_col: str, ts_col: str,
                      gap: str = "30 minutes",
                      max_events: Optional[int] = None,
                      value_col: Optional[str] = None,
                      watermark_delay: str = "10 minutes",
                      key_type: str = "long") -> DataFrame:
    """Gap-based sessionization with an optional per-session event cap.

    Emits one row per CLOSED session: ``(key, session_start, session_end,
    n_events, sum_value, closed_by)``.  A session closes when the gap to
    the next event exceeds ``gap`` (closed_by=gap), when it reaches
    ``max_events`` events (closed_by=cap), or when the event-time watermark
    passes its deadline with no new events (closed_by=timeout).

    ``events`` must be a STREAMING DataFrame; ``ts_col`` must be a
    timestamp column.  ``value_col`` (integral) is summed per session;
    omitted, sum_value is the event count.
    """
    gap_us = _duration_us(gap)
    cap = max_events if max_events is not None else 2 ** 62

    def fold(key, pdf_iter: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        k = key[0]
        out = []

        def emit(start_us: int, end_us: int, n: int, sv: int, why: str):
            out.append((k, pd.Timestamp(start_us, unit="us"),
                        pd.Timestamp(end_us, unit="us"), n, sv, why))

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, sv = state.get
                emit(s0, s1, n, sv, "timeout")
            state.remove()
            yield pd.DataFrame(out, columns=[
                "key", "session_start", "session_end", "n_events",
                "sum_value", "closed_by"])
            return

        cur = list(state.get) if state.exists else None
        rows = []
        for pdf in pdf_iter:
            ts_us = (pdf["__ts"].astype("int64") // 1000)
            vals = pdf["__val"].astype("int64")
            rows.extend(zip(ts_us.tolist(), vals.tolist()))
        rows.sort()

        for ts_us, v in rows:
            if cur is None:
                cur = [ts_us, ts_us, 1, v]
            elif ts_us - cur[1] > gap_us:
                emit(cur[0], cur[1], cur[2], cur[3], "gap")
                cur = [ts_us, ts_us, 1, v]
            else:
                cur[1] = max(cur[1], ts_us)
                cur[2] += 1
                cur[3] += v
            if cur[2] >= cap:
                emit(cur[0], cur[1], cur[2], cur[3], "cap")
                cur = None

        if cur is not None:
            state.update(tuple(cur))
            # flush the open session once the watermark passes last+gap
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        else:
            state.remove()
        yield pd.DataFrame(out, columns=[
            "key", "session_start", "session_end", "n_events",
            "sum_value", "closed_by"])

    prepared = (events
                .withColumn("__ts", F.col(ts_col))
                .withColumn("__val", F.col(value_col).cast("long")
                            if value_col else F.lit(1).cast("long"))
                .withWatermark("__ts", watermark_delay)
                .select(F.col(key_col).alias("key"), "__ts", "__val"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(fold, _out_type(key_type), _STATE_TYPE,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def _duration_us(s: str) -> int:
    qty, unit = s.split()
    unit = unit.rstrip("s")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
    return int(qty) * mult * 1_000_000
