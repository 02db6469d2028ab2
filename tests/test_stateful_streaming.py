"""applyInPandasWithState custom stateful operator (streaming/stateful.py):
gap sessionization with an event cap — semantics session_window can't
express.  Deterministic file-based micro-batch streams, availableNow."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.streaming.stateful import sessionize_capped


def _run_stream(spark, src_glob, ck, collected):
    events = (spark.readStream.schema("ts_s string, uid long, v long")
              .parquet(src_glob)
              .withColumn("ts", F.col("ts_s").cast("timestamp")))
    sess = sessionize_capped(events, "uid", "ts", gap="5 minutes",
                             max_events=3, value_col="v",
                             watermark_delay="1 minute")
    q = (sess.writeStream
         .foreachBatch(lambda df, eid: collected.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(240)


def test_sessionize_gap_cap_timeout(spark, tmp_path):
    src = tmp_path / "sess_src"
    src.mkdir()
    b1 = [
        # uid 1: 4 events close together -> cap closes a 3-event session,
        # 4th starts a new open session
        ("2024-01-01 10:00:00", 1, 10),
        ("2024-01-01 10:00:30", 1, 10),
        ("2024-01-01 10:01:00", 1, 10),
        ("2024-01-01 10:01:30", 1, 5),
        # uid 2: two events 10 min apart -> gap closes the first
        ("2024-01-01 10:00:00", 2, 1),
        ("2024-01-01 10:10:00", 2, 2),
        # watermark driver: far-future event on uid 9
        ("2024-01-01 11:00:00", 9, 0),
    ]
    spark.createDataFrame(b1, "ts_s string, uid long, v long") \
        .coalesce(1).write.parquet(str(src / "b1"))

    collected = []
    _run_stream(spark, str(src / "*"), str(tmp_path / "ck"), collected)

    by = {}
    for r in collected:
        by.setdefault(r["key"], []).append(r)

    # uid 1: capped session of exactly 3 events, sum 30
    capped = [r for r in by.get(1, []) if r["closed_by"] == "cap"]
    assert len(capped) == 1
    assert capped[0]["n_events"] == 3 and capped[0]["sum_value"] == 30

    # uid 2: first session closed by gap (1 event, sum 1)
    gapped = [r for r in by.get(2, []) if r["closed_by"] == "gap"]
    assert len(gapped) == 1
    assert gapped[0]["n_events"] == 1 and gapped[0]["sum_value"] == 1

    # second run with no new data but a later watermark-driving event:
    # open sessions flush via EventTimeTimeout
    b2 = [("2024-01-01 12:00:00", 9, 0)]
    spark.createDataFrame(b2, "ts_s string, uid long, v long") \
        .coalesce(1).write.parquet(str(src / "b2"))
    _run_stream(spark, str(src / "*"), str(tmp_path / "ck"), collected)

    flushed = [r for r in collected
               if r["closed_by"] == "timeout" and r["key"] in (1, 2)]
    assert {r["key"] for r in flushed} >= {1, 2}
    u1 = [r for r in flushed if r["key"] == 1][0]
    assert u1["n_events"] == 1 and u1["sum_value"] == 5


def test_sessionize_batch_parity(spark, tmp_path):
    """The streamed sessions (ignoring cap/timeout variants) match a batch
    window-function sessionization of the same data."""
    src = tmp_path / "par_src"
    src.mkdir()
    rows = []
    for uid in range(5):
        # two bursts separated by an hour: 2 sessions per uid
        for i in range(2):
            rows.append((f"2024-01-01 0{8 + uid % 2}:{10 * i:02d}:00",
                         100 + uid, 1))
        rows.append((f"2024-01-01 1{uid % 2}:30:00", 100 + uid, 1))
    rows.append(("2024-01-02 00:00:00", 999, 0))  # watermark driver
    spark.createDataFrame(rows, "ts_s string, uid long, v long") \
        .coalesce(1).write.parquet(str(src / "b1"))
    # second batch only advances the watermark to flush open state
    spark.createDataFrame([("2024-01-03 00:00:00", 999, 0)],
                          "ts_s string, uid long, v long") \
        .coalesce(1).write.parquet(str(src / "b2"))

    collected = []
    _run_stream(spark, str(src / "*"), str(tmp_path / "ck2"), collected)
    _run_stream(spark, str(src / "*"), str(tmp_path / "ck2"), collected)

    got = {(r["key"], r["n_events"]) for r in collected if r["key"] != 999}

    pdf = pd.DataFrame([(t, u, v) for t, u, v in rows if u != 999],
                       columns=["ts_s", "uid", "v"])
    pdf["ts"] = pd.to_datetime(pdf["ts_s"])
    exp = set()
    for uid, g in pdf.sort_values("ts").groupby("uid"):
        n = 0
        last = None
        for ts in g["ts"]:
            if last is not None and (ts - last).total_seconds() > 300:
                exp.add((uid, n))
                n = 0
            n += 1
            last = ts
        exp.add((uid, n))
    assert got == exp


def test_sessionize_into_idempotent_table_sink(spark, catalog, tmp_path):
    """End-to-end composition: stateful sessionization streaming into the
    engine's epoch-idempotent table sink — a replayed micro-batch never
    double-appends sessions."""
    from linkedin_iceberg_spark.streaming.sink import append_batch_idempotent

    src = tmp_path / "sess2_src"
    src.mkdir()
    rows = [("2024-01-01 10:00:00", 1, 1), ("2024-01-01 10:01:00", 1, 2),
            ("2024-01-01 10:20:00", 1, 3), ("2024-01-01 12:00:00", 9, 0)]
    spark.createDataFrame(rows, "ts_s string, uid long, v long") \
        .coalesce(1).write.parquet(str(src / "b1"))

    from linkedin_iceberg_spark import Schema, NestedField
    t = catalog.create_table("db.sessions", Schema([
        NestedField(1, "key", "long"),
        NestedField(2, "session_start", "timestamp"),
        NestedField(3, "session_end", "timestamp"),
        NestedField(4, "n_events", "long"),
        NestedField(5, "sum_value", "long"),
        NestedField(6, "closed_by", "string")]))

    def run():
        ev = (spark.readStream.schema("ts_s string, uid long, v long")
              .parquet(str(src / "*"))
              .withColumn("ts", F.col("ts_s").cast("timestamp")))
        sess = sessionize_capped(ev, "uid", "ts", gap="5 minutes",
                                 value_col="v", watermark_delay="1 minute")
        q = (sess.writeStream
             .foreachBatch(lambda df, eid: append_batch_idempotent(
                 t, df, eid, query_id="sess"))
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck3"))
             .trigger(availableNow=True).start())
        q.awaitTermination(240)

    run()
    n1 = t.refresh().to_df().count()
    assert n1 >= 1  # uid 1's first (gap-closed) session landed

    # replay the SAME epochs by re-feeding an identical foreachBatch call:
    # simulate a retried batch with the same epoch id
    batch = t.to_df()
    append_batch_idempotent(t, batch, 0, query_id="sess")
    assert t.refresh().to_df().count() == n1  # no double-append
