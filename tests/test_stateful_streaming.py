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
