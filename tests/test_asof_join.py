"""asof_join operator (operators/joins.py)."""

import pandas as pd
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.joins import asof_join


def _frames(spark):
    quotes = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 10.0),
         ("A", "2024-01-01 10:05:00", 11.0),
         ("A", "2024-01-01 10:30:00", 12.0),
         ("B", "2024-01-01 10:02:00", 20.0)],
        "sym string, qts_s string, px double") \
        .withColumn("qts", F.col("qts_s").cast("timestamp")).drop("qts_s")
    trades = spark.createDataFrame(
        [(1, "A", "2024-01-01 10:04:00"),
         (2, "A", "2024-01-01 10:05:00"),
         (3, "A", "2024-01-01 09:59:00"),
         (4, "B", "2024-01-01 11:00:00"),
         (5, "C", "2024-01-01 10:00:00")],
        "tid long, tsym string, tts_s string") \
        .withColumn("tts", F.col("tts_s").cast("timestamp")).drop("tts_s")
    return quotes, trades


def test_backward_asof(spark):
    quotes, trades = _frames(spark)
    out = asof_join(trades, quotes, "tts", "qts", "tsym", "sym",
                    left_id="tid")
    got = {r["tid"]: r["px"] for r in out.collect()}
    # trade 1 at 10:04 -> 10:00 quote (10.0); trade 2 at 10:05 -> exact
    # match 11.0; trade 3 predates all quotes -> no row; trade 4 -> B's
    # only quote; trade 5 has no key match
    assert got == {1: 10.0, 2: 11.0, 4: 20.0}


def test_forward_asof_with_tolerance(spark):
    quotes, trades = _frames(spark)
    out = asof_join(trades, quotes, "tts", "qts", "tsym", "sym",
                    direction="forward",
                    tolerance=F.expr("INTERVAL 10 MINUTES"),
                    left_id="tid")
    got = {r["tid"]: r["px"] for r in out.collect()}
    # trade 3 at 09:59 -> next quote 10:00 (10.0); trade 1 at 10:04 ->
    # 10:05 (11.0); trade 2 exact 11.0; trade 4 at 11:00: B has no later
    # quote; 10:30 A quote is outside trade 1..2's window? no — within 10m
    assert got == {1: 11.0, 2: 11.0, 3: 10.0}


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Parity with pandas merge_asof on real events/orders data."""
    e = (spark.read.option("mergeSchema", "false")
         .parquet(f"{sf_dir}/orders.parquet"))
    ev = spark.createDataFrame(
        [(i, i % 7, f"1996-0{1 + i % 9 // 2}-15 00:00:00") for i in range(40)],
        "eid long, k long, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    o = (e.select((F.col("o_custkey") % 7).alias("ok"),
                  F.col("o_orderdate").alias("ots"),
                  "o_orderkey")
         .filter(F.col("o_orderkey") < 2000))
    got = asof_join(ev, o, "ts", "ots", "k", "ok", left_id="eid") \
        .select("eid", "o_orderkey").toPandas().sort_values("eid")

    pe = ev.toPandas().sort_values("ts")
    po = o.toPandas().sort_values("ots")
    exp = pd.merge_asof(pe, po, left_on="ts", right_on="ots",
                        left_by="k", right_by="ok") \
        .dropna(subset=["o_orderkey"]).sort_values("eid")
    # merge_asof breaks right-side ties by last row; ours by max order key.
    # compare the matched DATE per event, which is tie-free
    exp_d = dict(zip(exp["eid"], exp["ots"]))
    po_k = dict(zip(po["o_orderkey"], po["ots"]))
    got_d = {eid: po_k[okey] for eid, okey in
             zip(got["eid"], got["o_orderkey"])}
    assert got_d == exp_d
