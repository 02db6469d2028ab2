"""interval_join: bucketized point-in-interval join — equi-join on
manufactured bucket keys + residual range filter, never a
nested-loop/cartesian plan."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.joins import interval_join


def _data(spark):
    pts = spark.createDataFrame(
        [(i, "u%d" % (i % 3), float(i)) for i in range(100)],
        "pid long, user string, ts double")
    ivs = spark.createDataFrame(
        [(1, "u0", 10.0, 25.0),     # mid-range window
         (2, "u1", 0.0, 5.0),       # from origin
         (3, "u0", 24.0, 24.5),     # sub-bucket sliver
         (4, "u2", 90.0, 200.0),    # runs past the data
         (5, "u0", 30.0, 30.0)],    # empty [x, x)
        "iid long, iuser string, lo double, hi double")
    return pts, ivs


def _brute(pts, ivs, keyed=True):
    out = set()
    for p in pts:
        for i in ivs:
            if keyed and p[1] != i[1]:
                continue
            if i[2] <= p[2] < i[3]:
                out.add((p[0], i[0]))
    return out


def test_matches_brute_force_keyed(spark):
    pts, ivs = _data(spark)
    got = {(r.pid, r.iid) for r in
           interval_join(pts, ivs, "ts", "lo", "hi", bucket_width=7.0,
                         by=[("user", "iuser")]).collect()}
    want = _brute([tuple(r) for r in pts.collect()],
                  [tuple(r) for r in ivs.collect()])
    assert got == want and want  # non-trivial


def test_matches_brute_force_unkeyed_and_widths(spark):
    pts, ivs = _data(spark)
    want = _brute([tuple(r) for r in pts.collect()],
                  [tuple(r) for r in ivs.collect()], keyed=False)
    for width in (0.5, 3.0, 64.0, 1000.0):
        got = {(r.pid, r.iid) for r in
               interval_join(pts, ivs, "ts", "lo", "hi",
                             bucket_width=width).collect()}
        assert got == want, width


def test_left_join_keeps_lonely_points(spark):
    pts, ivs = _data(spark)
    out = interval_join(pts, ivs, "ts", "lo", "hi", bucket_width=8.0,
                        by=[("user", "iuser")], how="left")
    matched = _brute([tuple(r) for r in pts.collect()],
                     [tuple(r) for r in ivs.collect()])
    rows = out.collect()
    assert {(r.pid, r.iid) for r in rows if r.iid is not None} == matched
    lonely = {r.pid for r in rows if r.iid is None}
    assert lonely == {p for p in range(100)} - {m[0] for m in matched}
    # every point appears (matched or lonely), no point lost
    assert {r.pid for r in rows} == set(range(100))


def test_plan_is_hash_join_not_nested_loop(spark):
    pts, ivs = _data(spark)
    plan = interval_join(pts, ivs, "ts", "lo", "hi", bucket_width=8.0,
                         by=[("user", "iuser")]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_timestamp_columns(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 01:00:00")],
        "pid long, ts string").select(
        "pid", F.col("ts").cast("timestamp").alias("ts"))
    ivs = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 00:30:00")],
        "iid long, lo string, hi string").select(
        "iid", F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"))
    got = {(r.pid, r.iid) for r in
           interval_join(pts, ivs, "ts", "lo", "hi",
                         bucket_width=600).collect()}
    assert got == {(1, 10)}


def test_validation(spark):
    pts, ivs = _data(spark)
    with pytest.raises(ValueError, match="positive"):
        interval_join(pts, ivs, "ts", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(pts, ivs, "ts", "lo", "hi", 1.0, how="outer")
