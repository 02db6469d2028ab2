"""funnel(): ordered-step conversion semantics on a hand corpus."""

import datetime

import pytest

from linkedin_iceberg_spark.operators.events import funnel


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: full funnel in order
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(9), "buy"),
        # user 2: click BEFORE view -> funnel breaks at click
        (2, _ts(5), "click"), (2, _ts(6), "view"), (2, _ts(9), "buy"),
        # user 3: view then click, no buy
        (3, _ts(0), "view"), (3, _ts(1), "click"),
        # user 4: never views
        (4, _ts(0), "click"), (4, _ts(1), "buy"),
        # user 5: completes but click is 30 min after view
        (5, _ts(0), "view"), (5, _ts(30), "click"), (5, _ts(31), "buy"),
        # user 6: greedy anchor — earliest view at 0, clicks at 3; a
        # second view at 2 is irrelevant (anchor is the earliest)
        (6, _ts(2), "view"), (6, _ts(0), "view"), (6, _ts(3), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_type: string")


def test_funnel_unwindowed(ev):
    out = {r["user_id"]: r for r in
           funnel(ev, ["view", "click", "buy"]).collect()}
    assert set(out) == {1, 2, 3, 5, 6}  # user 4 never entered
    assert out[1]["t_3"] == _ts(9)
    # user 2's only click precedes the first view -> broken from step 2,
    # and therefore step 3 too (even though a later buy exists)
    assert out[2]["t_2"] is None and out[2]["t_3"] is None
    assert out[3]["t_2"] == _ts(1) and out[3]["t_3"] is None
    assert out[6]["t_1"] == _ts(0) and out[6]["t_2"] == _ts(3)


def test_funnel_windowed(ev):
    out = {r["user_id"]: r for r in
           funnel(ev, ["view", "click", "buy"],
                  within_seconds=600).collect()}
    # user 5's click is 30 min after the view -> outside the 10 min window
    assert out[5]["t_2"] is None and out[5]["t_3"] is None
    assert out[1]["t_3"] == _ts(9)


def test_funnel_counts_monotone(ev):
    from pyspark.sql import functions as F
    f = funnel(ev, ["view", "click", "buy"])
    r = f.agg(F.count("t_1").alias("a"), F.count("t_2").alias("b"),
              F.count("t_3").alias("c")).collect()[0]
    assert r["a"] >= r["b"] >= r["c"]
    with pytest.raises(ValueError):
        funnel(ev, [])
    with pytest.raises(ValueError):
        funnel(ev, ["view"], within_seconds=0)


# -- retention() ----------------------------------------------------------

def test_retention_triangle(spark):
    import datetime

    def d(day, hour=0):
        return datetime.datetime(2024, 1, 1 + day, hour)

    rows = [
        # user 1: cohort day 0, active days 0, 1, 3 (two events on day 1
        # count once)
        (1, d(0), "view"), (1, d(1), "view"), (1, d(1, 5), "click"),
        (1, d(3), "view"),
        # user 2: cohort day 1, active days 1 (rel 0) and 2 (rel 1)
        (2, d(1), "view"), (2, d(2), "view"),
        # user 3: cohort day 0, active day 9 -> beyond max_day, dropped
        (3, d(0), "view"), (3, d(9), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_type: string")

    from linkedin_iceberg_spark.operators.events import retention
    got = {(str(r["cohort"]), r["day_n"]): r["n_users"]
           for r in retention(ev, max_day=7).collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 1): 1,
    }

    # the forced-broadcast variant is opt-in and must agree
    forced = {(str(r["cohort"]), r["day_n"]): r["n_users"]
              for r in retention(ev, max_day=7,
                                 broadcast_cohorts=True).collect()}
    assert forced == got


def test_retention_join_is_not_force_broadcast(spark):
    import datetime
    import io
    from contextlib import redirect_stdout
    ev = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1 + i % 3), "view")
         for i in range(100)],
        "user_id: long, ts: timestamp, event_type: string")
    from linkedin_iceberg_spark.operators.events import retention
    # with broadcast disabled at the session level, the default path must
    # plan WITHOUT a broadcast hash join (the 100 TB cohort map never
    # fits); a forced F.broadcast hint would override the threshold and
    # keep the OOM cliff
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            retention(ev).explain("formatted")
        assert "BroadcastHashJoin" not in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
