"""r7: CREATE/REFRESH/DROP MATERIALIZED VIEW — the SQL spelling of the
incrementally-maintained aggregate view plane.  REFRESH folds the
base's changelog in O(changed rows); the result must equal a full
recompute after inserts AND deletes."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # integer cents: exact under signed folding
    o = orders.select(
        "o_orderkey", "o_orderpriority",
        (F.col("o_totalprice") * 100).cast("long").alias("cents"))
    catalog.create_table("db.base", o).append(o)
    return catalog


def _recompute(cat):
    return {(r["o_orderpriority"], r["n"], r["total_cents"])
            for r in cat.sql(
                "SELECT o_orderpriority, count(*) AS n_star, "
                "count(cents) AS n, sum(cents) AS total_cents "
                "FROM db.base GROUP BY o_orderpriority").collect()}


def test_mview_create_refresh_matches_recompute(cat):
    out = cat.sql(
        "CREATE MATERIALIZED VIEW db.mv AS "
        "SELECT o_orderpriority, count(*) AS n_star, count(cents) AS n, "
        "sum(cents) AS total_cents "
        "FROM db.base GROUP BY o_orderpriority").collect()[0]
    assert out["operation"] == "create_materialized_view"

    def mv_state():
        return {(r["o_orderpriority"], r["n"], r["total_cents"])
                for r in cat.sql("SELECT o_orderpriority, n, "
                                 "total_cents FROM db.mv").collect()}
    assert mv_state() == _recompute(cat)
    # mutate the base: delete some rows, insert shifted ones
    cat.sql("DELETE FROM db.base WHERE o_orderkey < 300")
    cat.sql("INSERT INTO db.base SELECT o_orderkey + 7000000, "
            "o_orderpriority, cents FROM db.base "
            "WHERE o_orderkey < 600")
    st = cat.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert st["operation"] == "refresh_materialized_view"
    assert mv_state() == _recompute(cat)
    # count(*) channel tracks too
    star = {(r["o_orderpriority"], r["n_star"])
            for r in cat.sql("SELECT o_orderpriority, n_star "
                             "FROM db.mv").collect()}
    want = {(r["o_orderpriority"], r["n_star"])
            for r in cat.sql("SELECT o_orderpriority, count(*) AS "
                             "n_star FROM db.base "
                             "GROUP BY o_orderpriority").collect()}
    assert star == want
    cat.sql("DROP MATERIALIZED VIEW db.mv")
    assert not cat.table_exists("db.mv")


def test_mview_minmax_recompute_path(cat):
    cat.sql("CREATE MATERIALIZED VIEW db.mvx AS "
            "SELECT o_orderpriority, max(cents) AS hi, "
            "min(cents) AS lo "
            "FROM db.base GROUP BY o_orderpriority")
    # deleting current maxima forces the recompute-touched-groups path
    # (the DELETE parser takes literal lists, not subqueries)
    maxima = [r["m"] for r in cat.sql(
        "SELECT max(cents) AS m FROM db.base "
        "GROUP BY o_orderpriority").collect()]
    in_list = ", ".join(str(v) for v in sorted(set(maxima)))
    cat.sql(f"DELETE FROM db.base WHERE cents IN ({in_list})")
    cat.sql("REFRESH MATERIALIZED VIEW db.mvx")
    got = {(r["o_orderpriority"], r["lo"], r["hi"])
           for r in cat.sql("SELECT o_orderpriority, lo, hi "
                            "FROM db.mvx").collect()}
    want = {(r["o_orderpriority"], r["lo"], r["hi"])
            for r in cat.sql("SELECT o_orderpriority, min(cents) AS lo, "
                             "max(cents) AS hi FROM db.base "
                             "GROUP BY o_orderpriority").collect()}
    assert got == want


def test_mview_conservative_raises(cat):
    with pytest.raises(ValueError, match="group key"):
        cat.sql("CREATE MATERIALIZED VIEW db.bad AS "
                "SELECT upper(o_orderpriority), count(*) AS n "
                "FROM db.base GROUP BY upper(o_orderpriority)")
    with pytest.raises(ValueError, match="select item"):
        cat.sql("CREATE MATERIALIZED VIEW db.bad AS "
                "SELECT o_orderpriority, avg(cents) "
                "FROM db.base GROUP BY o_orderpriority")


def test_mview_tracks_streaming_upserts(cat, spark):
    """Composition: micro-batch commits to the base (the streaming-sink
    shape — here driven as successive SQL inserts/deletes) with a
    REFRESH after each batch; the MV must equal a recompute at every
    sync point, and each refresh reads only that batch's changelog."""
    cat.sql("CREATE MATERIALIZED VIEW db.mvs AS "
            "SELECT o_orderpriority, count(*) AS n, "
            "sum(cents) AS total_cents "
            "FROM db.base GROUP BY o_orderpriority")
    for lo, hi in ((0, 200), (200, 500), (500, 900)):
        cat.sql(f"DELETE FROM db.base WHERE o_orderkey >= {lo} "
                f"AND o_orderkey < {hi}")
        cat.sql(f"INSERT INTO db.base SELECT o_orderkey + 9000000, "
                f"o_orderpriority, cents FROM db.base "
                f"WHERE o_orderkey >= {hi} AND o_orderkey < {hi + 50}")
        cat.sql("REFRESH MATERIALIZED VIEW db.mvs")
        got = {(r["o_orderpriority"], r["n"], r["total_cents"])
               for r in cat.sql("SELECT o_orderpriority, n, "
                                "total_cents FROM db.mvs").collect()}
        want = {(r["o_orderpriority"], r["n"], r["t"])
                for r in cat.sql(
                    "SELECT o_orderpriority, count(*) AS n, "
                    "sum(cents) AS t FROM db.base "
                    "GROUP BY o_orderpriority").collect()}
        assert got == want, (lo, hi)
