"""r7: persisted SQL views — CREATE/DROP VIEW, SHOW VIEWS, recursive
resolution in Catalog.sql with late binding (a view tracks its base
tables' CURRENT snapshots) and cycle detection."""

import os

import pytest


@pytest.fixture()
def cat(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    catalog.create_table("db.orders", orders).append(orders)
    return catalog


def test_create_query_drop_view(cat):
    cat.sql("CREATE VIEW db.big AS SELECT o_orderkey, o_totalprice "
            "FROM db.orders WHERE o_totalprice > 100000")
    got = cat.sql("SELECT count(*) AS n FROM db.big").collect()[0]["n"]
    want = cat.sql("SELECT count(*) AS n FROM db.orders "
                   "WHERE o_totalprice > 100000").collect()[0]["n"]
    assert got == want and got > 0
    shown = {(r["namespace"], r["viewName"])
             for r in cat.sql("SHOW VIEWS").collect()}
    assert ("db", "big") in shown
    cat.sql("DROP VIEW db.big")
    assert not cat.view_exists("db.big")
    out = cat.sql("DROP VIEW IF EXISTS db.big").collect()[0]
    assert "False" in out["detail"]
    with pytest.raises(Exception):
        cat.sql("DROP VIEW db.big")


def test_view_late_binding_sees_new_commits(cat):
    cat.sql("CREATE VIEW db.cnt AS "
            "SELECT count(*) AS n FROM db.orders")
    before = cat.sql("SELECT n FROM db.cnt").collect()[0]["n"]
    cat.sql("INSERT INTO db.orders SELECT o_orderkey + 8000000, "
            "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
            "o_orderpriority FROM db.orders WHERE o_orderkey < 10")
    after = cat.sql("SELECT n FROM db.cnt").collect()[0]["n"]
    assert after == before + 10


def test_nested_views_and_replace(cat):
    cat.sql("CREATE VIEW db.v1 AS SELECT o_orderkey, o_totalprice "
            "FROM db.orders WHERE o_orderkey < 100")
    cat.sql("CREATE VIEW db.v2 AS SELECT count(*) AS n FROM db.v1")
    assert cat.sql("SELECT n FROM db.v2").collect()[0]["n"] == 100
    cat.sql("CREATE OR REPLACE VIEW db.v1 AS "
            "SELECT o_orderkey, o_totalprice FROM db.orders "
            "WHERE o_orderkey < 50")
    assert cat.sql("SELECT n FROM db.v2").collect()[0]["n"] == 50
    # version history kept
    import json
    with open(cat._view_path("db.v1")) as f:
        doc = json.load(f)
    assert doc["current-version-id"] == 2 and len(doc["versions"]) == 2
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW db.v1 AS SELECT 1")  # no REPLACE


def test_view_cycle_raises(cat):
    cat.create_view("db.a", "SELECT * FROM db.b")
    cat.create_view("db.b", "SELECT * FROM db.a")
    with pytest.raises(ValueError, match="cycle"):
        cat.sql("SELECT * FROM db.a")


def test_view_name_cannot_shadow_table(cat):
    with pytest.raises(Exception, match="table"):
        cat.sql("CREATE VIEW db.orders AS SELECT 1")


def test_describe_view(cat):
    cat.sql("CREATE VIEW db.dv AS SELECT o_orderkey, o_totalprice "
            "FROM db.orders WHERE o_orderkey < 10")
    d = {r["col_name"]: r["data_type"]
         for r in cat.sql("DESCRIBE db.dv").collect()}
    assert d["o_orderkey"] == "bigint"
    assert "SELECT o_orderkey" in d["# View Text"]
