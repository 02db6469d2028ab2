"""r11: the GROUPED spelling of the SQL approx_percentile route, and
stats.auto maintenance of grouped sample stores.

`SELECT g, approx_percentile(c, 0.5) ... GROUP BY g` routes through the
grouped sample plane (_sql_group_count) — per-group percentiles from
metadata under the engine's deterministic bottom-k semantics, poisoned
BEFORE cat.sql because the fast route evaluates eagerly.  The
``sample:col@grp`` stats.auto spelling keeps the grouped store covered
across appends and compaction with no manual CALL cadence."""

import shutil

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (
    analyze_sample,
    sampled_quantiles_from_store,
)


@pytest.fixture()
def tbl(catalog, spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 500, ["en", "de", "fr"][i % 3])
         for i in range(300)],
        "id bigint, n bigint, lang string")
    t = catalog.create_table("db.gsql", df)
    t.append(df.filter("id < 150").repartition(2))
    t.append(df.filter("id >= 150").repartition(2))
    return t.refresh()


def _poison(t):
    moved = []
    for e in t._live_data_and_deletes()[0]:
        p = e.data_file.file_path
        shutil.move(p, p + ".poison")
        moved.append(p)
    return moved


def _restore(moved):
    for p in moved:
        shutil.move(p + ".poison", p)


def test_sql_grouped_percentile_store_served(catalog, tbl):
    assert analyze_sample(tbl, "n", group_col="lang") == 4
    want = {(r["lang"], r["pct"]): r["quantile_value"]
            for r in sampled_quantiles_from_store(
                tbl, "n", pcts=(50, 90), group_col="lang").collect()}
    # the fast route evaluates EAGERLY inside cat.sql: poison FIRST
    moved = _poison(tbl)
    try:
        got = catalog.sql(
            "SELECT lang, approx_percentile(n, 0.5) AS p50, "
            "percentile_approx(n, 0.9) AS p90 "
            "FROM db.gsql GROUP BY lang ORDER BY lang").collect()
    finally:
        _restore(moved)
    assert [r["lang"] for r in got] == ["de", "en", "fr"]
    for r in got:
        assert r["p50"] == want[(r["lang"], 50)]
        assert r["p90"] == want[(r["lang"], 90)]


def test_sql_grouped_percentile_mixed_items(catalog, tbl):
    """Percentiles compose with the other grouped folds in one
    statement (count + percentile, HAVING/ORDER on outputs).  No
    poison here: count(*) grouped on a NON-partition column reads the
    undecidable files by design (degrade-gracefully), only the
    percentile side is store-served."""
    analyze_sample(tbl, "n", group_col="lang")
    got = catalog.sql(
        "SELECT lang, count(*) AS cnt, "
        "approx_percentile(n, 0.5) AS p50 "
        "FROM db.gsql GROUP BY lang HAVING cnt > 1 "
        "ORDER BY lang").collect()
    assert len(got) == 3 and all(r["cnt"] == 100 for r in got)
    want = {r["lang"]: r["quantile_value"]
            for r in sampled_quantiles_from_store(
                tbl, "n", pcts=(50,), group_col="lang").collect()}
    assert {r["lang"]: r["p50"] for r in got} == want


def test_sql_grouped_percentile_bails_to_generic(catalog, tbl):
    """A WHERE clause, two group columns, or a non-integer percent all
    take the generic Spark route (correct rows, data read)."""
    analyze_sample(tbl, "n", group_col="lang")
    for stmt in (
            "SELECT lang, approx_percentile(n, 0.5) AS p "
            "FROM db.gsql WHERE id > 10 GROUP BY lang",
            "SELECT lang, id, approx_percentile(n, 0.5) AS p "
            "FROM db.gsql GROUP BY lang, id",
            "SELECT lang, approx_percentile(n, 0.505) AS p "
            "FROM db.gsql GROUP BY lang"):
        moved = _poison(tbl)
        try:
            with pytest.raises(Exception):
                catalog.sql(stmt).collect()
        finally:
            _restore(moved)
        assert catalog.sql(stmt).count() > 0  # generic route works


def test_sql_grouped_percentile_all_null_group(catalog, spark):
    """A group whose every value is NULL still appears, with a NULL
    percentile (Spark semantics), served from metadata."""
    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 20, "en"), (3, None, "xx"), (4, None, "xx")],
        "id bigint, n bigint, lang string")
    t = catalog.create_table("db.gsqln", df)
    t.append(df.coalesce(1))
    t = t.refresh()
    analyze_sample(t, "n", group_col="lang")
    moved = _poison(t)
    try:
        got = {r["lang"]: r["p50"] for r in catalog.sql(
            "SELECT lang, approx_percentile(n, 0.5) AS p50 "
            "FROM db.gsqln GROUP BY lang").collect()}
    finally:
        _restore(moved)
    assert got == {"en": 10, "xx": None}


def test_stats_auto_grouped_sample_spelling(catalog, spark):
    """``sample:n@lang``: append extends the grouped store inside the
    write, compaction's stats.auto re-run covers the rewritten files —
    the grouped serve never falls back to live (poison-proven)."""
    df = spark.createDataFrame(
        [(i, i * 3, ["en", "de"][i % 2]) for i in range(200)],
        "id bigint, n bigint, lang string")
    t = catalog.create_table("db.gauto", df)
    t.update_properties(set_props={"stats.auto": "sample:n@lang"})
    t.append(df.filter("id < 100").repartition(2))
    t.append(df.filter("id >= 100").repartition(2))
    t = t.refresh()
    moved = _poison(t)
    try:
        got = sampled_quantiles_from_store(
            t, "n", pcts=(50,), group_col="lang").collect()
    finally:
        _restore(moved)
    assert {r["lang"] for r in got} == {"en", "de"}
    # compaction rewrites files; its stats.auto re-run must re-cover
    t.rewrite_data_files(target_size_bytes=1 << 30, min_input_files=2)
    t = t.refresh()
    want = [tuple(r) for r in sampled_quantiles_from_store(
        t, "n", pcts=(50, 99), group_col="lang").collect()]
    moved = _poison(t)
    try:
        served = [tuple(r) for r in sampled_quantiles_from_store(
            t, "n", pcts=(50, 99), group_col="lang").collect()]
    finally:
        _restore(moved)
    assert served == want
