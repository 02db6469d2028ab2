"""r9: the HLL and KMV stores join the other planes in FIELD-ID keying —
a name-keyed store silently served the DROPPED column's sketches to a
NEW column reusing the name (the same stale-identity family as the r8
bloom/histogram rename advice, one step further down)."""

import pytest
from pyspark.sql import functions as F


def _drop_readd(catalog, spark, name):
    df = spark.createDataFrame([(i, i % 100) for i in range(1000)],
                               "id bigint, v bigint")
    t = catalog.create_table(name, df)
    t.append(df)
    t = t.refresh()
    return t, df


def test_kmv_store_not_inherited_by_readded_name(catalog, spark):
    from linkedin_iceberg_spark.catalog.analyze import analyze_table_kmv
    t, _df = _drop_readd(catalog, spark, "db.kmv_readd")
    analyze_table_kmv(t, ["v"])
    assert t.new_scan().approx_ndv("v") == 100
    up = t.update_schema()
    up.delete_column("v")
    up.commit()
    t = t.refresh()
    up = t.update_schema()
    up.add_column("v", "long")
    up.commit()
    t = t.refresh()
    # the new v has exactly 3 distinct values; old files read NULL
    t.append(spark.createDataFrame([(10_000 + i, i % 3) for i in range(50)],
                                   "id bigint, v bigint"))
    t = t.refresh()
    analyze_table_kmv(t, ["v"])
    # name-keyed stores answered ~100 here (the dropped column's hashes)
    assert t.new_scan().approx_ndv("v") == 3


def test_hll_store_not_inherited_by_readded_name(catalog, spark):
    from linkedin_iceberg_spark.catalog.analyze import (analyze_table,
                                                        column_stats)
    t, _df = _drop_readd(catalog, spark, "db.hll_readd")
    analyze_table(t, ["v"])
    assert abs(column_stats(t, "v")["ndv"] - 100) <= 2
    up = t.update_schema()
    up.delete_column("v")
    up.commit()
    t = t.refresh()
    up = t.update_schema()
    up.add_column("v", "long")
    up.commit()
    t = t.refresh()
    t.append(spark.createDataFrame([(10_000 + i, i % 3) for i in range(50)],
                                   "id bigint, v bigint"))
    t = t.refresh()
    analyze_table(t, ["v"])
    assert abs(column_stats(t, "v")["ndv"] - 3) <= 1


def test_kmv_store_survives_rename(catalog, spark):
    """The flip side of field-id keying: a RENAME keeps the store —
    zero re-analysis, coverage intact under the new name."""
    from linkedin_iceberg_spark.catalog.analyze import analyze_table_kmv
    t, _df = _drop_readd(catalog, spark, "db.kmv_ren")
    analyze_table_kmv(t, ["v"])
    up = t.update_schema()
    up.rename_column("v", "val")
    up.commit()
    t = t.refresh()
    assert analyze_table_kmv(t, ["val"]) == {"val": 0}  # fully covered
    assert t.new_scan().approx_ndv("val") == 100


def test_key_index_survives_rename_and_pre_rename_files(catalog, spark):
    """The key index is field-id keyed and builds through the
    schema-aware read: keys in files written BEFORE a rename still
    resolve (a current-name read indexed them as NULL, silently losing
    rows through read_by_keys), and the index stays valid — no rebuild —
    after the rename."""
    from linkedin_iceberg_spark.catalog.key_index import (build_key_index,
                                                          read_by_keys)
    df = spark.createDataFrame([(i, 1000 + i) for i in range(500)],
                               "id bigint, k bigint")
    t = catalog.create_table("db.kidx_ren", df)
    t.append(df.repartition(4))
    t = t.refresh()
    up = t.update_schema()
    up.rename_column("k", "key_col")
    up.commit()
    t = t.refresh()
    build_key_index(t, "key_col")
    got = read_by_keys(t, "key_col", [1007, 1399])
    assert sorted(r["id"] for r in got.collect()) == [7, 399]


def test_key_index_not_inherited_by_readded_name(catalog, spark):
    """Drop + re-add of a column name is a NEW field id: lookups must
    not serve the dropped column's key->file map."""
    import pytest as _pt

    from linkedin_iceberg_spark.catalog.key_index import (
        StaleKeyIndexError, build_key_index, lookup_files)
    df = spark.createDataFrame([(i, 1000 + i) for i in range(100)],
                               "id bigint, k bigint")
    t = catalog.create_table("db.kidx_readd", df)
    t.append(df)
    t = t.refresh()
    build_key_index(t, "k")
    up = t.update_schema()
    up.delete_column("k")
    up.commit()
    t = t.refresh()
    up = t.update_schema()
    up.add_column("k", "long")
    up.commit()
    t = t.refresh()
    with _pt.raises(StaleKeyIndexError):
        lookup_files(t, "k", [1007])


def test_approx_ndv_live_hash_is_rename_safe(catalog, spark):
    """approx_ndv's LIVE path (files not yet covered by the KMV store)
    must hash pre-rename files under their written name — a current-name
    read nulled them out and undercounted NDV."""
    df = spark.createDataFrame([(i, i % 40) for i in range(800)],
                               "id bigint, v bigint")
    t = catalog.create_table("db.ndv_live_ren", df)
    t.append(df)
    t = t.refresh()
    up = t.update_schema()
    up.rename_column("v", "val")
    up.commit()
    t = t.refresh()
    t.append(spark.createDataFrame(
        [(9000 + i, 100 + i % 5) for i in range(100)],
        "id bigint, val bigint"))
    t = t.refresh()
    # NO analyze: the whole answer rides the live-hash path
    assert t.new_scan().approx_ndv("val") == 45
