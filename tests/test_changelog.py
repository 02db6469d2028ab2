"""Changelog (CDC) scan: exact row-level inserts/deletes per snapshot for
append, delete-where, overwrite, merge (row-delta), and compaction.
"""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import lt, lt_eq


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") <= 400)


def _by_type(df):
    rows = df.collect()
    out = {"insert": [], "delete": []}
    for r in rows:
        out[r["_change_type"]].append(r)
    return out


def test_append_only_changelog(catalog, orders):
    t = catalog.create_table("db.cl1", orders)
    t.append(orders.filter(F.col("o_orderkey") <= 200))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.filter(F.col("o_orderkey") > 200))
    ch = _by_type(t.changes())
    assert len(ch["insert"]) == orders.count()
    assert not ch["delete"]
    # from s1: only the second append
    ch2 = _by_type(t.changes(from_snapshot_id=s1))
    assert len(ch2["insert"]) == \
        orders.filter(F.col("o_orderkey") > 200).count()
    assert {r["_commit_snapshot_id"] for r in ch2["insert"]} == \
        {t.metadata.current_snapshot_id}


def test_delete_where_changelog(catalog, orders):
    t = catalog.create_table("db.cl2", orders)
    t.append(orders)
    s1 = t.metadata.current_snapshot_id
    t.delete_where(lt("o_orderkey", 100))
    ch = _by_type(t.changes(from_snapshot_id=s1))
    gone = {r.o_orderkey for r in ch["delete"]}
    assert gone == {r.o_orderkey for r in
                    orders.filter(F.col("o_orderkey") < 100).collect()}
    # CoW delete rewrites the survivor file: survivors re-appear as inserts
    # only if their file was rewritten; net state must still reconcile
    net = {r.o_orderkey for r in t.to_df().collect()}
    base = {r.o_orderkey for r in orders.collect()}
    assert net == base - gone


def test_merge_changelog_rowdelta(catalog, spark, sf_dir, orders):
    t = catalog.create_table("db.cl3", orders)
    t.append(orders)
    s1 = t.metadata.current_snapshot_id
    full = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = full.filter((F.col("o_orderkey") > 300) & (F.col("o_orderkey") <= 500))
    t.merge(src, key_cols=["o_orderkey"],
            matched_update={"o_totalprice": F.lit(5.0)},
            matched_delete_cond=F.col("s.o_orderkey") % 2 == 0)
    ch = _by_type(t.changes(from_snapshot_id=s1))
    matched = {r.o_orderkey for r in
               orders.filter(F.col("o_orderkey") > 300).collect()}
    deleted_keys = {r.o_orderkey for r in ch["delete"]}
    # every matched key's OLD row is emitted as a delete (update = del+ins)
    assert deleted_keys == matched
    ins = {r.o_orderkey: r.o_totalprice for r in ch["insert"]}
    upd_keys = {k for k in matched if k % 2 == 1}
    new_keys = {r.o_orderkey for r in
                full.filter((F.col("o_orderkey") > 400)
                            & (F.col("o_orderkey") <= 500)).collect()}
    assert set(ins) == upd_keys | new_keys
    assert all(ins[k] == 5.0 for k in upd_keys)


def test_compaction_emits_no_changes(catalog, orders):
    t = catalog.create_table("db.cl4", orders)
    for i in range(3):
        t.append(orders.filter(F.col("o_orderkey") % 3 == i))
    s1 = t.metadata.current_snapshot_id
    t.rewrite_data_files(min_input_files=1)
    assert t.metadata.current_snapshot_id != s1
    ch = t.changes(from_snapshot_id=s1)
    assert ch.count() == 0


def test_overwrite_changelog(catalog, orders):
    t = catalog.create_table("db.cl5", orders)
    t.append(orders)
    s1 = t.metadata.current_snapshot_id
    repl = orders.filter(F.col("o_orderkey") <= 50) \
        .withColumn("o_totalprice", F.lit(1.0))
    t.overwrite_where(repl, lt_eq("o_orderkey", 50))
    ch = _by_type(t.changes(from_snapshot_id=s1))
    del_keys = [r.o_orderkey for r in ch["delete"] if r.o_orderkey <= 50]
    assert sorted(del_keys) == sorted(
        r.o_orderkey for r in orders.filter(F.col("o_orderkey") <= 50)
        .collect())
    ins_new = [r for r in ch["insert"]
               if r.o_orderkey <= 50 and r.o_totalprice == 1.0]
    assert len(ins_new) == len(del_keys)
    # deletes+inserts reconcile to the final state for every key
    # (rewritten survivor rows may appear as delete+insert pairs)
    assert t.to_df().filter(F.col("o_orderkey") <= 50) \
        .filter(F.col("o_totalprice") != 1.0).count() == 0


def test_changelog_across_schema_evolution(catalog, spark, orders):
    """Rows added before a column existed surface in the changelog under
    the CURRENT schema (new column null), same as the scan path."""
    t = catalog.create_table("db.cl7",
                             orders.select("o_orderkey", "o_totalprice"))
    t.append(orders.select("o_orderkey", "o_totalprice")
             .filter(F.col("o_orderkey") <= 100))
    t.update_schema().add_column("flag", "string").commit()
    t.append(orders.select("o_orderkey", "o_totalprice")
             .filter((F.col("o_orderkey") > 100)
                     & (F.col("o_orderkey") <= 150))
             .withColumn("flag", F.lit("new")))
    ch = _by_type(t.changes())
    assert not ch["delete"]
    by_key = {r.o_orderkey: r for r in ch["insert"]}
    assert by_key[1].flag is None
    assert by_key[150].flag == "new"
    assert len(by_key) == \
        orders.filter(F.col("o_orderkey") <= 150).count()


def test_changelog_empty_and_bad_range(catalog, orders):
    t = catalog.create_table("db.cl6", orders)
    assert t.changes().count() == 0
    t.append(orders)
    with pytest.raises(ValueError, match="ancestor"):
        t.changes(from_snapshot_id=123456789)
