"""Multi-column conjunction pruning (r8/r9 verdict stretch):
analyze_dictionary_pair persists per-file exact value-PAIR hash sets so
``a = x AND b = y`` can drop files that EACH single-column dictionary
keeps — the values occur in the file, but never on the same row."""

import shutil

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (
    analyze_dictionary,
    analyze_dictionary_pair,
)
from linkedin_iceberg_spark.expressions import and_, eq, in_


@pytest.fixture()
def tbl(catalog, spark):
    """file A: a=1/b=2 and a=2/b=1 (1 present in both columns, never
    co-occurring); file B: a=1/b=1."""
    a = spark.createDataFrame([(1, 2, "fa"), (2, 1, "fa")],
                              "a bigint, b bigint, tag string")
    b = spark.createDataFrame([(1, 1, "fb"), (3, 3, "fb")],
                              "a bigint, b bigint, tag string")
    t = catalog.create_table("db.pairdict", a)
    t.append(a.coalesce(1))
    t.append(b.coalesce(1))
    return t.refresh()


def _pf(t, flt):
    return t.new_scan().filter(flt).plan_files()


def test_conjunction_drops_what_single_columns_keep(tbl):
    """THE acceptance case: each per-column store keeps both files for
    a=1 AND b=1 (both contain a 1 in each column); the pair store
    proves file A never co-locates them and drops it."""
    flt = and_(eq("a", 1), eq("b", 1))
    analyze_dictionary(tbl, "a")
    analyze_dictionary(tbl, "b")
    assert len(_pf(tbl, flt)) == 2          # single-column: blind
    analyze_dictionary_pair(tbl, ["a", "b"])
    tasks = _pf(tbl, flt)
    assert len(tasks) == 1                  # joint store: file A gone
    # poison-prove: physically remove the pruned file, answers unchanged
    live = {e.data_file.file_path for e in tbl._live_data_and_deletes()[0]}
    kept = {x.file.file_path for x in tasks}
    moved = []
    for p in live - kept:
        shutil.move(p, p + ".poison")
        moved.append(p)
    try:
        got = tbl.new_scan().filter(flt).to_df().collect()
        assert [(r["a"], r["b"]) for r in got] == [(1, 1)]
    finally:
        for p in moved:
            shutil.move(p + ".poison", p)


def test_pair_store_alone_prunes(catalog, spark):
    """No single-column stores at all: the stats_dict_pair directory by
    itself must reach the prune hook."""
    a = spark.createDataFrame([(1, 2), (2, 1)], "a bigint, b bigint")
    b = spark.createDataFrame([(1, 1)], "a bigint, b bigint")
    t = catalog.create_table("db.paironly", a)
    t.append(a.coalesce(1))
    t.append(b.coalesce(1))
    t = t.refresh()
    analyze_dictionary_pair(t, ["a", "b"])
    assert len(_pf(t, and_(eq("a", 1), eq("b", 1)))) == 1


def test_in_cross_product_prunes(tbl):
    analyze_dictionary_pair(tbl, ["a", "b"])
    # {1,3} x {1,3}: file A holds none of those pairs; file B holds
    # (1,1) and (3,3)
    flt = and_(in_("a", [1, 3]), in_("b", [1, 3]))
    assert len(_pf(tbl, flt)) == 1
    got = sorted((r["a"], r["b"]) for r in
                 tbl.new_scan().filter(flt).to_df().collect())
    assert got == [(1, 1), (3, 3)]


def test_overflow_never_prunes(catalog, spark):
    rows = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    t = catalog.create_table("db.pairovf", df)
    t.append(df.coalesce(1))
    t = t.refresh()
    analyze_dictionary_pair(t, ["a", "b"], max_ndv=5)   # overflow
    assert len(_pf(t, and_(eq("a", 1), eq("b", 1)))) == 1  # kept


def test_column_order_is_canonical(tbl):
    """The store is field-id ordered: building with the columns in the
    opposite spelling serves the same conjunction."""
    analyze_dictionary_pair(tbl, ["b", "a"])
    assert len(_pf(tbl, and_(eq("b", 1), eq("a", 1)))) == 1
    assert len(_pf(tbl, and_(eq("a", 1), eq("b", 1)))) == 1


def test_pre_column_files_always_prune(catalog, spark):
    """A file written before column b existed has no co-occurring pair
    — the conjunction can never match it, so it prunes."""
    base = spark.createDataFrame([(1,), (2,)], "a bigint")
    t = catalog.create_table("db.pairevo", base)
    t.append(base.coalesce(1))
    t.refresh().update_schema().add_column("b", "long").commit()
    t = t.refresh()
    newer = spark.createDataFrame([(1, 1)], "a bigint, b bigint")
    t.append(newer.coalesce(1))
    t = t.refresh()
    analyze_dictionary_pair(t, ["a", "b"])
    tasks = _pf(t, and_(eq("a", 1), eq("b", 1)))
    assert len(tasks) == 1
    got = t.new_scan().filter(and_(eq("a", 1), eq("b", 1))) \
        .to_df().collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 1)]


def test_equivalence_sweep(tbl):
    """Every eq x eq combination answers identically with and without
    the pair store (advisory-only contract)."""
    combos = [(x, y) for x in (1, 2, 3, 9) for y in (1, 2, 3, 9)]
    before = {c: tbl.new_scan().filter(and_(eq("a", c[0]), eq("b", c[1])))
              .to_df().count() for c in combos}
    analyze_dictionary_pair(tbl, ["a", "b"])
    for c in combos:
        got = tbl.new_scan().filter(and_(eq("a", c[0]), eq("b", c[1]))) \
            .to_df().count()
        assert got == before[c], c


def test_call_surface(catalog, spark, tbl):
    import json
    out = catalog.sql(
        "CALL analyze_dictionary_pair('db.pairdict', 'a', 'b')").head()
    assert json.loads(out["detail"])["files_analyzed"] == 2
    assert len(_pf(tbl, and_(eq("a", 1), eq("b", 1)))) == 1
    # idempotent: nothing new to scan
    again = catalog.sql(
        "CALL analyze_dictionary_pair('db.pairdict', 'a', 'b')").head()
    assert json.loads(again["detail"])["files_analyzed"] == 0


def test_stats_auto_dictpair_maintains_at_write_time(catalog, spark):
    """stats.auto=dictpair:a+b extends the pair store inside append —
    only the commit's new files sketch, and the conjunction prune works
    with no explicit ANALYZE call."""
    a = spark.createDataFrame([(1, 2), (2, 1)], "a bigint, b bigint")
    b = spark.createDataFrame([(1, 1)], "a bigint, b bigint")
    t = catalog.create_table("db.pairauto", a)
    t.update_properties(set_props={"stats.auto": "dictpair:a+b"})
    t = t.refresh()
    t.append(a.coalesce(1))
    t.append(b.coalesce(1))
    t = t.refresh()
    # never called analyze_dictionary_pair — the writes kept the store
    assert len(_pf(t, and_(eq("a", 1), eq("b", 1)))) == 1
    # nothing left for an explicit run to scan
    assert analyze_dictionary_pair(t, ["a", "b"]) == 0


def test_appends_extend_store_incrementally(tbl, spark):
    analyze_dictionary_pair(tbl, ["a", "b"])
    extra = spark.createDataFrame([(9, 9, "fc")],
                                  "a bigint, b bigint, tag string")
    tbl.append(extra.coalesce(1))
    t = tbl.refresh()
    n = analyze_dictionary_pair(t, ["a", "b"])
    assert n == 1        # only the new tail was scanned
    assert len(_pf(t, and_(eq("a", 9), eq("b", 9)))) == 1
    assert len(_pf(t, and_(eq("a", 1), eq("b", 1)))) == 1
