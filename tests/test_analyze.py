"""Incremental NDV stats plane (catalog/analyze.py): per-file sketches,
append-tail incrementality, DML survival via file immutability."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import analyze_table, column_stats
from linkedin_iceberg_spark.expressions import lt


@pytest.fixture()
def t(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    tbl = catalog.create_table("db.anlz", orders)
    tbl.append(orders.repartition(4))
    return tbl, orders


def test_ndv_within_hll_band_and_metrics_exact(t):
    tbl, orders = t
    analyze_table(tbl, ["o_custkey", "o_orderpriority"])
    for col in ["o_custkey", "o_orderpriority"]:
        st = column_stats(tbl, col)
        exact = orders.select(col).distinct().count()
        assert abs(st["ndv"] - exact) <= max(1, 0.05 * exact)
        assert st["row_count"] == orders.count()
        assert st["null_count"] == 0
        assert not st["upper_bound"]
    st = column_stats(tbl, "o_custkey")
    assert st["min"] == orders.agg(F.min("o_custkey")).collect()[0][0]
    assert st["max"] == orders.agg(F.max("o_custkey")).collect()[0][0]


def test_analyze_is_incremental_on_append(t):
    tbl, orders = t
    first = analyze_table(tbl, ["o_custkey"])
    assert first["o_custkey"] == 4
    tbl.append(orders.limit(100).coalesce(1))
    second = analyze_table(tbl, ["o_custkey"])
    assert second["o_custkey"] == 1  # ONLY the new file is scanned
    assert analyze_table(tbl, ["o_custkey"])["o_custkey"] == 0
    st = column_stats(tbl, "o_custkey")
    exact = orders.select("o_custkey").distinct().count()
    assert abs(st["ndv"] - exact) <= max(1, 0.05 * exact)


def test_dml_rewrites_need_only_new_files(t):
    tbl, orders = t
    analyze_table(tbl, ["o_custkey"])
    tbl.delete_where(lt("o_orderkey", 200))  # CoW rewrite of some files
    added = analyze_table(tbl, ["o_custkey"])["o_custkey"]
    live = len(tbl._live_data_and_deletes()[0])
    assert 1 <= added <= live  # rewritten outputs only, never the world
    st = column_stats(tbl, "o_custkey")
    exact = tbl.to_df().select("o_custkey").distinct().count()
    assert abs(st["ndv"] - exact) <= max(1, 0.05 * exact)
    assert st["row_count"] == tbl.to_df().count()


def test_uncovered_files_raise(t):
    tbl, orders = t
    with pytest.raises(ValueError, match="analyze_table"):
        column_stats(tbl, "o_custkey")
    analyze_table(tbl, ["o_custkey"])
    tbl.append(orders.limit(10).coalesce(1))
    with pytest.raises(ValueError, match="missing tail"):
        column_stats(tbl, "o_custkey")
    with pytest.raises(ValueError, match="no such column"):
        analyze_table(tbl, ["nope"])


def test_suggest_broadcast_reads_metadata(t, spark):
    """Advice comes from summed live-file bytes in the manifests times
    the decompression factor (r7: estimated MEMORY, not raw file
    bytes), agrees with the session threshold, and never fires on
    unknowns (r6)."""
    from linkedin_iceberg_spark.catalog.analyze import suggest_broadcast

    tbl, _ = t
    live = tbl._live_data_and_deletes()[0]
    total = sum(e.data_file.file_size_in_bytes for e in live)
    assert total > 0
    # the sf0.001 table is tiny: fits the 10MB default even at 3x
    assert suggest_broadcast(tbl) is True
    # the budget compares ESTIMATED MEMORY = bytes * factor
    assert suggest_broadcast(tbl, threshold_bytes=total * 3 - 1) is False
    assert suggest_broadcast(tbl, threshold_bytes=total * 3) is True
    # factor 1.0 restores the raw-bytes comparison
    assert suggest_broadcast(tbl, threshold_bytes=total,
                             decompression_factor=1.0) is True
    assert suggest_broadcast(tbl, threshold_bytes=total - 1,
                             decompression_factor=1.0) is False
    # session disabled broadcasts entirely
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert suggest_broadcast(tbl) is False
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1g")
        assert suggest_broadcast(tbl) is True
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_suggest_broadcast_wide_compressible_table(catalog, spark):
    """r7 (verdict #4): a table whose PARQUET bytes squeeze under the
    budget but whose decompressed rows would not is NOT advised —
    dictionary-compressed repetitive strings are the classic trap.  The
    row bound refuses many-row builds independently of byte size."""
    from linkedin_iceberg_spark.catalog.analyze import suggest_broadcast

    # 20k rows of a single repeated 200-char string: parquet dictionary
    # encoding crushes this far below its in-memory footprint
    wide = spark.range(20_000).select(
        F.col("id"), F.lit("x" * 200).alias("payload"))
    tbl = catalog.create_table("db.widezip", wide)
    tbl.append(wide)
    live = tbl._live_data_and_deletes()[0]
    file_bytes = sum(e.data_file.file_size_in_bytes for e in live)
    logical = 20_000 * 200
    assert file_bytes * 5 < logical  # compression actually happened
    # budget sits between raw bytes and 3x bytes: raw-bytes advice
    # would say broadcast, the memory estimate refuses
    budget = file_bytes * 2
    assert suggest_broadcast(tbl, threshold_bytes=budget,
                             decompression_factor=1.0) is True
    assert suggest_broadcast(tbl, threshold_bytes=budget) is False
    # row bound from manifest record_counts, no data I/O
    assert suggest_broadcast(tbl, threshold_bytes=logical * 10,
                             max_rows=10_000) is False
    assert suggest_broadcast(tbl, threshold_bytes=logical * 10,
                             max_rows=20_000) is True


def test_merge_consults_advisor_and_stays_exact(catalog, spark, sf_dir,
                                                monkeypatch):
    """A hint-free merge broadcasts its target iff the advisor says the
    metadata fits — and the committed rows are identical either way."""
    from linkedin_iceberg_spark.catalog import row_delta
    from linkedin_iceberg_spark.catalog import analyze

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .filter(F.col("o_orderkey") < 400)
    src = orders.filter(F.col("o_orderkey") < 100) \
        .withColumn("o_orderpriority", F.lit("MERGED"))

    def run(name, force_no_broadcast):
        tbl = catalog.create_table(name, orders)
        tbl.append(orders)
        if force_no_broadcast:
            monkeypatch.setattr(analyze, "suggest_broadcast",
                                lambda *a, **k: False)
        row_delta.merge(tbl, src, key_cols=["o_orderkey"],
                        matched_update={"o_orderpriority":
                                        F.col("s.o_orderpriority")})
        tbl.refresh()
        return sorted((r.o_orderkey, r.o_orderpriority)
                      for r in tbl.to_df().collect())

    a = run("db.adv_b", False)
    b = run("db.adv_s", True)
    assert a == b
    assert sum(1 for _k, p in a if p == "MERGED") == src.count()
