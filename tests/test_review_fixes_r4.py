"""Round-4 self-review fixes, each with the failure scenario found.

1. minhash fast path: documents shorter than shingle_n crashed under
   ANSI mode (element_at past the array) — try_element_at pads.
2. eq-delete bounds pruning ignored NULL keys: bounds exclude nulls but
   application is null-safe, so NULL-key deletes silently stopped
   applying (and remove_dangling_deletes made it permanent).
3. agg_minmax folded footer bounds for float/double — which exclude NaN
   while Spark's max returns NaN — so the fast answer diverged.
4. current_version trusted a hint whose version file had been pruned by
   delete-after-commit, stopping the forward scan at the gap.
5. cap/mix windows sorted NULL buckets first (Spark ASC default) while
   the DuckDB oracle sorts them last — NULL ids consumed cap/budget.
6. dedup_spans order-encoded (id * 1e6 + span) — string ids broke it.
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_minhash_survives_short_documents(spark):
    from linkedin_iceberg_spark.operators.dedup import (
        minhash_lsh_candidates)
    docs = [Row(doc_id=1, text="one"),
            Row(doc_id=2, text="two words"),
            Row(doc_id=3, text="one"),              # dup of 1
            Row(doc_id=4, text=" ".join(f"w{i}" for i in range(30)))]
    pairs = minhash_lsh_candidates(spark.createDataFrame(docs),
                                   "text", "doc_id", 16, 8).collect()
    got = {(r["d1"], r["d2"]) for r in pairs}
    assert (1, 3) in got  # the short duplicates still collide


def test_null_key_eq_delete_still_applies(catalog, spark):
    from linkedin_iceberg_spark.catalog.row_delta import row_delta
    rows = [Row(k=None, v=1), Row(k=None, v=2)] + \
        [Row(k=i, v=i) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "k long, v long")
    t = catalog.create_table("db.nulldel", df)
    t.append(df.orderBy("v"))
    # delete key NULL plus one far-away key: bounds would look disjoint
    keys = spark.createDataFrame([Row(k=None), Row(k=500)], "k long")
    row_delta(t, equality_delete_keys=keys, key_cols=["k"])
    t.refresh()
    # null-safe application must still remove the NULL-key rows
    assert t.to_df().filter("k is null").count() == 0
    assert t.to_df().count() == 40
    # and the delete is NOT classified as dangling while it guards them
    assert t.remove_dangling_deletes()["removed_delete_files"] == 0


def test_agg_minmax_nan_matches_scan(catalog, spark):
    rows = [Row(k=i, x=float(i)) for i in range(50)] + \
        [Row(k=99, x=float("nan"))]
    df = spark.createDataFrame(rows, "k long, x double")
    t = catalog.create_table("db.nanmm", df)
    t.append(df)
    lo, hi = t.new_scan().agg_minmax("x")
    want = t.to_df().agg(F.min("x"), F.max("x")).head()
    assert lo == want[0]
    assert math.isnan(hi) == (isinstance(want[1], float)
                              and math.isnan(want[1]))
    assert math.isnan(hi)  # Spark's max over a NaN-bearing column IS NaN


def test_version_recovery_with_stale_hint_after_pruning(catalog, spark,
                                                        sf_dir):
    import os
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(30)
    t = catalog.create_table(
        "db.stalehint", o,
        properties={"write.metadata.previous-versions-max": "2",
                    "write.metadata.delete-after-commit.enabled": "true"})
    for i in range(6):
        t.append(o.filter(F.col("o_orderkey") % 6 == i))
    # hint points at a version whose FILE was pruned
    with open(t.ops._hint_path(), "w") as fh:
        fh.write("1")
    from linkedin_iceberg_spark.catalog.metadata import (
        invalidate_metadata_cache)
    invalidate_metadata_cache(t.location)
    t2 = catalog.load_table("db.stalehint")
    assert t2.version == t.version
    assert t2.to_df().count() == o.count()


def test_cap_and_mix_put_null_ids_last(spark):
    from linkedin_iceberg_spark.operators.sampling import (
        cap_per_group, mix_by_token_budget)
    rows = [Row(doc_id=None, g="a", n=50)] * 3 + \
        [Row(doc_id=i, g="a", n=50) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, n long")
    kept = cap_per_group(df, "g", n=5, id_col="doc_id").collect()
    assert all(r["doc_id"] is not None for r in kept)  # NULLs sort last
    mixed = mix_by_token_budget(df, "g", "n", {}, id_col="doc_id",
                                default_budget=250).collect()
    assert len(mixed) == 5 and all(r["doc_id"] is not None for r in mixed)


def test_dedup_spans_string_ids(spark):
    from linkedin_iceberg_spark.operators.dedup import dedup_spans
    boiler = " ".join(f"b{i}" for i in range(10))
    docs = [Row(doc_id="url/a", text=boiler + " unique a"),
            Row(doc_id="url/b", text=boiler + " unique b")]
    out = {r["doc_id"]: r for r in
           dedup_spans(spark.createDataFrame(docs), span_tokens=10,
                       id_col="doc_id").collect()}
    assert out["url/a"]["n_dropped"] == 0      # first-seen keeps it
    assert out["url/b"]["n_dropped"] == 1      # later string id loses
    assert out["url/b"]["clean_text"] == "unique b"
