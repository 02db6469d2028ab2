"""Full MERGE INTO semantics (one RowDelta snapshot): clause combinations,
source-uniqueness validation, and the no-empty-file guarantee."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def target(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderkey") <= 500)
    t = catalog.create_table("db.mrg", o)
    t.append(o)
    return t, o


def test_merge_update_delete_insert(spark, sf_dir, target):
    t, o = target
    full = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = full.filter((F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 600))
    t.merge(src, key_cols=["o_orderkey"],
            matched_delete_cond=F.col("s.o_orderkey") % 5 == 0,
            matched_update={"o_totalprice": F.col("t.o_totalprice") * 2},
            matched_update_cond=F.col("s.o_orderkey") % 5 == 1)
    got = {r.o_orderkey: r.o_totalprice for r in
           t.to_df().select("o_orderkey", "o_totalprice").collect()}
    base = {r.o_orderkey: r.o_totalprice for r in
            o.select("o_orderkey", "o_totalprice").collect()}
    ins = {r.o_orderkey: r.o_totalprice for r in
           full.filter((F.col("o_orderkey") > 500)
                       & (F.col("o_orderkey") <= 600))
           .select("o_orderkey", "o_totalprice").collect()}
    expect = {}
    for k, v in base.items():
        if 400 < k <= 500 and k % 5 == 0:
            continue  # deleted
        expect[k] = round(v * 2, 2) if (400 < k <= 500 and k % 5 == 1) else v
    expect.update(ins)  # unmatched inserts (501..600)
    assert {k: round(v, 2) for k, v in got.items()} == \
        {k: round(v, 2) for k, v in expect.items()}


def test_merge_delete_only_no_inserts(spark, target):
    t, o = target
    n0 = t.to_df().count()
    src = o.filter(F.col("o_orderkey") <= 50).select("o_orderkey")
    t.merge(src, key_cols=["o_orderkey"],
            matched_delete_cond=F.lit(True), insert_unmatched=False)
    matched = o.filter(F.col("o_orderkey") <= 50).count()
    assert t.to_df().count() == n0 - matched
    # delete-only merge adds no data file
    snap = t.metadata.current_snapshot
    assert snap.summary.get("added-data-files", "0") == "0"
    assert int(snap.summary["added-delete-files"]) >= 1


def test_merge_insert_only(spark, sf_dir, target):
    t, o = target
    full = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = full.filter((F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 550))
    n_new = src.count()
    n0 = t.to_df().count()
    t.merge(src, key_cols=["o_orderkey"])  # no matched clauses
    assert t.to_df().count() == n0 + n_new
    # nothing matched-with-action -> no delete file registered
    snap = t.metadata.current_snapshot
    assert snap.summary.get("added-delete-files", "0") == "0"


def test_merge_rejects_duplicate_source_keys(spark, target):
    t, o = target
    dup = o.limit(10).unionByName(o.limit(5))
    with pytest.raises(ValueError, match="not unique"):
        t.merge(dup, key_cols=["o_orderkey"],
                matched_update={"o_totalprice": F.lit(0.0)})


def test_merge_noop_clauses_commit_nothing_harmful(spark, target):
    t, o = target
    before = t.to_df().count()
    # matched rows exist but every condition is false -> no changes
    src = o.filter(F.col("o_orderkey") <= 20)
    t.merge(src, key_cols=["o_orderkey"],
            matched_delete_cond=F.lit(False),
            matched_update={"o_totalprice": F.lit(0.0)},
            matched_update_cond=F.lit(False),
            insert_unmatched=False)
    assert t.to_df().count() == before
    assert t.to_df().filter(F.col("o_totalprice") == 0.0).count() == 0


def test_merge_prunes_target_scan_by_source_bounds(catalog, spark, sf_dir):
    """r8: a source-only merge scans only the target slice inside the
    source's key envelope — the join must not read the whole table."""
    from linkedin_iceberg_spark import PartitionSpec, Schema
    from linkedin_iceberg_spark.catalog import row_delta as RD
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = PartitionSpec.builder_for(Schema.from_spark(o.schema)) \
        .truncate("o_orderkey", 100).build()
    t = catalog.create_table("db.mrg_prune", o, spec=spec)
    t.append(o)
    n_all = len(t.new_scan().plan_files())
    src = o.filter((F.col("o_orderkey") >= 200)
                   & (F.col("o_orderkey") < 300)) \
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    pred = RD._source_key_bounds(src, ["o_orderkey"])
    n_slice = len(t.new_scan().filter(pred).plan_files())
    assert 0 < n_slice < n_all
    t.merge(src, key_cols=["o_orderkey"],
            matched_update={"o_totalprice": F.col("s.o_totalprice")},
            insert_unmatched=False)
    got = {r.o_orderkey: r.o_totalprice for r in
           t.to_df().select("o_orderkey", "o_totalprice").collect()}
    want = {r.o_orderkey:
            round(r.o_totalprice * 2, 2) if 200 <= r.o_orderkey < 300
            else r.o_totalprice
            for r in o.select("o_orderkey", "o_totalprice").collect()}
    assert {k: round(v, 2) for k, v in got.items()} == want
