"""Named snapshot references (tags): pin, read by name, protect from
expiry, drop (ref: SnapshotRef / ManageSnapshots tag semantics and
RemoveSnapshots retaining ref targets)."""

import pytest
from pyspark.sql import functions as F


def test_tag_lifecycle_and_expiry_protection(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.tags", o)
    t.append(o.filter(F.col("o_orderkey") <= 500))
    n_v1 = t.to_df().count()
    t.create_tag("release-v1")

    t.append(o.filter(F.col("o_orderkey") > 500))
    t.delete_where(__import__(
        "linkedin_iceberg_spark.expressions", fromlist=["lt"]
    ).lt("o_orderkey", 100))

    # read by name: the tag still sees the exact v1 data
    assert t.new_scan().use_ref("release-v1").to_df().count() == n_v1
    assert t.new_scan().use_ref("main").to_df().count() == \
        t.to_df().count()

    # aggressive expiry keeps the tagged snapshot alive
    t.expire_snapshots(retain_last=1)
    t.refresh()
    assert t.new_scan().use_ref("release-v1").to_df().count() == n_v1
    # the refs metadata table lists it
    refs = {r["name"]: r["type"]
            for r in t.metadata_table("refs").collect()}
    assert refs.get("release-v1") == "tag" and refs.get("main") == "branch"

    # duplicate rejected, replace moves, drop removes + unpins
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("release-v1")
    t.create_tag("release-v1", replace=True)    # now points at current
    assert t.new_scan().use_ref("release-v1").to_df().count() == \
        t.to_df().count()
    t.drop_tag("release-v1")
    with pytest.raises(ValueError, match="unknown ref"):
        t.new_scan().use_ref("release-v1")
    with pytest.raises(ValueError, match="unknown tag"):
        t.drop_tag("release-v1")


def test_tag_errors(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.tags2", o)
    t.append(o.limit(10))
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.create_tag("x", snapshot_id=123)
    with pytest.raises(ValueError, match="main"):
        t.create_tag("main")
