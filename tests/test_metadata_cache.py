"""Process-wide TableMetadata cache (ref: core/.../CachingCatalog.java).

Contract: repeated load_table/scan cycles on an unchanged table parse the
metadata JSON exactly once; a concurrent commit (new version file) is a
cache miss and is parsed fresh — the version probe always goes to the
filesystem, so staleness is impossible by construction.
"""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import metadata as MD


@pytest.fixture(autouse=True)
def _fresh_cache():
    MD._METADATA_CACHE.clear()
    yield
    MD._METADATA_CACHE.clear()


@pytest.fixture()
def counted_parse(monkeypatch):
    calls = []
    real = MD.TableMetadata.from_json

    def counting(j):
        calls.append(1)
        return real(j)

    monkeypatch.setattr(MD.TableMetadata, "from_json", staticmethod(counting))
    return calls


def test_one_parse_across_repeated_loads(catalog, spark, sf_dir,
                                         counted_parse):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(200)
    t = catalog.create_table("db.mc", o)
    t.append(o)
    counted_parse.clear()

    for _ in range(5):
        t2 = catalog.load_table("db.mc")
        assert t2.to_df().count() == 200
    assert sum(counted_parse) == 1  # first load parses, the rest hit


def test_concurrent_commit_invalidates(catalog, spark, sf_dir,
                                       counted_parse):
    from linkedin_iceberg_spark.catalog.metadata import TableOperations
    from linkedin_iceberg_spark.catalog.table import Table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    t = catalog.create_table("db.mc2", o)
    t.append(o.filter(F.col("o_orderkey") <= 50))
    v0 = t.version

    # an independent writer (fresh ops, as another process would have)
    other = Table(spark, TableOperations(t.location),
                  TableOperations(t.location).refresh(), v0, "db.mc2")
    other.append(o.filter(F.col("o_orderkey") > 50))

    counted_parse.clear()
    t2 = catalog.load_table("db.mc2")
    assert t2.version == v0 + 1          # sees the concurrent commit
    assert sum(counted_parse) == 1       # new version parsed exactly once
    assert t2.to_df().count() == 100
    # and loading again is a pure cache hit
    counted_parse.clear()
    catalog.load_table("db.mc2")
    assert sum(counted_parse) == 0


def test_cache_is_bounded(tmp_path, spark, counted_parse):
    from linkedin_iceberg_spark import Catalog
    cat = Catalog(spark, str(tmp_path / "wh"))
    sdf = spark.range(3).select(F.col("id"))
    n = MD._METADATA_CACHE_MAX + 5
    for i in range(n):
        cat.create_table(f"db.b{i}", sdf)
    for i in range(n):
        cat.load_table(f"db.b{i}")
    assert len(MD._METADATA_CACHE) <= MD._METADATA_CACHE_MAX


def test_metadata_log_retention_and_cleanup(catalog, spark, sf_dir):
    """r4: the metadata-log keeps only the configured number of previous
    versions, and delete-after-commit unlinks the dropped files — the
    current metadata stays fully readable and version numbering intact."""
    import glob
    import os

    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(40)
    t = catalog.create_table(
        "db.mdlog", o,
        properties={
            "write.metadata.previous-versions-max": "3",
            "write.metadata.delete-after-commit.enabled": "true"})
    for i in range(7):
        t.append(o.filter(F.col("o_orderkey") % 7 == i))
    t.refresh()
    assert len(t.metadata.metadata_log) <= 3
    assert t.to_df().count() == o.count()
    files = sorted(glob.glob(os.path.join(t.ops.metadata_dir,
                                          "v*.metadata.json")))
    # current + hinted recent versions only; early versions unlinked
    assert len(files) <= 3 + 2
    assert not os.path.exists(os.path.join(t.ops.metadata_dir,
                                           "v1.metadata.json"))
    # history (snapshot lineage) is untouched by metadata-file pruning
    assert len(t.metadata.snapshots) == 7


def test_version_recovery_without_hint_after_pruning(catalog, spark,
                                                     sf_dir):
    """Lost hint + pruned early versions: the directory listing recovers
    the current version (a forward scan from v0 would see no table)."""
    import os

    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(30)
    t = catalog.create_table(
        "db.mdhint", o,
        properties={
            "write.metadata.previous-versions-max": "2",
            "write.metadata.delete-after-commit.enabled": "true"})
    for i in range(5):
        t.append(o.filter(F.col("o_orderkey") % 5 == i))
    os.unlink(t.ops._hint_path())
    from linkedin_iceberg_spark.catalog.metadata import (
        invalidate_metadata_cache)
    invalidate_metadata_cache(t.location)
    t2 = catalog.load_table("db.mdhint")
    assert t2.version == t.version
    assert t2.to_df().count() == o.count()
