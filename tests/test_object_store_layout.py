"""write.object-storage.enabled: hashed data-file layout (prefix spread)."""

import os
import re

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.maintenance import remove_orphan_files


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _data_rel_paths(t):
    return [os.path.relpath(task.file.file_path,
                            os.path.join(t.location, "data"))
            for task in t.new_scan().plan_files()]


def test_hashed_layout_and_read(catalog, orders):
    t = catalog.create_table(
        "db.objstore", orders,
        properties={"write.object-storage.enabled": "true"})
    t.append(orders)
    t.append(orders.limit(100))
    rels = _data_rel_paths(t)
    assert rels
    ctx = os.path.join(os.path.basename(os.path.dirname(t.location)),
                       os.path.basename(t.location))
    for rel in rels:
        # <8-hex hash>/<warehouse-parent>/<table>/<filename>
        parts = rel.split(os.sep)
        assert re.fullmatch(r"[0-9a-f]{8}", parts[0]), rel
        assert os.sep.join(parts[1:3]) == ctx, rel
    # files with distinct names spread across distinct hash prefixes
    assert len({r.split(os.sep)[0] for r in rels}) > 1 or len(rels) == 1
    assert t.to_df().count() == orders.count() + 100


def test_partition_path_preserved_under_hash(catalog, orders):
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table(
        "db.objstore_part", orders, spec=spec,
        properties={"write.object-storage.enabled": "true"})
    t.append(orders)
    rels = _data_rel_paths(t)
    assert all("=" in rel.split(os.sep)[-2] for rel in rels), rels[:3]
    # partition pruning still works on the hashed layout
    import datetime

    from linkedin_iceberg_spark.expressions import and_, gt_eq, lt
    pruned = t.new_scan().filter(
        and_(gt_eq("o_orderdate", datetime.date(1996, 1, 1)),
             lt("o_orderdate", datetime.date(1996, 2, 1)))).plan_files()
    assert 0 < len(pruned) < len(rels)


def test_no_orphans_and_maintenance_compatible(catalog, orders):
    t = catalog.create_table(
        "db.objstore_m", orders,
        properties={"write.object-storage.enabled": "true"})
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    # nothing stranded in staging dirs
    assert remove_orphan_files(t, older_than_ms=int(1e18),
                               dry_run=True)["orphans_deleted"] == 0
    n = t.to_df().count()
    t.rewrite_data_files(min_input_files=2)
    assert t.to_df().count() == n


def test_hashed_layout_orc_format(catalog, orders):
    t = catalog.create_table(
        "db.objstore_orc", orders,
        properties={"write.object-storage.enabled": "true",
                    "write.format-default": "orc"})
    t.append(orders.limit(500))
    rels = _data_rel_paths(t)
    assert rels and all(r.endswith(".orc") for r in rels)
    assert all(re.fullmatch(r"[0-9a-f]{8}", r.split(os.sep)[0])
               for r in rels), rels[:2]
    assert t.to_df().count() == 500
