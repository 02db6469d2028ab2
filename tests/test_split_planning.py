"""Split planning / bin packing (ref: core/src/test/.../util/TestBinPacking.java
scenarios re-expressed, plus TableScanUtil.planTasks weight semantics)."""

import os

import pytest

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.split_planning import (
    CombinedScanTask,
    SplitTask,
    bin_pack,
    plan_tasks,
    split_file,
    split_files,
)


class _File:
    def __init__(self, path, size, fmt="parquet"):
        self.file_path = path
        self.file_size_in_bytes = size
        self.file_format = fmt


class _Task:
    def __init__(self, path, size, fmt="parquet"):
        self.file = _File(path, size, fmt)
        self.deletes = []
        self.residual = None


def pack(weights, target, lookback, largest_bin_first=False):
    return list(bin_pack(weights, target, lookback, lambda w: w,
                         largest_bin_first))


# ------------------------------------------------------------- bin packing
def test_pack_lookback_1_is_fifo():
    assert pack([1, 2, 3, 4, 5], 5, 1) == [[1, 2], [3], [4], [5]]


def test_pack_combines_across_lookback_bins():
    assert pack([5, 1, 5, 1, 5, 1], 6, 2) == [[5, 1], [5, 1], [5, 1]]


def test_pack_oversize_item_gets_own_bin():
    assert pack([10, 1, 1], 5, 2) == [[10], [1, 1]]


def test_pack_first_fit_within_lookback():
    # 3 opens bin2; 2 then fits bin1 (3+2=5)
    assert pack([3, 3, 2], 5, 2) == [[3, 2], [3]]


def test_pack_largest_bin_first_emits_largest_on_overflow():
    # lookback 1: after [4],[5] open, overflow emits LARGEST (5) not oldest
    out = pack([4, 5, 1], 5, 1, largest_bin_first=True)
    assert out == [[5], [4, 1]]


def test_pack_lookback_must_be_positive():
    with pytest.raises(ValueError):
        pack([1], 5, 0)


# ---------------------------------------------------------------- splitting
def test_split_large_file_fixed_ranges():
    t = _Task("f1", 300)
    parts = split_file(t, 128)
    assert [p.length for p in parts] == [128, 128, 44]
    assert [p.start for p in parts] == [0, 128, 256]
    assert all(isinstance(p, SplitTask) and p.file is t.file for p in parts)


def test_split_small_file_untouched():
    t = _Task("f1", 100)
    assert split_file(t, 128) == [t]


def test_split_unsplittable_format_untouched():
    t = _Task("f1", 1000, fmt="avro")
    assert split_file(t, 128) == [t]


# --------------------------------------------------------------- plan_tasks
def test_plan_tasks_packs_small_files_by_open_cost():
    # 8 tiny files, open cost 4MB, target 16MB -> 4 per bin
    tasks = [_Task(f"f{i}", 100) for i in range(8)]
    combined = plan_tasks(tasks, split_size=16 * 1024 * 1024, lookback=10,
                          open_file_cost=4 * 1024 * 1024)
    assert [len(c.tasks) for c in combined] == [4, 4]


def test_plan_tasks_splits_large_and_keeps_ranges():
    tasks = [_Task("big", 300)]
    combined = plan_tasks(tasks, split_size=128, lookback=10,
                          open_file_cost=1)
    # three ranges, each its own task (each weighs >= 44 vs target 128...
    # 128+128 > 128 so they can't combine)
    lengths = sorted(s.length for c in combined for s in c.tasks)
    assert lengths == [44, 128, 128]


def test_plan_tasks_weight_is_max_of_length_and_open_cost():
    # two 60B files with open cost 50 and target 128: 60+60 <= 128 combine;
    # adding a third (60) would exceed -> second bin
    tasks = [_Task(f"f{i}", 60) for i in range(3)]
    combined = plan_tasks(tasks, split_size=128, lookback=10,
                          open_file_cost=50)
    assert sorted(len(c.tasks) for c in combined) == [1, 2]


# ------------------------------------------------------------ table surface
def test_scan_plan_tasks_end_to_end(catalog, spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    spec = PartitionSpec.builder_for(Schema.from_spark(orders.schema)) \
        .month("o_orderdate").build()
    t = catalog.create_table("db.orders_split", orders, spec=spec)
    t.append(orders)
    files = t.new_scan().plan_files()
    assert len(files) > 1
    # huge open-file cost forces one file per combined task
    singles = t.new_scan().plan_tasks(split_size=1 << 20, lookback=10,
                                      open_file_cost=1 << 20)
    assert len(singles) == len(files)
    # generous target packs everything into one task
    packed = t.new_scan().plan_tasks(split_size=1 << 30, lookback=10,
                                     open_file_cost=1)
    assert len(packed) == 1
    assert isinstance(packed[0], CombinedScanTask)
    assert sum(len(c.tasks) for c in packed) == len(files)
    # table properties drive the defaults
    t.update_properties({"read.split.target-size": "1048576",
                         "read.split.open-file-cost": "1048576"})
    assert len(t.new_scan().plan_tasks()) == len(files)
