"""Split planning + bin packing: task-count parity with the reference.

ref: core/.../util/TableScanUtil.java:33-49 (splitFiles/planTasks),
core/.../util/BinPacking.java:35-58 (lookback bin packer),
core/.../BaseFileScanTask.java:84-180 (per-file split iterators),
core/.../TableProperties.java:68-78 (split size/lookback/open-cost defaults).

Spark itself re-splits by ``spark.sql.files.maxPartitionBytes``, so the
DataFrame read path doesn't need this — but ``plan_files()`` output is also
a public planning API (local reads, external executors), and there task
COUNT parity with the reference matters: combine many small files into one
task (open-file cost floor) and split giant files at split-size boundaries.

The packer is the reference's lookback algorithm: keep up to ``lookback``
open bins, place each item into the FIRST open bin with room, open a new
bin when none fits, and emit (oldest, or largest when ``largest_bin_first``)
once the deque overflows.  largest-first is what planTasks uses — it fills
the cluster with the heaviest tasks early so stragglers finish first.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, List, Optional

SPLIT_SIZE = "read.split.target-size"
SPLIT_SIZE_DEFAULT = 128 * 1024 * 1024
SPLIT_LOOKBACK = "read.split.planning-lookback"
SPLIT_LOOKBACK_DEFAULT = 10
SPLIT_OPEN_FILE_COST = "read.split.open-file-cost"
SPLIT_OPEN_FILE_COST_DEFAULT = 4 * 1024 * 1024

# formats our readers can split at arbitrary byte ranges; the pure-python
# avro reader consumes whole files, so avro tasks are never split
_SPLITTABLE_FORMATS = {"parquet", "orc"}


class SplitTask:
    """A byte sub-range of a FileScanTask (ref: BaseFileScanTask.SplitScanTask).
    Deletes and residual are inherited from the parent task."""

    def __init__(self, parent, start: int, length: int):
        self.parent = parent
        self.start = start
        self.length = length

    @property
    def file(self):
        return self.parent.file

    @property
    def deletes(self):
        return self.parent.deletes

    @property
    def residual(self):
        return self.parent.residual

    def __repr__(self):
        return (f"SplitTask({self.file.file_path}, "
                f"start={self.start}, length={self.length})")


class CombinedScanTask:
    """A bin of splits planned to run as one unit
    (ref: BaseCombinedScanTask)."""

    def __init__(self, tasks: list):
        self.tasks = list(tasks)

    @property
    def size_bytes(self) -> int:
        return sum(_length(t) for t in self.tasks)

    @property
    def files(self) -> list:
        return [t.file for t in self.tasks]

    def __repr__(self):
        return f"CombinedScanTask({len(self.tasks)} tasks, {self.size_bytes}B)"


def _length(task) -> int:
    if isinstance(task, SplitTask):
        return task.length
    return task.file.file_size_in_bytes


def split_file(task, split_size: int,
               splittable: Iterable = _SPLITTABLE_FORMATS) -> list:
    """Split one FileScanTask at split-size boundaries
    (ref: BaseFileScanTask.FixedSizeSplitScanTaskIterator; we carry no
    row-group split offsets in manifests, so fixed-size ranges are the
    planning granularity — readers snap ranges to row-group boundaries)."""
    if split_size <= 0:
        raise ValueError(f"invalid split size: {split_size}")
    if task.file.file_format not in splittable:
        return [task]
    total = task.file.file_size_in_bytes
    if total <= split_size:
        return [task]
    out, offset = [], 0
    while offset < total:
        length = min(split_size, total - offset)
        out.append(SplitTask(task, offset, length))
        offset += length
    return out


def split_files(tasks: Iterable, split_size: int,
                splittable: Iterable = _SPLITTABLE_FORMATS) -> list:
    """ref: TableScanUtil.splitFiles."""
    out: list = []
    for t in tasks:
        out.extend(split_file(t, split_size, splittable))
    return out


def bin_pack(items: Iterable, target_weight: int, lookback: int,
             weight_func: Callable, largest_bin_first: bool = False
             ) -> Iterator[list]:
    """Lookback bin packing (ref: BinPacking.PackingIterator).  Yields bins
    (lists of items) as they close; an item heavier than the target gets a
    bin of its own."""
    if lookback <= 0:
        raise ValueError(f"bin look-back size must be > 0: {lookback}")
    bins: List[list] = []  # each: [weight_sum, items]
    for item in items:
        w = weight_func(item)
        for b in bins:
            if b[0] + w <= target_weight:
                b[0] += w
                b[1].append(item)
                break
        else:
            bins.append([w, [item]])
            if len(bins) > lookback:
                if largest_bin_first:
                    idx = max(range(len(bins)), key=lambda i: bins[i][0])
                    yield bins.pop(idx)[1]
                else:
                    yield bins.pop(0)[1]
    while bins:
        yield bins.pop(0)[1]


def plan_tasks(tasks: Iterable, split_size: int = SPLIT_SIZE_DEFAULT,
               lookback: int = SPLIT_LOOKBACK_DEFAULT,
               open_file_cost: int = SPLIT_OPEN_FILE_COST_DEFAULT,
               splittable: Iterable = _SPLITTABLE_FORMATS) -> list:
    """ref: TableScanUtil.planTasks — split at split-size boundaries, then
    pack with weight = max(length, open-file cost), largest bin first."""
    splits = split_files(tasks, split_size, splittable)

    def weight(t) -> int:
        return max(_length(t), open_file_cost)

    return [CombinedScanTask(b)
            for b in bin_pack(splits, split_size, lookback, weight,
                              largest_bin_first=True)]


def props_for(properties: dict) -> tuple:
    """(split_size, lookback, open_file_cost) from table properties."""
    return (int(properties.get(SPLIT_SIZE, SPLIT_SIZE_DEFAULT)),
            int(properties.get(SPLIT_LOOKBACK, SPLIT_LOOKBACK_DEFAULT)),
            int(properties.get(SPLIT_OPEN_FILE_COST,
                               SPLIT_OPEN_FILE_COST_DEFAULT)))
