"""Read plain (non-engine) Hive-layout directories through the Table/
TableScan API — the reference's legacy Hive adapter, engine-free.

ref: hive-metastore/.../legacy/LegacyHiveTable.java:52-118 (read-only
Table facade over a Hive table: snapshots/history are unsupported),
LegacyHiveTableScan.java:48-92 (planFiles from partition metadata +
directory listing, residuals attached per partition), and
HiveExpressions.java:34-52 (simplifyPartitionFilter: drop non-partition
predicates — inclusive — before asking the metastore for partitions).

Differences, by design:
- The reference asks the Hive metastore for matching partitions with a
  rewritten filter string (HiveExpressions.toPartitionFilterString) and
  then lists each partition directory (FileSystemUtils).  We have no
  metastore: the directory tree IS the partition listing, so the
  partition-only filter is evaluated directly with our row Evaluator on
  the decoded ``key=value`` tuples — which also means no operator
  restrictions (IN / startsWith / NOT need no rewriting).
- Scale: listing is driver-side ``os.walk``, the same role the
  reference's metastore call + per-partition FS listing plays; cost is
  O(partitions + files), metadata-sized, never O(rows).  At very large
  partition counts the walk is parallelizable per top-level directory,
  but the reference itself lists partitions serially per scan.
"""

from __future__ import annotations

import os
import urllib.parse
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from linkedin_iceberg_spark.catalog.manifests import DataFile
from linkedin_iceberg_spark.catalog.scan import FileScanTask
from linkedin_iceberg_spark.catalog.serde import decode_value
from linkedin_iceberg_spark.catalog.spec import PartitionSpec
from linkedin_iceberg_spark.events import ScanEvent, notify_all
from linkedin_iceberg_spark.expressions import (
    Expression,
    always_true,
    bind,
    rewrite_not,
    to_spark_column,
)
from linkedin_iceberg_spark.expressions.evaluator import Evaluator
from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BoundReference,
    Not,
    Or,
    Predicate,
    Reference,
    TransformTerm,
    and_,
    or_,
)
from linkedin_iceberg_spark.expressions.residuals import residual_of
from linkedin_iceberg_spark.schema import Schema

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _term_name(term) -> str:
    if isinstance(term, TransformTerm):
        return _term_name(term.ref)
    if isinstance(term, (Reference, BoundReference)):
        return term.name
    return str(term)


def simplify_partition_filter(expr: Expression, part_cols: set) -> Expression:
    """Keep only predicates on partition columns; anything else becomes
    AlwaysTrue (inclusive — kept directories are a superset).

    ref: HiveExpressions.java:49-58 RemoveNonPartitionPredicates +
    RewriteUnsupportedOperators.  NOT is pushed to the leaves first
    (rewrite_not) so replacing a non-partition leaf with TRUE can never
    flip under a negation.  The reference's operator rewrites (IN → ORs,
    remove startsWith) exist only because the Hive metastore filter
    language is restricted; our Evaluator runs every operator natively,
    so no rewriting is needed.
    """
    expr = rewrite_not(expr)

    def walk(e):
        if isinstance(e, (AlwaysTrue, AlwaysFalse)):
            return e
        if isinstance(e, And):
            return and_(walk(e.left), walk(e.right))
        if isinstance(e, Or):
            return or_(walk(e.left), walk(e.right))
        if isinstance(e, Not):  # pragma: no cover - rewrite_not removed these
            raise AssertionError("rewrite_not left a NOT node")
        assert isinstance(e, Predicate), f"cannot simplify {e!r}"
        return e if _term_name(e.term) in part_cols else always_true()

    return walk(expr)


class LegacyHiveTable:
    """Read-only Table facade over a plain Hive-partitioned directory.

    No engine metadata is created or required: schema and partition
    columns are discovered from the directory layout + file footers via
    Spark's partition discovery, exactly once at construction.

    ref: LegacyHiveTable.java:52-56 (read-only), :108-118 (snapshot APIs
    unsupported on legacy tables).
    """

    def __init__(self, spark: SparkSession, location: str,
                 fmt: str = "parquet"):
        self.spark = spark
        self.location = os.path.abspath(location)
        self.fmt = fmt
        df = spark.read.format(fmt).load(self.location)
        self.spark_schema = df.schema
        self.schema = Schema.from_spark(df.schema)
        self._part_cols = self._discover_partition_cols()
        if self._part_cols:
            b = PartitionSpec.builder_for(self.schema)
            for c in self._part_cols:
                b.identity(c)
            self.spec = b.build()
        else:
            self.spec = PartitionSpec.unpartitioned()

    # -- Table surface ----------------------------------------------------
    def new_scan(self) -> "LegacyHiveTableScan":
        return LegacyHiveTableScan(self)

    def scan(self, row_filter: Optional[Expression] = None,
             selected: Optional[list] = None) -> "LegacyHiveTableScan":
        s = self.new_scan()
        if row_filter is not None:
            s = s.filter(row_filter)
        if selected is not None:
            s = s.select(selected)
        return s

    def _unsupported(self, what: str):
        raise NotImplementedError(
            f"{what} is not supported on legacy (non-engine) Hive tables "
            "(ref: LegacyHiveTable.java:108-118)")

    def current_snapshot(self):
        self._unsupported("current_snapshot")

    def snapshots(self):
        self._unsupported("snapshots")

    def history(self):
        self._unsupported("history")

    def append(self, *_a, **_k):
        self._unsupported("append (legacy tables are read-only)")

    # -- discovery --------------------------------------------------------
    def _discover_partition_cols(self) -> list:
        """Partition columns in directory order, from the first data file's
        relative path (all files of a valid Hive layout agree)."""
        ext = ".orc" if self.fmt == "orc" else f".{self.fmt}"
        for root, dirs, files in os.walk(self.location):
            dirs.sort()
            for fn in sorted(files):
                if fn.startswith((".", "_")) or not fn.endswith(ext):
                    continue
                rel = os.path.relpath(root, self.location)
                if rel == ".":
                    return []
                return [c.split("=", 1)[0] for c in rel.split(os.sep)
                        if "=" in c]
        raise ValueError(f"no *{ext} files under {self.location!r}")


class LegacyHiveTableScan:
    """ref: LegacyHiveTableScan.java:48-92 — planFiles = partition pruning
    via the simplified filter, then per-partition file listing, residual
    attached to every task."""

    def __init__(self, table: LegacyHiveTable,
                 row_filter: Optional[Expression] = None,
                 selected: Optional[list] = None):
        self.table = table
        self.row_filter = row_filter if row_filter is not None \
            else always_true()
        self.selected = selected

    def filter(self, expr: Expression) -> "LegacyHiveTableScan":
        return LegacyHiveTableScan(self.table,
                                   and_(self.row_filter, expr),
                                   self.selected)

    def select(self, cols: list) -> "LegacyHiveTableScan":
        return LegacyHiveTableScan(self.table, self.row_filter, list(cols))

    # -- planning ---------------------------------------------------------
    def _bound_filter(self) -> Expression:
        return bind(self.table.schema, self.row_filter)

    def plan_files(self) -> list:
        """List data files under partition directories that can match the
        filter.  Inclusive on partition predicates (never drops a matching
        file); each task carries the per-partition residual so readers
        skip row-level filtering when the partition tuple already decides
        the predicate (ref: LegacyHiveTableScan.java:79-86)."""
        t = self.table
        notify_all(ScanEvent(f"legacy:{t.location}", -1,
                             self.row_filter, self.selected))
        bound = self._bound_filter()
        part_filter = simplify_partition_filter(
            bound, set(t._part_cols)) if t._part_cols else always_true()
        pf_eval = Evaluator(part_filter)
        types = {pf.source_name: pf.source_type for pf in t.spec.fields}

        ext = ".orc" if t.fmt == "orc" else f".{t.fmt}"
        tasks = []
        for root, dirs, files in os.walk(t.location):
            rel = os.path.relpath(root, t.location)
            partition = {}
            if rel != ".":
                comps = [c for c in rel.split(os.sep) if "=" in c]
                for comp in comps:
                    k, v = comp.split("=", 1)
                    if k not in types:
                        continue
                    v = urllib.parse.unquote(v)
                    partition[k] = None if v == _HIVE_NULL \
                        else decode_value(v, types[k])
                # prune the walk as soon as a partition level fails: with
                # the still-unset deeper columns absent from the tuple,
                # Evaluator treats them as null — only safe to prune when
                # every partition column so far is set, so check only at
                # the leaf unless all columns are present
                if len(partition) == len(t._part_cols) and \
                        not pf_eval.eval(partition):
                    dirs[:] = []
                    continue
            if not files:
                continue
            if len(partition) != len(t._part_cols):
                # Data files above the leaf partition level are not valid
                # Hive layout.  Silently skipping them would return partial
                # results on a malformed/mixed-layout directory — silent
                # row loss is worse than a layout error, so raise.
                stray = [fn for fn in sorted(files)
                         if fn.endswith(ext)
                         and not fn.startswith((".", "_"))]
                if stray:
                    raise ValueError(
                        f"malformed Hive layout under {t.location}: found "
                        f"{len(stray)} {t.fmt} data file(s) at non-leaf "
                        f"partition level {rel!r} (e.g. {stray[0]!r}); "
                        f"expected data only under all "
                        f"{len(t._part_cols)} partition directories "
                        f"{t._part_cols}")
                continue
            # (the complete-tuple eval already pruned failing leaves above)
            residual = residual_of(t.spec, bound, partition) \
                if t._part_cols else bound
            if isinstance(residual, AlwaysFalse):
                continue
            for fn in sorted(files):
                if fn.startswith((".", "_")) or not fn.endswith(ext):
                    continue
                fpath = os.path.join(root, fn)
                df_ = DataFile(
                    file_path=fpath,
                    file_format=t.fmt,
                    partition=dict(partition),
                    record_count=0,  # unknown: no engine metadata exists
                    file_size_in_bytes=os.path.getsize(fpath),
                )
                tasks.append(FileScanTask(df_, residual=residual))
        return tasks

    # -- execution --------------------------------------------------------
    def to_df(self) -> DataFrame:
        t = self.table
        tasks = self.plan_files()
        if not tasks:
            out = t.spark.createDataFrame([], t.spark_schema)
        else:
            paths = [task.file.file_path for task in tasks]
            reader = t.spark.read.format(t.fmt)
            if t._part_cols:
                reader = reader.option("basePath", t.location)
            out = reader.load(paths)
            # row-level filter only when some partition leaves a residual:
            # a pure partition predicate is fully decided by pruning
            # (ref: ResidualEvaluator.java:52-118 — AlwaysTrue residual
            # means no row filter needed)
            if any(not isinstance(task.residual, AlwaysTrue)
                   for task in tasks):
                out = out.filter(to_spark_column(self._bound_filter()))
        if self.selected:
            out = out.select(*self.selected)
        return out

    def to_pandas(self):
        return self.to_df().toPandas()
