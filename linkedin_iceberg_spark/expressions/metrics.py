"""File-metrics evaluators: decide from per-file column stats whether a file
can contain matching rows (inclusive) or provably contains ONLY matching rows
(strict).

ref: api/.../expressions/InclusiveMetricsEvaluator.java:48-344 and
StrictMetricsEvaluator.java:48-387.  The reference evaluates these per
DataFile during scan planning; we evaluate them against rows of our `files`
metadata table (driver-side pandas for small metadata, Spark DF filter at
scale — see catalog/scan.py).

Stats contract (a FileStats row):
  value_counts[id], null_counts[id], nan_counts[id]  — optional dict[int,int]
  lower_bounds[id], upper_bounds[id]                 — optional dict[int,native]
String bounds may be truncated to 16 chars at write (metrics mode
truncate(16), ref: core/.../MetricsModes.java:34-96): lower bounds truncate
down (safe), upper bounds truncate UP (increment last char — see
catalog/stats.py), so inclusive range checks stay correct.
"""

from __future__ import annotations

import math

from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    Expression,
    Not,
    Operation,
    Or,
    Predicate,
    TransformTerm,
    rewrite_not,
)

ROWS_MIGHT_MATCH = True
ROWS_CANNOT_MATCH = False
ROWS_MUST_MATCH = True
ROWS_MIGHT_NOT_MATCH = False


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


class _FileView:
    """Normalized accessor over a files-metadata row (dict-like)."""

    def __init__(self, entry: dict):
        self.record_count = entry.get("record_count") or 0
        self.value_counts = entry.get("value_counts") or {}
        self.null_counts = entry.get("null_value_counts") or {}
        self.nan_counts = entry.get("nan_value_counts") or {}
        self.lower = entry.get("lower_bounds") or {}
        self.upper = entry.get("upper_bounds") or {}

    def may_contain_null(self, fid) -> bool:
        if fid not in self.null_counts:
            return True
        return (self.null_counts.get(fid) or 0) > 0

    def all_null(self, fid) -> bool:
        vc, nc = self.value_counts.get(fid), self.null_counts.get(fid)
        return vc is not None and nc is not None and vc == nc

    def no_nulls(self, fid) -> bool:
        return self.null_counts.get(fid) == 0

    def bounds(self, fid):
        return self.lower.get(fid), self.upper.get(fid)


class InclusiveMetricsEvaluator:
    """True ⇒ the file MIGHT contain matching rows; False ⇒ provably not."""

    def __init__(self, expr: Expression):
        self.expr = rewrite_not(expr)

    def eval(self, entry: dict) -> bool:
        f = _FileView(entry)
        if f.record_count == 0:
            return ROWS_CANNOT_MATCH
        return self._eval(self.expr, f)

    def _eval(self, e, f) -> bool:
        if isinstance(e, AlwaysTrue):
            return ROWS_MIGHT_MATCH
        if isinstance(e, AlwaysFalse):
            return ROWS_CANNOT_MATCH
        if isinstance(e, And):
            return self._eval(e.left, f) and self._eval(e.right, f)
        if isinstance(e, Or):
            return self._eval(e.left, f) or self._eval(e.right, f)
        if isinstance(e, Not):
            # NOT should have been rewritten away; be conservative
            return ROWS_MIGHT_MATCH
        assert isinstance(e, Predicate)
        if isinstance(e.term, TransformTerm):
            return ROWS_MIGHT_MATCH  # stats are in source space only
        fid = e.term.field_id
        op = e.op
        if op == Operation.IS_NULL:
            return f.may_contain_null(fid)
        if op == Operation.NOT_NULL:
            if f.all_null(fid):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.IS_NAN:
            nc = f.nan_counts.get(fid)
            if nc == 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.NOT_NAN:
            nc, vc = f.nan_counts.get(fid), f.value_counts.get(fid)
            if nc is not None and vc is not None and nc == vc:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        # value comparisons: all-null column can't match
        if f.all_null(fid):
            return ROWS_CANNOT_MATCH
        lo, hi = f.bounds(fid)
        v = e.literal
        if op == Operation.LT:
            if lo is not None and not _is_nan(lo) and lo >= v:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.LT_EQ:
            if lo is not None and not _is_nan(lo) and lo > v:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.GT:
            if hi is not None and not _is_nan(hi) and hi <= v:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.GT_EQ:
            if hi is not None and not _is_nan(hi) and hi < v:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.EQ:
            if lo is not None and not _is_nan(lo) and lo > v:
                return ROWS_CANNOT_MATCH
            if hi is not None and not _is_nan(hi) and hi < v:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == Operation.NOT_EQ:
            return ROWS_MIGHT_MATCH
        if op == Operation.IN:
            # ref: InclusiveMetricsEvaluator.in_ with IN_PREDICATE_LIMIT=200
            lits = e.literals
            if len(lits) > 200:
                return ROWS_MIGHT_MATCH
            if lo is not None and not _is_nan(lo):
                lits = {x for x in lits if x >= lo}
            if hi is not None and not _is_nan(hi):
                lits = {x for x in lits if x <= hi}
            return ROWS_MIGHT_MATCH if lits else ROWS_CANNOT_MATCH
        if op == Operation.NOT_IN:
            return ROWS_MIGHT_MATCH
        if op == Operation.STARTS_WITH:
            prefix = e.literal
            if lo is not None and isinstance(lo, str):
                cmp_lo = lo[: len(prefix)]
                if cmp_lo > prefix:
                    return ROWS_CANNOT_MATCH
            if hi is not None and isinstance(hi, str):
                cmp_hi = hi[: len(prefix)]
                if cmp_hi < prefix:
                    return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        return ROWS_MIGHT_MATCH


class StrictMetricsEvaluator:
    """True ⇒ EVERY row in the file matches (used by delete/overwrite to drop
    whole files without rewriting them)."""

    def __init__(self, expr: Expression):
        self.expr = rewrite_not(expr)

    def eval(self, entry: dict) -> bool:
        f = _FileView(entry)
        return self._eval(self.expr, f)

    def _eval(self, e, f) -> bool:
        if isinstance(e, AlwaysTrue):
            return ROWS_MUST_MATCH
        if isinstance(e, AlwaysFalse):
            return ROWS_MIGHT_NOT_MATCH
        if isinstance(e, And):
            return self._eval(e.left, f) and self._eval(e.right, f)
        if isinstance(e, Or):
            return self._eval(e.left, f) or self._eval(e.right, f)
        if isinstance(e, Not):
            return ROWS_MIGHT_NOT_MATCH
        assert isinstance(e, Predicate)
        if isinstance(e.term, TransformTerm):
            return ROWS_MIGHT_NOT_MATCH
        fid = e.term.field_id
        op = e.op
        if op == Operation.IS_NULL:
            return f.all_null(fid)
        if op == Operation.NOT_NULL:
            return f.no_nulls(fid)
        if op == Operation.IS_NAN:
            nc, vc = f.nan_counts.get(fid), f.value_counts.get(fid)
            return nc is not None and vc is not None and nc == vc
        if op == Operation.NOT_NAN:
            return f.nan_counts.get(fid) == 0
        # value predicates require no nulls to hold for every row
        if not f.no_nulls(fid):
            return ROWS_MIGHT_NOT_MATCH
        lo, hi = f.bounds(fid)
        v = e.literal
        if lo is None or hi is None or _is_nan(lo) or _is_nan(hi):
            return ROWS_MIGHT_NOT_MATCH
        if op == Operation.LT:
            return hi < v
        if op == Operation.LT_EQ:
            return hi <= v
        if op == Operation.GT:
            return lo > v
        if op == Operation.GT_EQ:
            return lo >= v
        if op == Operation.EQ:
            return lo == v and hi == v
        if op == Operation.NOT_EQ:
            return v < lo or v > hi
        if op == Operation.IN:
            return lo == hi and lo in e.literals
        if op == Operation.NOT_IN:
            return all(x < lo or x > hi for x in e.literals)
        if op == Operation.STARTS_WITH:
            # every row starts with prefix iff both bounds do and share it
            p = e.literal
            return (isinstance(lo, str) and isinstance(hi, str)
                    and lo.startswith(p) and hi.startswith(p))
        return ROWS_MIGHT_NOT_MATCH
