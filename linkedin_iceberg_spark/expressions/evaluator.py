"""Row evaluator for bound expressions (ref: api/.../expressions/Evaluator.java:36-47).

Used driver-side only: partition-tuple evaluation during scan planning and
tests.  Data-plane filtering always goes through ``to_spark_column``.
"""

from __future__ import annotations

import math

from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BoundReference,
    Expression,
    Not,
    Operation,
    Or,
    Predicate,
    Reference,
    TransformTerm,
)


class Evaluator:
    def __init__(self, expr: Expression):
        self.expr = expr

    def eval(self, row: dict) -> bool:
        return self._eval(self.expr, row)

    def _value(self, term, row):
        if isinstance(term, TransformTerm):
            v = self._value(term.ref, row)
            return None if v is None else term.transform.apply(v)
        name = term.name if isinstance(term, (Reference, BoundReference)) else term
        return row.get(name)

    def _eval(self, e, row) -> bool:
        if isinstance(e, AlwaysTrue):
            return True
        if isinstance(e, AlwaysFalse):
            return False
        if isinstance(e, And):
            return self._eval(e.left, row) and self._eval(e.right, row)
        if isinstance(e, Or):
            return self._eval(e.left, row) or self._eval(e.right, row)
        if isinstance(e, Not):
            return not self._eval(e.child, row)
        if isinstance(e, Predicate):
            v = self._value(e.term, row)
            op = e.op
            if op == Operation.IS_NULL:
                return v is None
            if op == Operation.NOT_NULL:
                return v is not None
            if op == Operation.IS_NAN:
                return v is not None and isinstance(v, float) and math.isnan(v)
            if op == Operation.NOT_NAN:
                return not (v is not None and isinstance(v, float) and math.isnan(v))
            if v is None:
                return False  # SQL three-valued logic: NULL never matches
            if op == Operation.LT:
                return v < e.literal
            if op == Operation.LT_EQ:
                return v <= e.literal
            if op == Operation.GT:
                return v > e.literal
            if op == Operation.GT_EQ:
                return v >= e.literal
            if op == Operation.EQ:
                return v == e.literal
            if op == Operation.NOT_EQ:
                return v != e.literal
            if op == Operation.IN:
                return v in e.literals
            if op == Operation.NOT_IN:
                return v not in e.literals
            if op == Operation.STARTS_WITH:
                return isinstance(v, str) and v.startswith(e.literal)
        raise TypeError(f"cannot evaluate {e!r}")
