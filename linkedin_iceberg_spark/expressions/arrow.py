"""Expression -> pyarrow.dataset filter expression, for the local read path
(ref: the reference's generic reads evaluate residuals row-by-row in
Evaluator; arrow expressions are the vectorized equivalent here).

Only plain column predicates convert; a residual that references a
transform term (e.g. ``eq(bucket(id, 16), 3)``) has no direct arrow
equivalent and raises — the local reader falls back to the row Evaluator
for those.
"""

from __future__ import annotations

from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    Not,
    Operation,
    Or,
    Predicate,
    TransformTerm,
)


def to_arrow_expression(expr):
    import pyarrow.compute as pc

    def term_field(term):
        if isinstance(term, TransformTerm):
            raise NotImplementedError(
                f"transform term {term!r} has no arrow equivalent")
        return pc.field(term.name)

    def walk(e):
        if isinstance(e, AlwaysTrue):
            return pc.scalar(True)
        if isinstance(e, AlwaysFalse):
            return pc.scalar(False)
        if isinstance(e, And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, Not):
            return ~walk(e.child)
        assert isinstance(e, Predicate), f"cannot convert {e!r}"
        f = term_field(e.term)
        op = e.op
        if op == Operation.IS_NULL:
            return f.is_null()
        if op == Operation.NOT_NULL:
            return ~f.is_null()
        if op == Operation.IS_NAN:
            return pc.is_nan(f)
        if op == Operation.NOT_NAN:
            return ~pc.is_nan(f)
        if op == Operation.LT:
            return f < e.literal
        if op == Operation.LT_EQ:
            return f <= e.literal
        if op == Operation.GT:
            return f > e.literal
        if op == Operation.GT_EQ:
            return f >= e.literal
        if op == Operation.EQ:
            return f == e.literal
        if op == Operation.NOT_EQ:
            return f != e.literal
        if op == Operation.IN:
            return f.isin(list(e.literals))
        if op == Operation.NOT_IN:
            return ~f.isin(list(e.literals))
        if op == Operation.STARTS_WITH:
            return pc.starts_with(f, pattern=e.literal)
        raise TypeError(f"cannot convert {e!r}")

    return walk(expr)
