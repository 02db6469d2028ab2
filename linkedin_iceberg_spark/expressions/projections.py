"""Predicate projection into partition space (ref: api/.../expressions/Projections.java).

inclusive_projection(spec, expr): partition predicate that is true for any
partition that MAY contain matching rows — used for pruning (S3/S4).
strict_projection(spec, expr): partition predicate true only for partitions
where EVERY row matches — used by delete/overwrite validation (P8/W3).

The projected predicates reference partition *column names* (spec field
names); evaluate them against partition tuples with Evaluator, against
manifest partition summaries with the summary evaluator in catalog/scan.py,
or convert to a Spark Column to filter a files metadata DataFrame.
"""

from __future__ import annotations

from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BoundReference,
    Expression,
    Not,
    Or,
    Predicate,
    TransformTerm,
    always_false,
    always_true,
    and_,
    eq,
    in_,
    not_eq,
    not_in,
    or_,
    rewrite_not,
    Operation,
    Reference,
)


def _project_pred(spec, pred: Predicate, strict: bool):
    """Project one bound predicate through every spec field sourced from the
    predicate's column; AND the results (each is a valid constraint)."""
    if isinstance(pred.term, TransformTerm):
        # predicate directly on a transform term, e.g. eq(bucket(id,16), 3):
        # if the spec has a matching field, it IS a partition predicate
        base = pred.term.ref
        for pf in spec.fields:
            if (pf.source_name == base.name
                    and repr(pf.transform) == repr(pred.term.transform)):
                return Predicate(pred.op, Reference(pf.name), pred.literal,
                                 pred.literals)
        return None
    name = pred.term.name
    results = []
    for pf in spec.fields:
        if pf.source_name != name:
            continue
        t = pf.bound_transform()
        proj = t.project_strict(pf.name, pred) if strict else t.project(pf.name, pred)
        if proj is not None:
            results.append(proj)
    if not results:
        return None
    out = results[0]
    for r in results[1:]:
        out = and_(out, r) if not strict else or_(out, r)
    return out


def _project(spec, expr: Expression, strict: bool) -> Expression:
    expr = rewrite_not(expr)

    def walk(e):
        if isinstance(e, (AlwaysTrue, AlwaysFalse)):
            return e
        if isinstance(e, And):
            return and_(walk(e.left), walk(e.right))
        if isinstance(e, Or):
            return or_(walk(e.left), walk(e.right))
        if isinstance(e, Not):
            raise AssertionError("rewrite_not left a NOT node")
        if isinstance(e, Predicate):
            p = _project_pred(spec, e, strict)
            if p is None:
                # inclusive: unprojectable => may match any partition
                # strict: unprojectable => can't guarantee
                return always_true() if not strict else always_false()
            return p
        raise TypeError(f"cannot project {e!r}")

    return walk(expr)


def inclusive_projection(spec, expr: Expression) -> Expression:
    return _project(spec, expr, strict=False)


def strict_projection(spec, expr: Expression) -> Expression:
    return _project(spec, expr, strict=True)
