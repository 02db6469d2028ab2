"""Residual expression evaluation (ref: api/.../expressions/ResidualEvaluator.java:52-118).

Given a partition spec, a bound row filter, and one file's partition tuple,
compute the *residual*: the smallest expression that still has to run
against the file's rows.  Parts of the filter that the partition tuple
already guarantees fold to ALWAYS_TRUE; parts it rules out fold to
ALWAYS_FALSE; the rest survive verbatim.

The folding rule per predicate (ResidualEvaluator's visitor, re-expressed
through our projection machinery):

  * if the STRICT projection of the predicate evaluates true for this
    partition, every row in the file matches -> ALWAYS_TRUE (the scan can
    skip filtering entirely — the common case for identity-partitioned
    columns);
  * else if the INCLUSIVE projection evaluates false, no row can match ->
    ALWAYS_FALSE (plan_files already pruned these, so this mostly shows up
    inside OR branches);
  * else the predicate itself is the residual.

AND/OR recombine with constant folding (and_/or_ short-circuit), so e.g.
``month = 3 AND amount > 10`` on a month-partitioned file in month 3
residualizes to just ``amount > 10``.
"""

from __future__ import annotations

from linkedin_iceberg_spark.expressions.evaluator import Evaluator
from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    Expression,
    Not,
    Or,
    Predicate,
    always_false,
    always_true,
    and_,
    or_,
    rewrite_not,
)
from linkedin_iceberg_spark.expressions.projections import _project_pred


def residual_of(spec, expr: Expression, partition: dict) -> Expression:
    """Residual of bound ``expr`` for a file with the given partition tuple
    (a ``{spec_field_name: value}`` dict, as stored in manifest entries)."""
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
        assert isinstance(e, Predicate), f"cannot residualize {e!r}"
        strict = _project_pred(spec, e, strict=True)
        if strict is not None and Evaluator(strict).eval(partition):
            return always_true()
        incl = _project_pred(spec, e, strict=False)
        if incl is not None and not Evaluator(incl).eval(partition):
            return always_false()
        return e

    return walk(expr)


class ResidualEvaluator:
    """Residuals cached by partition tuple — files in the same partition
    share a residual, so a scan over many files computes each once
    (mirrors ResidualEvaluator's per-partition caching)."""

    def __init__(self, spec, expr: Expression):
        self.spec = spec
        self.expr = expr
        self._cache: dict = {}

    def residual_for(self, partition: dict) -> Expression:
        key = tuple(sorted(partition.items(), key=lambda kv: kv[0]))
        try:
            return self._cache[key]
        except (KeyError, TypeError):
            r = residual_of(self.spec, self.expr, partition)
            try:
                self._cache[key] = r
            except TypeError:
                pass  # unhashable partition value: skip caching
            return r
