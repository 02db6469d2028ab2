"""Core expression algebra.

16 operations + negate/flip parity with the reference
(ref: api/.../expressions/Expression.java:28-102, Expressions.java:37-250,
Binder.java:35-93, RewriteNot.java).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from decimal import Decimal
from enum import Enum
from typing import Any, Optional


class Operation(Enum):
    TRUE = "true"
    FALSE = "false"
    IS_NULL = "is_null"
    NOT_NULL = "not_null"
    IS_NAN = "is_nan"
    NOT_NAN = "not_nan"
    LT = "lt"
    LT_EQ = "lt_eq"
    GT = "gt"
    GT_EQ = "gt_eq"
    EQ = "eq"
    NOT_EQ = "not_eq"
    IN = "in"
    NOT_IN = "not_in"
    NOT = "not"
    AND = "and"
    OR = "or"
    STARTS_WITH = "starts_with"


# ref: Expression.java negate()
_NEGATIONS = {
    Operation.TRUE: Operation.FALSE,
    Operation.FALSE: Operation.TRUE,
    Operation.IS_NULL: Operation.NOT_NULL,
    Operation.NOT_NULL: Operation.IS_NULL,
    Operation.IS_NAN: Operation.NOT_NAN,
    Operation.NOT_NAN: Operation.IS_NAN,
    Operation.LT: Operation.GT_EQ,
    Operation.LT_EQ: Operation.GT,
    Operation.GT: Operation.LT_EQ,
    Operation.GT_EQ: Operation.LT,
    Operation.EQ: Operation.NOT_EQ,
    Operation.NOT_EQ: Operation.EQ,
    Operation.IN: Operation.NOT_IN,
    Operation.NOT_IN: Operation.IN,
}


def negate_op(op: Operation) -> Operation:
    if op not in _NEGATIONS:
        raise ValueError(f"cannot negate {op}")
    return _NEGATIONS[op]


class Expression:
    """Base expression node."""

    __slots__ = ()


class AlwaysTrue(Expression):
    __slots__ = ()

    def __repr__(self):
        return "true"

    def __eq__(self, o):
        return isinstance(o, AlwaysTrue)

    def __hash__(self):
        return hash("true")


class AlwaysFalse(Expression):
    __slots__ = ()

    def __repr__(self):
        return "false"

    def __eq__(self, o):
        return isinstance(o, AlwaysFalse)

    def __hash__(self):
        return hash("false")


_TRUE = AlwaysTrue()
_FALSE = AlwaysFalse()


@dataclass(frozen=True)
class And(Expression):
    left: Expression
    right: Expression

    def __repr__(self):
        return f"({self.left} and {self.right})"


@dataclass(frozen=True)
class Or(Expression):
    left: Expression
    right: Expression

    def __repr__(self):
        return f"({self.left} or {self.right})"


@dataclass(frozen=True)
class Not(Expression):
    child: Expression

    def __repr__(self):
        return f"(not {self.child})"


@dataclass(frozen=True)
class Reference:
    """Unbound named term."""

    name: str

    def __repr__(self):
        return self.name


@dataclass(frozen=True)
class BoundReference:
    """Term bound to a schema field."""

    field_id: int
    name: str
    type: str  # primitive type string

    def __repr__(self):
        return f"{self.name}#{self.field_id}"


@dataclass(frozen=True)
class TransformTerm:
    """A transform applied to a reference, usable inside predicates
    (ref: Expressions.java transform factory methods :198-250)."""

    transform: Any  # Transform instance (transforms module)
    ref: Any        # Reference | BoundReference

    def __repr__(self):
        return f"{self.transform}({self.ref})"


@dataclass(frozen=True)
class Predicate(Expression):
    op: Operation
    term: Any                      # Reference | BoundReference | TransformTerm
    literal: Any = None            # single value ops
    literals: Optional[frozenset] = None  # IN / NOT_IN

    def __repr__(self):
        if self.op in (Operation.IN, Operation.NOT_IN):
            return f"{self.term} {self.op.value} {sorted(self.literals, key=repr)}"
        if self.literal is None:
            return f"{self.term} {self.op.value}"
        return f"{self.term} {self.op.value} {self.literal!r}"


# ---------------------------------------------------------------------------
# Factories (ref: Expressions.java:37-250)
# ---------------------------------------------------------------------------

def always_true() -> Expression:
    return _TRUE


def always_false() -> Expression:
    return _FALSE


def and_(left: Expression, right: Expression, *rest: Expression) -> Expression:
    # short-circuit folding (ref: Expressions.java:44-52)
    result = left
    for nxt in (right, *rest):
        if isinstance(result, AlwaysFalse) or isinstance(nxt, AlwaysFalse):
            return _FALSE
        if isinstance(result, AlwaysTrue):
            result = nxt
        elif isinstance(nxt, AlwaysTrue):
            pass
        else:
            result = And(result, nxt)
    return result


def or_(left: Expression, right: Expression, *rest: Expression) -> Expression:
    result = left
    for nxt in (right, *rest):
        if isinstance(result, AlwaysTrue) or isinstance(nxt, AlwaysTrue):
            return _TRUE
        if isinstance(result, AlwaysFalse):
            result = nxt
        elif isinstance(nxt, AlwaysFalse):
            pass
        else:
            result = Or(result, nxt)
    return result


def not_(child: Expression) -> Expression:
    if isinstance(child, AlwaysTrue):
        return _FALSE
    if isinstance(child, AlwaysFalse):
        return _TRUE
    if isinstance(child, Not):
        return child.child
    return Not(child)


def _term(t) -> Any:
    return t if isinstance(t, (Reference, BoundReference, TransformTerm)) else Reference(t)


def is_null(t) -> Predicate:
    return Predicate(Operation.IS_NULL, _term(t))


def not_null(t) -> Predicate:
    return Predicate(Operation.NOT_NULL, _term(t))


def is_nan(t) -> Predicate:
    return Predicate(Operation.IS_NAN, _term(t))


def not_nan(t) -> Predicate:
    return Predicate(Operation.NOT_NAN, _term(t))


def lt(t, v) -> Predicate:
    return Predicate(Operation.LT, _term(t), v)


def lt_eq(t, v) -> Predicate:
    return Predicate(Operation.LT_EQ, _term(t), v)


def gt(t, v) -> Predicate:
    return Predicate(Operation.GT, _term(t), v)


def gt_eq(t, v) -> Predicate:
    return Predicate(Operation.GT_EQ, _term(t), v)


def eq(t, v) -> Predicate:
    return Predicate(Operation.EQ, _term(t), v)


def not_eq(t, v) -> Predicate:
    return Predicate(Operation.NOT_EQ, _term(t), v)


def in_(t, values) -> Expression:
    vals = frozenset(values)
    if not vals:
        return _FALSE
    if len(vals) == 1:
        return eq(t, next(iter(vals)))
    return Predicate(Operation.IN, _term(t), literals=vals)


def not_in(t, values) -> Expression:
    vals = frozenset(values)
    if not vals:
        return _TRUE
    if len(vals) == 1:
        return not_eq(t, next(iter(vals)))
    return Predicate(Operation.NOT_IN, _term(t), literals=vals)


def starts_with(t, prefix: str) -> Predicate:
    return Predicate(Operation.STARTS_WITH, _term(t), prefix)


# transform-term factories — late import to avoid cycle
def bucket(name, n: int) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import BucketTransform
    return TransformTerm(BucketTransform(n), _term(name))


def truncate(name, w: int) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import TruncateTransform
    return TransformTerm(TruncateTransform(w), _term(name))


def year(name) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import YearTransform
    return TransformTerm(YearTransform(), _term(name))


def month(name) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import MonthTransform
    return TransformTerm(MonthTransform(), _term(name))


def day(name) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import DayTransform
    return TransformTerm(DayTransform(), _term(name))


def hour(name) -> TransformTerm:
    from linkedin_iceberg_spark.transforms import HourTransform
    return TransformTerm(HourTransform(), _term(name))


# ---------------------------------------------------------------------------
# NOT rewriting via De Morgan (ref: RewriteNot.java)
# ---------------------------------------------------------------------------

def rewrite_not(expr: Expression) -> Expression:
    if isinstance(expr, Not):
        child = expr.child
        if isinstance(child, And):
            return or_(rewrite_not(Not(child.left)), rewrite_not(Not(child.right)))
        if isinstance(child, Or):
            return and_(rewrite_not(Not(child.left)), rewrite_not(Not(child.right)))
        if isinstance(child, Not):
            return rewrite_not(child.child)
        if isinstance(child, Predicate):
            return Predicate(negate_op(child.op), child.term, child.literal,
                             child.literals)
        if isinstance(child, AlwaysTrue):
            return _FALSE
        if isinstance(child, AlwaysFalse):
            return _TRUE
        return Not(rewrite_not(child))
    if isinstance(expr, And):
        return and_(rewrite_not(expr.left), rewrite_not(expr.right))
    if isinstance(expr, Or):
        return or_(rewrite_not(expr.left), rewrite_not(expr.right))
    return expr


# ---------------------------------------------------------------------------
# Binding: name -> field id + literal coercion (ref: Binder.java:35-93,
# UnboundPredicate.bind with literal conversion per Literals.java:179-206)
# ---------------------------------------------------------------------------

_INTEGRAL = {"int", "long"}
_FLOATING = {"float", "double"}


def coerce_literal(value: Any, type_str: str) -> Any:
    """Convert a Python literal to the column's type domain."""
    if value is None:
        return None
    if type_str in _INTEGRAL:
        if isinstance(value, bool):
            raise TypeError(f"cannot coerce bool to {type_str}")
        if isinstance(value, float):
            if value.is_integer():
                return int(value)
            raise TypeError(f"cannot coerce non-integral {value} to {type_str}")
        return int(value)
    if type_str in _FLOATING:
        return float(value)
    if type_str == "boolean":
        return bool(value)
    if type_str == "string":
        return str(value)
    if type_str == "date":
        if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
            return value
        if isinstance(value, _dt.datetime):
            return value.date()
        if isinstance(value, str):
            return _dt.date.fromisoformat(value)
        if isinstance(value, int):
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=value)
        raise TypeError(f"cannot coerce {value!r} to date")
    if type_str in ("timestamp", "timestamptz"):
        if isinstance(value, _dt.datetime):
            return value
        if isinstance(value, _dt.date):
            return _dt.datetime(value.year, value.month, value.day)
        if isinstance(value, str):
            return _dt.datetime.fromisoformat(value)
        if isinstance(value, (int, float)):
            # epoch micros, matching the reference's internal representation
            return (_dt.datetime(1970, 1, 1)
                    + _dt.timedelta(microseconds=int(value)))
        raise TypeError(f"cannot coerce {value!r} to timestamp")
    if type_str.startswith("decimal"):
        d = value if isinstance(value, Decimal) else Decimal(str(value))
        # rescale to the column's declared scale so downstream unscaled-value
        # consumers (bucket hash, truncate) see the stored representation —
        # e.g. 12.5 must become 12.50 (unscaled 1250) for decimal(_, 2).
        # Rescaling that would LOSE digits is rejected, matching the
        # reference Literal.to() (ref: api/.../expressions/Literals.java).
        import re as _re
        m = _re.match(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", type_str)
        if m:
            from decimal import Inexact, localcontext
            scale = int(m.group(1))
            try:
                with localcontext() as ctx:
                    ctx.traps[Inexact] = True
                    d = d.quantize(Decimal(1).scaleb(-scale))
            except Inexact:
                raise TypeError(
                    f"cannot coerce {value!r} to {type_str} without "
                    "precision loss")
        return d
    if type_str in ("binary",) or type_str.startswith("fixed"):
        return bytes(value)
    if type_str == "uuid":
        return str(value)
    if type_str == "time":
        return int(value)
    return value


_INT_MAX, _INT_MIN = 2**31 - 1, -(2**31)
_LONG_MAX, _LONG_MIN = 2**63 - 1, -(2**63)
_FLOAT_MAX = 3.4028234663852886e38


def _range_sentinel(value, lit_type: str):
    """ABOVE_MAX / BELOW_MIN detection for literals outside the column
    type's domain (ref: api/.../expressions/Literals.java:179-206)."""
    if isinstance(value, bool) or value is None:
        return None
    if lit_type == "int" and isinstance(value, (int, float)):
        if value > _INT_MAX:
            return "above"
        if value < _INT_MIN:
            return "below"
    elif lit_type == "long" and isinstance(value, (int, float)):
        if value > _LONG_MAX:
            return "above"
        if value < _LONG_MIN:
            return "below"
    elif lit_type == "float" and isinstance(value, (int, float)):
        if value > _FLOAT_MAX:
            return "above"
        if value < -_FLOAT_MAX:
            return "below"
    return None


def _fold_sentinel(op: Operation, sentinel: str) -> Expression:
    """Fold a comparison against an out-of-range literal to a constant
    (the reference folds these to alwaysTrue/alwaysFalse at bind time)."""
    if sentinel == "above":
        if op in (Operation.LT, Operation.LT_EQ, Operation.NOT_EQ):
            return always_true()
        return always_false()  # GT, GT_EQ, EQ
    # below
    if op in (Operation.GT, Operation.GT_EQ, Operation.NOT_EQ):
        return always_true()
    return always_false()  # LT, LT_EQ, EQ


def bind(schema, expr: Expression, case_sensitive: bool = True) -> Expression:
    """Bind references to schema fields and coerce literals.

    Missing columns raise ValueError (matching Binder's ValidationException).
    """
    expr = rewrite_not(expr)

    def bind_term(term):
        if isinstance(term, BoundReference):
            return term
        if isinstance(term, TransformTerm):
            return TransformTerm(term.transform, bind_term(term.ref))
        name = term.name
        f = schema.find_field(name)
        if f is None and not case_sensitive:
            for cand, fld in schema._by_name.items():
                if cand.lower() == name.lower():
                    f = fld
                    break
        if f is None:
            raise ValueError(f"cannot bind reference: no field named {name!r}")
        t = f.type
        if not isinstance(t, str):
            raise ValueError(f"cannot bind predicate on non-primitive column {name!r}")
        return BoundReference(f.field_id, name, t)

    def walk(e: Expression) -> Expression:
        if isinstance(e, (AlwaysTrue, AlwaysFalse)):
            return e
        if isinstance(e, And):
            return and_(walk(e.left), walk(e.right))
        if isinstance(e, Or):
            return or_(walk(e.left), walk(e.right))
        if isinstance(e, Not):
            return not_(walk(e.child))
        if isinstance(e, Predicate):
            term = bind_term(e.term)
            base = term.ref if isinstance(term, TransformTerm) else term
            col_type = base.type
            if isinstance(term, TransformTerm):
                # literal lives in the *result* space of the transform for
                # direct transform predicates? No — predicates on transform
                # terms take source-space literals in IN/EQ after apply; the
                # reference applies the transform at bind time for term preds.
                # We keep source-space and apply transform in evaluators.
                res_type = term.transform.result_type(col_type)
                lit_type = res_type
            else:
                lit_type = col_type
            if e.op in (Operation.IS_NULL, Operation.NOT_NULL,
                        Operation.IS_NAN, Operation.NOT_NAN):
                if e.op in (Operation.IS_NAN, Operation.NOT_NAN) and \
                        col_type not in _FLOATING:
                    raise ValueError(f"is_nan on non-floating column {base.name}")
                return Predicate(e.op, term)
            if e.op in (Operation.IN, Operation.NOT_IN):
                in_range = [v for v in e.literals
                            if _range_sentinel(v, lit_type) is None]
                if not in_range:
                    return always_false() if e.op == Operation.IN \
                        else always_true()
                lits = frozenset(coerce_literal(v, lit_type)
                                 for v in in_range)
                return Predicate(e.op, term, literals=lits)
            if e.op == Operation.STARTS_WITH:
                if lit_type != "string":
                    raise ValueError("starts_with requires a string column")
                return Predicate(e.op, term, str(e.literal))
            sentinel = _range_sentinel(e.literal, lit_type)
            if sentinel is not None:
                return _fold_sentinel(e.op, sentinel)
            return Predicate(e.op, term, coerce_literal(e.literal, lit_type))
        raise TypeError(f"cannot bind {e!r}")

    return walk(expr)


# ---------------------------------------------------------------------------
# Conversion to the Spark data plane
# ---------------------------------------------------------------------------

def to_spark_column(expr: Expression):
    """Convert to a pyspark Column (inverse of the reference's
    SparkFilters.convert, ref: spark3/.../SparkFilters.java:87-195)."""
    from pyspark.sql import functions as F

    def term_col(term):
        if isinstance(term, TransformTerm):
            return term.transform.to_spark_column(term_col(term.ref))
        return F.col(term.name)

    def walk(e):
        if isinstance(e, AlwaysTrue):
            return F.lit(True)
        if isinstance(e, AlwaysFalse):
            return F.lit(False)
        if isinstance(e, And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, Not):
            return ~walk(e.child)
        if isinstance(e, Predicate):
            c = term_col(e.term)
            op = e.op
            if op == Operation.IS_NULL:
                return c.isNull()
            if op == Operation.NOT_NULL:
                return c.isNotNull()
            if op == Operation.IS_NAN:
                return F.isnan(c)
            if op == Operation.NOT_NAN:
                return ~F.isnan(c)
            if op == Operation.LT:
                return c < F.lit(e.literal)
            if op == Operation.LT_EQ:
                return c <= F.lit(e.literal)
            if op == Operation.GT:
                return c > F.lit(e.literal)
            if op == Operation.GT_EQ:
                return c >= F.lit(e.literal)
            if op == Operation.EQ:
                return c == F.lit(e.literal)
            if op == Operation.NOT_EQ:
                return c != F.lit(e.literal)
            if op == Operation.IN:
                return c.isin(*e.literals)
            if op == Operation.NOT_IN:
                return ~c.isin(*e.literals)
            if op == Operation.STARTS_WITH:
                return c.startswith(e.literal)
        raise TypeError(f"cannot convert {e!r}")

    return walk(expr)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    return repr(v)


def to_sql(expr: Expression) -> str:
    """Render as an ANSI SQL boolean expression (for oracle parity checks;
    analogous to the python reference's expression string rendering)."""
    def term_sql(term):
        if isinstance(term, TransformTerm):
            raise ValueError("transform terms have no direct SQL form")
        return term.name

    def walk(e):
        if isinstance(e, AlwaysTrue):
            return "TRUE"
        if isinstance(e, AlwaysFalse):
            return "FALSE"
        if isinstance(e, And):
            return f"({walk(e.left)} AND {walk(e.right)})"
        if isinstance(e, Or):
            return f"({walk(e.left)} OR {walk(e.right)})"
        if isinstance(e, Not):
            return f"(NOT {walk(e.child)})"
        if isinstance(e, Predicate):
            t = term_sql(e.term)
            op = e.op
            if op == Operation.IS_NULL:
                return f"{t} IS NULL"
            if op == Operation.NOT_NULL:
                return f"{t} IS NOT NULL"
            if op == Operation.IS_NAN:
                return f"isnan({t})"
            if op == Operation.NOT_NAN:
                return f"NOT isnan({t})"
            sym = {Operation.LT: "<", Operation.LT_EQ: "<=", Operation.GT: ">",
                   Operation.GT_EQ: ">=", Operation.EQ: "=",
                   Operation.NOT_EQ: "<>"}.get(op)
            if sym:
                return f"{t} {sym} {_sql_lit(e.literal)}"
            if op == Operation.IN:
                vals = ", ".join(sorted(_sql_lit(v) for v in e.literals))
                return f"{t} IN ({vals})"
            if op == Operation.NOT_IN:
                vals = ", ".join(sorted(_sql_lit(v) for v in e.literals))
                return f"{t} NOT IN ({vals})"
            if op == Operation.STARTS_WITH:
                pref = e.literal.replace("'", "''")
                return f"{t} LIKE '{pref}%'"
        raise TypeError(f"cannot render {e!r}")

    return walk(expr)
