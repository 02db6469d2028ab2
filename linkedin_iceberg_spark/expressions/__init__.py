"""Expression / predicate algebra (ref: api/.../expressions/).

Pure Python — no Spark dependency.  Used by the planner to prune manifests and
data files from *our* metadata tables (Catalyst can't: the stats live in our
metadata, not Spark's).  Converts losslessly to a pyspark Column for the data
plane via ``to_spark_column``.
"""

from linkedin_iceberg_spark.expressions.expressions import (
    Operation,
    Expression,
    AlwaysTrue,
    AlwaysFalse,
    And,
    Or,
    Not,
    Predicate,
    Reference,
    BoundReference,
    TransformTerm,
    always_true,
    always_false,
    and_,
    or_,
    not_,
    is_null,
    not_null,
    is_nan,
    not_nan,
    lt,
    lt_eq,
    gt,
    gt_eq,
    eq,
    not_eq,
    in_,
    not_in,
    starts_with,
    bucket,
    truncate,
    year,
    month,
    day,
    hour,
    rewrite_not,
    bind,
    to_spark_column,
    to_sql,
)
from linkedin_iceberg_spark.expressions.evaluator import Evaluator
from linkedin_iceberg_spark.expressions.metrics import (
    InclusiveMetricsEvaluator,
    StrictMetricsEvaluator,
)
from linkedin_iceberg_spark.expressions.projections import (
    inclusive_projection,
    strict_projection,
)

__all__ = [
    "Operation", "Expression", "AlwaysTrue", "AlwaysFalse", "And", "Or", "Not",
    "Predicate", "Reference", "BoundReference", "TransformTerm",
    "always_true", "always_false", "and_", "or_", "not_", "is_null", "not_null",
    "is_nan", "not_nan",
    "lt", "lt_eq", "gt", "gt_eq", "eq", "not_eq", "in_", "not_in", "starts_with",
    "bucket", "truncate", "year", "month", "day", "hour",
    "rewrite_not", "bind", "to_spark_column", "to_sql",
    "Evaluator", "InclusiveMetricsEvaluator", "StrictMetricsEvaluator",
    "inclusive_projection", "strict_projection",
]
