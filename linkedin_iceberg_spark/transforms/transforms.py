"""Partition transforms (ref: api/.../transforms/).

Each transform provides:
  apply(value)           — partition value for a row value (Python, driver side)
  to_spark_column(col)   — the same function as a JVM-side pyspark Column
                           (whole-stage-codegen'd write path; the Python apply
                           is only for planning / tests)
  project(name, pred)    — inclusive projection: partition predicate that MAY
                           match (ref: Projections.java:73-110, ProjectionUtil)
  project_strict(...)    — partition predicate that GUARANTEES all rows match
                           (ref: Projections.java:113-146)
  result_type(src)       — transform output type

Time transforms produce *ordinals since epoch* (year->years, month->months,
day->days, hour->hours; ref: transforms/Dates.java:34-58, Timestamps.java:50),
not calendar values — pruning math composes only with ordinals.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Optional

from linkedin_iceberg_spark.expressions.expressions import (
    Operation,
    Predicate,
    Reference,
    always_true,
    eq,
    gt,
    gt_eq,
    in_,
    lt,
    lt_eq,
    not_eq,
    not_in,
    starts_with,
)
from linkedin_iceberg_spark.transforms.bucket_hash import (
    bucket_hash_bytes,
    to_hash_bytes,
)

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_DT_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

_TIME_TYPES = {"date", "timestamp", "timestamptz"}


def _micros(value) -> int:
    """Value -> epoch micros (timestamps) preserving pre-1970 floor behavior."""
    if isinstance(value, _dt.datetime):
        delta = (value - _EPOCH_DT_UTC) if value.tzinfo else (value - _EPOCH_DT)
        return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 \
            + delta.microseconds
    return int(value)


def _days(value) -> int:
    if isinstance(value, _dt.datetime):
        value = value.date() if value.tzinfo is None else \
            value.astimezone(_dt.timezone.utc).date()
    if isinstance(value, _dt.date):
        return (value - _EPOCH_DATE).days
    return int(value)


class Transform:
    """SPI mirror of api/.../transforms/Transform.java:43-77."""

    name: str = "?"

    def can_transform(self, type_str: str) -> bool:
        raise NotImplementedError

    def result_type(self, src_type: str) -> str:
        raise NotImplementedError

    def apply(self, value):
        raise NotImplementedError

    def to_spark_column(self, col):
        raise NotImplementedError

    def project(self, name: str, pred: Predicate) -> Optional[Any]:
        """Inclusive projection; None = cannot project (caller treats as
        always-true for inclusive, always-false for strict)."""
        return None

    def project_strict(self, name: str, pred: Predicate) -> Optional[Any]:
        return None

    def __repr__(self):
        return self.name

    def __eq__(self, other):
        return repr(self) == repr(other)

    def __hash__(self):
        return hash(repr(self))


def _with_source_type(t: "Transform", src_type: str) -> "Transform":
    """Bucket/identity need the source type to hash/serialize correctly."""
    return t


class IdentityTransform(Transform):
    name = "identity"

    def __init__(self, src_type: str = "string"):
        self.src_type = src_type

    def can_transform(self, type_str: str) -> bool:
        return True

    def result_type(self, src_type: str) -> str:
        return src_type

    def apply(self, value):
        return value

    def to_spark_column(self, col):
        return col

    def project(self, name, pred):
        # identity: the row predicate IS the partition predicate
        return Predicate(pred.op, Reference(name), pred.literal, pred.literals)

    def project_strict(self, name, pred):
        return Predicate(pred.op, Reference(name), pred.literal, pred.literals)


class VoidTransform(Transform):
    """alwaysNull (ref: transforms/VoidTransform.java)."""

    name = "void"

    def can_transform(self, type_str):
        return True

    def result_type(self, src_type):
        return src_type

    def apply(self, value):
        return None

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        return F.lit(None)


class BucketTransform(Transform):
    """bucket[N]: murmur3_32 of the type's byte recipe, mod N
    (ref: api/.../transforms/Bucket.java:155-311)."""

    _BUCKETABLE = {"int", "long", "date", "time", "timestamp", "timestamptz",
                   "string", "binary", "uuid"}

    def __init__(self, n: int, src_type: str = None):
        self.n = n
        self.src_type = src_type
        self.name = f"bucket[{n}]"

    def can_transform(self, type_str):
        return (type_str in self._BUCKETABLE or type_str.startswith("decimal")
                or type_str.startswith("fixed"))

    def result_type(self, src_type):
        return "int"

    def apply(self, value):
        if value is None:
            return None
        if self.src_type is None:
            raise ValueError("bucket transform not bound to a source type")
        return (bucket_hash_bytes(value, self.src_type) & 0x7FFFFFFF) % self.n

    def to_spark_column(self, col):
        """JVM-side murmur3 bucket.  Spark's F.hash is murmur3_x86_32 but with
        Spark's own byte recipes (int hashes 4 bytes, not Iceberg's 8), so we
        build Iceberg's recipe explicitly before hashing where cheap, else fall
        back to a pandas UDF for exact parity."""
        from pyspark.sql import functions as F
        from linkedin_iceberg_spark.functions.bucket_udf import bucket_udf
        return bucket_udf(self.src_type, self.n)(col)

    def project(self, name, pred):
        # only EQ/IN project through bucket (ref: Bucket.java project:117-139)
        if pred.op == Operation.EQ:
            return eq(name, self.apply(pred.literal))
        if pred.op == Operation.IN:
            return in_(name, {self.apply(v) for v in pred.literals})
        if pred.op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(pred.op, Reference(name))
        return None

    def project_strict(self, name, pred):
        if pred.op == Operation.NOT_EQ:
            return not_eq(name, self.apply(pred.literal))
        if pred.op == Operation.NOT_IN:
            return not_in(name, {self.apply(v) for v in pred.literals})
        if pred.op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(pred.op, Reference(name))
        return None


def _truncate_int(value: int, width: int) -> int:
    # floor-mod truncation (ref: transforms/Truncate.java TruncateInteger)
    return value - (((value % width) + width) % width)


class TruncateTransform(Transform):
    """truncate[W] (ref: api/.../transforms/Truncate.java)."""

    def __init__(self, w: int, src_type: str = None):
        self.w = w
        self.src_type = src_type
        self.name = f"truncate[{w}]"

    def can_transform(self, type_str):
        return type_str in ("int", "long", "string", "binary") or \
            type_str.startswith("decimal")

    def result_type(self, src_type):
        return src_type

    def apply(self, value):
        if value is None:
            return None
        if isinstance(value, str):
            return value[: self.w]
        if isinstance(value, bytes):
            return value[: self.w]
        if isinstance(value, int):
            return _truncate_int(value, self.w)
        from decimal import Decimal
        if isinstance(value, Decimal):
            # unscaled floor-mod (ref: TruncateDecimal)
            exp = value.as_tuple().exponent
            unscaled = int(value.scaleb(-exp))
            return Decimal(_truncate_int(unscaled, self.w)).scaleb(exp)
        raise TypeError(f"cannot truncate {value!r}")

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        if self.src_type == "string":
            return F.substring(col, 1, self.w)
        if self.src_type in ("int", "long"):
            w = F.lit(self.w)
            return col - (((col % w) + w) % w)
        if self.src_type == "binary":
            return F.substring(col, 1, self.w)
        from linkedin_iceberg_spark.functions.bucket_udf import truncate_udf
        return truncate_udf(self.src_type, self.w)(col)

    # -- projections (ref: Truncate.java:100-149 + ProjectionUtil) ----------
    def _is_string(self):
        return self.src_type == "string"

    def project(self, name, pred):
        op, v = pred.op, pred.literal
        if op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(op, Reference(name))
        if self._is_string():
            if op == Operation.STARTS_WITH:
                if len(v) < self.w:
                    return starts_with(name, v)
                return eq(name, v[: self.w])
            if op == Operation.EQ:
                return eq(name, self.apply(v))
            if op == Operation.IN:
                return in_(name, {self.apply(x) for x in pred.literals})
            if op in (Operation.LT, Operation.LT_EQ):
                return lt_eq(name, self.apply(v))
            if op in (Operation.GT, Operation.GT_EQ):
                return gt_eq(name, self.apply(v))
            return None
        # integral / decimal (ref: ProjectionUtil.truncateInteger)
        if op == Operation.LT:
            return lt_eq(name, self.apply(v - self._unit(v)))
        if op == Operation.LT_EQ:
            return lt_eq(name, self.apply(v))
        if op == Operation.GT:
            return gt_eq(name, self.apply(v + self._unit(v)))
        if op == Operation.GT_EQ:
            return gt_eq(name, self.apply(v))
        if op == Operation.EQ:
            return eq(name, self.apply(v))
        if op == Operation.IN:
            return in_(name, {self.apply(x) for x in pred.literals})
        return None

    def project_strict(self, name, pred):
        op, v = pred.op, pred.literal
        if op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(op, Reference(name))
        if self._is_string():
            if op == Operation.STARTS_WITH and len(v) < self.w:
                return starts_with(name, v)
            if op == Operation.STARTS_WITH and len(v) == self.w:
                return eq(name, v)
            if op == Operation.NOT_EQ:
                return None  # partition != trunc(v) doesn't exclude equality rows? it does:
                # rows in partitions != trunc(v) are guaranteed != v
            return None
        # ref: ProjectionUtil.truncateIntegerStrict
        if op == Operation.LT:
            return lt(name, self.apply(v))
        if op == Operation.LT_EQ:
            return lt(name, self.apply(v + self._unit(v)))
        if op == Operation.GT:
            return gt(name, self.apply(v))
        if op == Operation.GT_EQ:
            return gt(name, self.apply(v - self._unit(v)))
        if op == Operation.NOT_EQ:
            return not_eq(name, self.apply(v))
        if op == Operation.NOT_IN:
            return not_in(name, {self.apply(x) for x in pred.literals})
        return None

    def _unit(self, v):
        from decimal import Decimal
        if isinstance(v, Decimal):
            return Decimal(1).scaleb(v.as_tuple().exponent)
        return 1


class _TimeTransform(Transform):
    """Shared machinery for year/month/day/hour ordinal transforms.

    Projections follow ProjectionUtil.truncateLong(Strict) applied to the
    ordinal function (monotone non-decreasing), with the ±1 adjustments done
    in the *source* space at micro/day granularity."""

    granularity_micros: int = 0  # 0 => calendar-based (year/month)

    def can_transform(self, type_str):
        return type_str in _TIME_TYPES

    def result_type(self, src_type):
        return "int"

    def apply(self, value):
        raise NotImplementedError

    def _apply_micros_adjacent(self, v, direction: int):
        """apply(v ± smallest unit) in source space."""
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return self.apply(v + _dt.timedelta(days=direction))
        if isinstance(v, _dt.datetime):
            return self.apply(v + _dt.timedelta(microseconds=direction))
        return self.apply(int(v) + direction)

    def project(self, name, pred):
        op, v = pred.op, pred.literal
        if op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(op, Reference(name))
        if op == Operation.LT:
            return lt_eq(name, self._apply_micros_adjacent(v, -1))
        if op == Operation.LT_EQ:
            return lt_eq(name, self.apply(v))
        if op == Operation.GT:
            return gt_eq(name, self._apply_micros_adjacent(v, +1))
        if op == Operation.GT_EQ:
            return gt_eq(name, self.apply(v))
        if op == Operation.EQ:
            return eq(name, self.apply(v))
        if op == Operation.IN:
            return in_(name, {self.apply(x) for x in pred.literals})
        return None

    def project_strict(self, name, pred):
        op, v = pred.op, pred.literal
        if op in (Operation.IS_NULL, Operation.NOT_NULL):
            return Predicate(op, Reference(name))
        if op == Operation.LT:
            return lt(name, self.apply(v))
        if op == Operation.LT_EQ:
            return lt(name, self._apply_micros_adjacent(v, +1))
        if op == Operation.GT:
            return gt(name, self.apply(v))
        if op == Operation.GT_EQ:
            return gt(name, self._apply_micros_adjacent(v, -1))
        if op == Operation.NOT_EQ:
            return None  # a partition may still mix matching ordinals
        return None


class YearTransform(_TimeTransform):
    name = "year"

    def apply(self, value):
        if value is None:
            return None
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(_dt.timezone.utc)
            return value.year - 1970
        if isinstance(value, _dt.date):
            return value.year - 1970
        raise TypeError(f"year transform needs date/timestamp, got {value!r}")

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        return (F.year(col) - F.lit(1970)).cast("int")


class MonthTransform(_TimeTransform):
    name = "month"

    def apply(self, value):
        if value is None:
            return None
        if isinstance(value, _dt.datetime) and value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc)
        if isinstance(value, _dt.date):
            return (value.year - 1970) * 12 + (value.month - 1)
        raise TypeError(f"month transform needs date/timestamp, got {value!r}")

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        return ((F.year(col) - F.lit(1970)) * F.lit(12)
                + F.month(col) - F.lit(1)).cast("int")


class DayTransform(_TimeTransform):
    name = "day"
    granularity_micros = 86_400_000_000

    def apply(self, value):
        if value is None:
            return None
        if isinstance(value, _dt.datetime):
            return _micros(value) // 86_400_000_000
        if isinstance(value, _dt.date):
            return (value - _EPOCH_DATE).days
        return int(value)

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        return F.datediff(F.to_date(col), F.lit("1970-01-01")).cast("int")


class HourTransform(_TimeTransform):
    name = "hour"
    granularity_micros = 3_600_000_000

    def apply(self, value):
        if value is None:
            return None
        if isinstance(value, _dt.datetime):
            return _micros(value) // 3_600_000_000
        raise TypeError(f"hour transform needs timestamp, got {value!r}")

    def to_spark_column(self, col):
        from pyspark.sql import functions as F
        return F.floor(F.unix_timestamp(col) / F.lit(3600)).cast("int")


class UnknownTransform(Transform):
    """Forward-compat placeholder (ref: transforms/UnknownTransform.java):
    cannot apply or project; scans treat it as non-pruning."""

    def __init__(self, name: str):
        self.name = name

    def can_transform(self, type_str):
        return True

    def result_type(self, src_type):
        return "string"

    def apply(self, value):
        raise NotImplementedError(f"unknown transform {self.name!r}")

    def to_spark_column(self, col):
        raise NotImplementedError(f"unknown transform {self.name!r}")


def parse_transform(s: str, src_type: str = None) -> Transform:
    """Parse a transform string as serialized in metadata JSON
    (ref: core/.../PartitionSpecParser.java)."""
    s = s.strip()
    if s == "identity":
        return IdentityTransform(src_type or "string")
    if s == "void":
        return VoidTransform()
    if s == "year":
        return YearTransform()
    if s == "month":
        return MonthTransform()
    if s == "day":
        return DayTransform()
    if s == "hour":
        return HourTransform()
    if s.startswith("bucket[") and s.endswith("]"):
        return BucketTransform(int(s[7:-1]), src_type)
    if s.startswith("truncate[") and s.endswith("]"):
        return TruncateTransform(int(s[9:-1]), src_type)
    return UnknownTransform(s)
