"""ID-based schema model.

The reference evolves schemas by stable integer field IDs so add/rename/drop
never corrupt existing data files (ref: api/.../Schema.java:43-97,
core/.../SchemaUpdate.java:91-284).  Spark's StructType has no field IDs, so we
carry the id<->name mapping in table metadata JSON and project by id at read
time.

Types are represented as strings in Iceberg's JSON single-type notation
("int", "long", "timestamptz", "decimal(38,10)", "struct<...>" handled via
nested NestedField lists for struct / list / map).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Iterator, Optional

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Type mapping (SURVEY.md §1.2).  time/uuid have no Spark equivalent: store
# long-micros / string-36 and flag the logical type in metadata.
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),           # micros since midnight (flagged logical)
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "uuid": T.StringType(),         # 36-char canonical form (flagged logical)
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")
_FIXED_RE = re.compile(r"^fixed\[(\d+)\]$")

# int -> long, float -> double, decimal(p,s) -> decimal(p2>=p,s) are the only
# safe promotions (ref: api/.../types/TypeUtil.java isPromotionAllowed,
# core/.../SchemaUpdate.java:235).
def is_promotion_allowed(src: str, dst: str) -> bool:
    if src == dst:
        return True
    if src == "int" and dst == "long":
        return True
    if src == "float" and dst == "double":
        return True
    m1, m2 = _DECIMAL_RE.match(src or ""), _DECIMAL_RE.match(dst or "")
    if m1 and m2:
        p1, s1 = int(m1.group(1)), int(m1.group(2))
        p2, s2 = int(m2.group(1)), int(m2.group(2))
        return s1 == s2 and p2 >= p1
    return False


def primitive_to_spark(t: str) -> T.DataType:
    if t in _PRIMITIVE_TO_SPARK:
        return _PRIMITIVE_TO_SPARK[t]
    m = _DECIMAL_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if _FIXED_RE.match(t):
        return T.BinaryType()
    raise ValueError(f"unknown primitive type: {t}")


@dataclass(frozen=True)
class NestedField:
    """A named, id'd field (ref: api/.../types/Types.java NestedField:415-526)."""

    field_id: int
    name: str
    type: Any  # str primitive | StructTypeDef | ListTypeDef | MapTypeDef
    required: bool = False
    doc: Optional[str] = None

    def to_json(self) -> dict:
        d = {
            "id": self.field_id,
            "name": self.name,
            "required": self.required,
            "type": _type_to_json(self.type),
        }
        if self.doc:
            d["doc"] = self.doc
        return d


@dataclass(frozen=True)
class StructTypeDef:
    fields: tuple  # tuple[NestedField, ...]


@dataclass(frozen=True)
class ListTypeDef:
    element_id: int
    element: Any
    element_required: bool = False


@dataclass(frozen=True)
class MapTypeDef:
    key_id: int
    key: Any
    value_id: int
    value: Any
    value_required: bool = False


def _type_to_json(t: Any) -> Any:
    if isinstance(t, str):
        return t
    if isinstance(t, StructTypeDef):
        return {"type": "struct", "fields": [f.to_json() for f in t.fields]}
    if isinstance(t, ListTypeDef):
        return {
            "type": "list",
            "element-id": t.element_id,
            "element": _type_to_json(t.element),
            "element-required": t.element_required,
        }
    if isinstance(t, MapTypeDef):
        return {
            "type": "map",
            "key-id": t.key_id,
            "key": _type_to_json(t.key),
            "value-id": t.value_id,
            "value": _type_to_json(t.value),
            "value-required": t.value_required,
        }
    raise TypeError(f"cannot serialize type {t!r}")


def _type_from_json(j: Any) -> Any:
    if isinstance(j, str):
        return j
    k = j["type"]
    if k == "struct":
        return StructTypeDef(tuple(_field_from_json(f) for f in j["fields"]))
    if k == "list":
        return ListTypeDef(j["element-id"], _type_from_json(j["element"]),
                           j.get("element-required", False))
    if k == "map":
        return MapTypeDef(j["key-id"], _type_from_json(j["key"]),
                          j["value-id"], _type_from_json(j["value"]),
                          j.get("value-required", False))
    raise ValueError(f"unknown type json: {j!r}")


def _field_from_json(j: dict) -> NestedField:
    return NestedField(j["id"], j["name"], _type_from_json(j["type"]),
                       j.get("required", False), j.get("doc"))


def type_to_spark(t: Any) -> T.DataType:
    if isinstance(t, str):
        return primitive_to_spark(t)
    if isinstance(t, StructTypeDef):
        return T.StructType([
            T.StructField(f.name, type_to_spark(f.type), not f.required)
            for f in t.fields
        ])
    if isinstance(t, ListTypeDef):
        return T.ArrayType(type_to_spark(t.element), not t.element_required)
    if isinstance(t, MapTypeDef):
        return T.MapType(type_to_spark(t.key), type_to_spark(t.value),
                         not t.value_required)
    raise TypeError(f"cannot convert type {t!r}")


_SPARK_TO_PRIMITIVE = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.DateType(): "date",
    T.TimestampType(): "timestamptz",
    T.TimestampNTZType(): "timestamp",
    T.StringType(): "string",
    T.BinaryType(): "binary",
}


class Schema:
    """Column list with stable field IDs + name<->id lookups
    (ref: api/.../Schema.java:43-97)."""

    def __init__(self, fields: list, schema_id: int = 0):
        self.fields: list[NestedField] = list(fields)
        self.schema_id = schema_id
        self._by_id: dict[int, NestedField] = {}
        self._by_name: dict[str, NestedField] = {}
        self._name_by_id: dict[int, str] = {}
        for f in self._all_fields():
            self._by_id[f.field_id] = f
        for name, f in self._leaf_and_top_names():
            self._by_name[name] = f
            self._name_by_id.setdefault(f.field_id, name)

    # -- traversal ----------------------------------------------------------
    @staticmethod
    def _nested_struct(t) -> Optional[StructTypeDef]:
        """The struct reachable through a (possibly list/map-wrapped) type —
        fields inside array<struct<...>> / map<_, struct<...>> are
        addressable as "parent.child" like the reference's TypeUtil
        indexByName short names."""
        if isinstance(t, ListTypeDef):
            t = t.element
        if isinstance(t, MapTypeDef):
            t = t.value
        return t if isinstance(t, StructTypeDef) else None

    def _all_fields(self) -> Iterator[NestedField]:
        def walk(fields):
            for f in fields:
                yield f
                st = self._nested_struct(f.type)
                if st is not None:
                    yield from walk(st.fields)
        yield from walk(self.fields)

    def _leaf_and_top_names(self):
        def walk(fields, prefix):
            for f in fields:
                full = f"{prefix}{f.name}"
                yield full, f
                st = self._nested_struct(f.type)
                if st is not None:
                    yield from walk(st.fields, full + ".")
        yield from walk(self.fields, "")

    # -- lookups ------------------------------------------------------------
    def find_field(self, name_or_id) -> Optional[NestedField]:
        if isinstance(name_or_id, int):
            return self._by_id.get(name_or_id)
        return self._by_name.get(name_or_id)

    def find_type(self, name_or_id) -> Any:
        f = self.find_field(name_or_id)
        return f.type if f else None

    def name_for_id(self, field_id: int) -> Optional[str]:
        return self._name_by_id.get(field_id)

    def id_for_name(self, name: str) -> Optional[int]:
        f = self._by_name.get(name)
        return f.field_id if f else None

    def column_names(self) -> list[str]:
        return [f.name for f in self.fields]

    @property
    def highest_field_id(self) -> int:
        return max((f.field_id for f in self._all_fields()), default=0)

    # -- projection (ref: api/.../Schema.java:260-320 select) ---------------
    def select(self, names: list[str]) -> "Schema":
        keep = set(names)
        return Schema([f for f in self.fields if f.name in keep], self.schema_id)

    # -- conversion ---------------------------------------------------------
    def to_spark(self) -> T.StructType:
        return T.StructType([
            T.StructField(f.name, type_to_spark(f.type), not f.required)
            for f in self.fields
        ])

    def to_json(self) -> dict:
        return {
            "type": "struct",
            "schema-id": self.schema_id,
            "fields": [f.to_json() for f in self.fields],
        }

    @classmethod
    def from_json(cls, j: dict) -> "Schema":
        return cls([_field_from_json(f) for f in j["fields"]],
                   j.get("schema-id", 0))

    @classmethod
    def from_spark(cls, st: T.StructType, start_id: int = 1) -> "Schema":
        """Assign fresh sequential field ids to a Spark schema (import path,
        analogous to name-mapping assignment in core/.../mapping/MappingUtil.java)."""
        counter = [start_id - 1]

        def next_id():
            counter[0] += 1
            return counter[0]

        def conv(dt: T.DataType) -> Any:
            if isinstance(dt, T.StructType):
                return StructTypeDef(tuple(
                    NestedField(next_id(), f.name, conv(f.dataType), not f.nullable)
                    for f in dt.fields
                ))
            if isinstance(dt, T.ArrayType):
                eid = next_id()
                return ListTypeDef(eid, conv(dt.elementType), not dt.containsNull)
            if isinstance(dt, T.MapType):
                kid, vid = next_id(), next_id()
                return MapTypeDef(kid, conv(dt.keyType), vid, conv(dt.valueType),
                                  not dt.valueContainsNull)
            if isinstance(dt, T.DecimalType):
                return f"decimal({dt.precision},{dt.scale})"
            prim = _SPARK_TO_PRIMITIVE.get(dt)
            if prim is None:
                raise ValueError(f"unsupported Spark type: {dt}")
            return prim

        fields = [
            NestedField(next_id(), f.name, conv(f.dataType), not f.nullable)
            for f in st.fields
        ]
        return cls(fields)

    def __repr__(self):
        return f"Schema({json.dumps(self.to_json(), indent=None)})"

    def __eq__(self, other):
        return isinstance(other, Schema) and self.to_json() == other.to_json()
