"""PartitionSpec: hidden partitioning (ref: api/.../PartitionSpec.java:314-466).

A spec is a list of (source column, transform) pairs with stable partition
field ids (starting at 1000, matching the reference's
PARTITION_DATA_ID_START).  Partition values never appear in user queries —
the planner projects row predicates into partition space (expressions/projections.py).

At write time each field becomes a derived Spark column named
``_p_<field-name>`` used only for ``partitionBy``; data files keep all source
columns, so reading raw file paths needs no partition-value reconstitution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from linkedin_iceberg_spark.schema import Schema
from linkedin_iceberg_spark.transforms import Transform, parse_transform

PARTITION_DATA_ID_START = 1000
PARTITION_COL_PREFIX = "_p_"


@dataclass(frozen=True)
class PartitionField:
    source_id: int
    field_id: int
    name: str
    transform_str: str
    # bound info (filled by PartitionSpec.bind)
    source_name: Optional[str] = None
    source_type: Optional[str] = None

    def bound_transform(self) -> Transform:
        return parse_transform(self.transform_str, self.source_type)

    @property
    def write_col(self) -> str:
        return PARTITION_COL_PREFIX + self.name

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": self.transform_str,
        }


class PartitionSpec:
    def __init__(self, fields: list, spec_id: int = 0):
        self.fields: list[PartitionField] = list(fields)
        self.spec_id = spec_id

    def is_partitioned(self) -> bool:
        return len(self.fields) > 0

    def bind(self, schema: Schema) -> "PartitionSpec":
        bound = []
        for f in self.fields:
            src = schema.find_field(f.source_id)
            if src is None:
                raise ValueError(f"spec source id {f.source_id} not in schema")
            if not isinstance(src.type, str):
                raise ValueError("cannot partition by non-primitive column")
            bound.append(PartitionField(f.source_id, f.field_id, f.name,
                                        f.transform_str, src.name, src.type))
        return PartitionSpec(bound, self.spec_id)

    def partition_type(self) -> dict:
        """pf.name -> result type str (for partition-value serde)."""
        out = {}
        for f in self.fields:
            out[f.name] = f.bound_transform().result_type(f.source_type or "string")
        return out

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id,
                "fields": [f.to_json() for f in self.fields]}

    @classmethod
    def from_json(cls, j: dict) -> "PartitionSpec":
        return cls([PartitionField(f["source-id"], f["field-id"], f["name"],
                                   f["transform"]) for f in j["fields"]],
                   j.get("spec-id", 0))

    @classmethod
    def unpartitioned(cls) -> "PartitionSpec":
        return cls([], 0)

    @classmethod
    def builder_for(cls, schema: Schema) -> "SpecBuilder":
        return SpecBuilder(schema)

    def __repr__(self):
        inner = ", ".join(f"{f.transform_str}({f.source_name or f.source_id})"
                          f" as {f.name}" for f in self.fields)
        return f"PartitionSpec[{inner}]"

    def __eq__(self, other):
        return isinstance(other, PartitionSpec) and \
            self.to_json() == other.to_json()


class SpecBuilder:
    """ref: PartitionSpec.Builder (api/.../PartitionSpec.java:314-466)."""

    def __init__(self, schema: Schema):
        self._schema = schema
        self._fields: list[PartitionField] = []
        self._next_id = PARTITION_DATA_ID_START - 1
        self._spec_id = 0

    def _fid(self) -> int:
        self._next_id += 1
        return self._next_id

    def _src(self, name: str):
        f = self._schema.find_field(name)
        if f is None:
            raise ValueError(f"no column named {name!r}")
        return f

    def _add(self, name, transform_str, default_suffix):
        src = self._src(name)
        pname = name if default_suffix is None else f"{name}_{default_suffix}"
        self._fields.append(PartitionField(
            src.field_id, self._fid(), pname, transform_str, src.name,
            src.type if isinstance(src.type, str) else None))
        return self

    def identity(self, name):
        return self._add(name, "identity", None)

    def year(self, name):
        return self._add(name, "year", "year")

    def month(self, name):
        return self._add(name, "month", "month")

    def day(self, name):
        return self._add(name, "day", "day")

    def hour(self, name):
        return self._add(name, "hour", "hour")

    def bucket(self, name, n: int):
        return self._add(name, f"bucket[{n}]", "bucket")

    def truncate(self, name, w: int):
        return self._add(name, f"truncate[{w}]", "trunc")

    def always_null(self, name):
        return self._add(name, "void", "null")

    def with_spec_id(self, spec_id: int):
        self._spec_id = spec_id
        return self

    def build(self) -> PartitionSpec:
        return PartitionSpec(self._fields, self._spec_id).bind(self._schema)
