"""Schema evolution by field id (ref: api/.../UpdateSchema.java:47-349,
core/.../SchemaUpdate.java:91-284).

Changes are staged on a builder and applied in one metadata commit.  Old data
files are never touched: reads project by field id
(scan.read_files_as_current_schema)."""

from __future__ import annotations

import dataclasses

from linkedin_iceberg_spark.schema import (
    NestedField,
    Schema,
    is_promotion_allowed,
)


class SchemaUpdate:
    def __init__(self, table):
        self.table = table
        self._schema = table.schema
        self._adds: list = []
        self._deletes: set = set()
        self._renames: dict = {}       # field id -> new name
        self._promotes: dict = {}      # field id -> new type str
        self._requireds: dict = {}     # field id -> bool
        self._docs: dict = {}
        self._moves: list = []         # (field_id, position, other_id|None)
        self._allow_incompatible = False

    def allow_incompatible_changes(self) -> "SchemaUpdate":
        self._allow_incompatible = True
        return self

    def _resolve(self, name: str) -> NestedField:
        f = self._schema.find_field(name)
        if f is None:
            raise ValueError(f"no column named {name!r}")
        return f

    def add_column(self, name: str, type_str: str, doc=None,
                   required: bool = False) -> "SchemaUpdate":
        if self._schema.find_field(name) is not None:
            raise ValueError(f"column {name!r} already exists")
        if required and not self._allow_incompatible:
            raise ValueError("adding a required column is incompatible "
                             "(use allow_incompatible_changes)")
        self._adds.append((name, type_str, doc, required))
        return self

    def delete_column(self, name: str) -> "SchemaUpdate":
        self._deletes.add(self._resolve(name).field_id)
        return self

    def rename_column(self, name: str, new_name: str) -> "SchemaUpdate":
        self._renames[self._resolve(name).field_id] = new_name
        return self

    def update_column(self, name: str, type_str: str) -> "SchemaUpdate":
        f = self._resolve(name)
        if not isinstance(f.type, str):
            raise ValueError("cannot promote non-primitive column")
        if not is_promotion_allowed(f.type, type_str):
            raise ValueError(f"cannot promote {f.type} -> {type_str}")
        self._promotes[f.field_id] = type_str
        return self

    def update_column_doc(self, name: str, doc: str) -> "SchemaUpdate":
        self._docs[self._resolve(name).field_id] = doc
        return self

    def make_column_optional(self, name: str) -> "SchemaUpdate":
        self._requireds[self._resolve(name).field_id] = False
        return self

    def require_column(self, name: str) -> "SchemaUpdate":
        if not self._allow_incompatible:
            raise ValueError("making a column required is incompatible")
        self._requireds[self._resolve(name).field_id] = True
        return self

    def move_first(self, name: str) -> "SchemaUpdate":
        self._moves.append((self._resolve(name).field_id, "first", None))
        return self

    def move_before(self, name: str, other: str) -> "SchemaUpdate":
        self._moves.append((self._resolve(name).field_id, "before",
                            self._resolve(other).field_id))
        return self

    def move_after(self, name: str, other: str) -> "SchemaUpdate":
        self._moves.append((self._resolve(name).field_id, "after",
                            self._resolve(other).field_id))
        return self

    def apply(self) -> Schema:
        """Build the new schema without committing."""
        next_id = self.table.metadata.last_column_id

        fields = []
        for f in self._schema.fields:
            if f.field_id in self._deletes:
                continue
            name = self._renames.get(f.field_id, f.name)
            t = self._promotes.get(f.field_id, f.type)
            required = self._requireds.get(f.field_id, f.required)
            doc = self._docs.get(f.field_id, f.doc)
            fields.append(NestedField(f.field_id, name, t, required, doc))

        for (name, type_str, doc, required) in self._adds:
            next_id += 1
            fields.append(NestedField(next_id, name, type_str, required, doc))

        for (fid, pos, other) in self._moves:
            idx = next(i for i, f in enumerate(fields) if f.field_id == fid)
            f = fields.pop(idx)
            if pos == "first":
                fields.insert(0, f)
            else:
                oidx = next(i for i, g in enumerate(fields)
                            if g.field_id == other)
                fields.insert(oidx if pos == "before" else oidx + 1, f)

        new_schema_id = max(s.schema_id for s in self.table.metadata.schemas) + 1
        return Schema(fields, new_schema_id)

    def commit(self):
        new_schema = self.apply()

        def do(base):
            md = dataclasses.replace(base)
            # re-apply against refreshed base for id allocation correctness
            md.schemas = [*base.schemas, new_schema]
            md.current_schema_id = new_schema.schema_id
            md.last_column_id = max(base.last_column_id,
                                    new_schema.highest_field_id)
            return md

        return self.table._commit_metadata_edit(do)
