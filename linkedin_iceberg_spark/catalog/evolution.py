"""Schema evolution by field id (ref: api/.../UpdateSchema.java:47-349,
core/.../SchemaUpdate.java:91-284).

Changes are staged on a builder and applied in one metadata commit.  Old data
files are never touched: reads project by field id
(scan.read_files_as_current_schema).

Nested-field evolution: every operation addresses fields by DOTTED path
("info.note"), and delete/rename/promote/optional/doc apply at any depth —
the rebuild walks struct fields and struct-typed list/map elements
recursively, exactly like the reference's ApplyChanges visitor
(SchemaUpdate.java:91-284).  add_column("parent.child", ...) adds inside
the named struct; added struct-typed columns get fresh ids for every
nested field."""

from __future__ import annotations

import dataclasses

from linkedin_iceberg_spark.schema import (
    ListTypeDef,
    MapTypeDef,
    NestedField,
    Schema,
    StructTypeDef,
    is_promotion_allowed,
)


class SchemaUpdate:
    def __init__(self, table):
        self.table = table
        self._schema = table.schema
        self._adds: list = []          # (parent_path, leaf_name, type, doc, req)
        self._deletes: set = set()
        self._renames: dict = {}       # field id -> new (leaf) name
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

    def add_column(self, name: str, type_str, doc=None,
                   required: bool = False) -> "SchemaUpdate":
        """Add a column; a dotted name ("info.note") adds inside the parent
        struct (ref: UpdateSchema.addColumn(parent, name, type))."""
        if self._schema.find_field(name) is not None:
            raise ValueError(f"column {name!r} already exists")
        if required and not self._allow_incompatible:
            raise ValueError("adding a required column is incompatible "
                             "(use allow_incompatible_changes)")
        parent, _, leaf = name.rpartition(".")
        if parent:
            pf = self._resolve(parent)
            t = pf.type
            if isinstance(t, ListTypeDef):
                t = t.element
            if isinstance(t, MapTypeDef):
                t = t.value
            if not isinstance(t, StructTypeDef):
                raise ValueError(f"{parent!r} is not a struct")
        self._adds.append((parent, leaf, type_str, doc, required))
        return self

    def delete_column(self, name: str) -> "SchemaUpdate":
        self._deletes.add(self._resolve(name).field_id)
        return self

    def rename_column(self, name: str, new_name: str) -> "SchemaUpdate":
        if "." in new_name:
            raise ValueError("new name must be a bare (leaf) name")
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

    # ------------------------------------------------------------------ apply
    def apply(self) -> Schema:
        """Build the new schema without committing."""
        counter = [self.table.metadata.last_column_id]

        def next_id() -> int:
            counter[0] += 1
            return counter[0]

        def fresh_ids(t):
            """Assign fresh ids to every nested field of an added type."""
            if isinstance(t, StructTypeDef):
                return StructTypeDef(tuple(
                    NestedField(next_id(), f.name, fresh_ids(f.type),
                                f.required, f.doc) for f in t.fields))
            if isinstance(t, ListTypeDef):
                return ListTypeDef(next_id(), fresh_ids(t.element),
                                   t.element_required)
            if isinstance(t, MapTypeDef):
                return MapTypeDef(next_id(), fresh_ids(t.key), next_id(),
                                  fresh_ids(t.value), t.value_required)
            return t

        adds_by_parent: dict = {}
        for (parent, leaf, type_str, doc, required) in self._adds:
            adds_by_parent.setdefault(parent, []).append(
                (leaf, type_str, doc, required))

        def rebuild_type(t, path: str):
            if isinstance(t, StructTypeDef):
                return StructTypeDef(tuple(rebuild_fields(t.fields, path)))
            if isinstance(t, ListTypeDef):
                return ListTypeDef(t.element_id,
                                   rebuild_type(t.element, path),
                                   t.element_required)
            if isinstance(t, MapTypeDef):
                return MapTypeDef(t.key_id, t.key, t.value_id,
                                  rebuild_type(t.value, path),
                                  t.value_required)
            return t

        def rebuild_fields(fields, path: str) -> list:
            out = []
            for f in fields:
                # paths use ORIGINAL names (adds/moves resolved at call time)
                fpath = f"{path}{f.name}"
                if f.field_id in self._deletes:
                    continue
                name = self._renames.get(f.field_id, f.name)
                if isinstance(f.type, str):
                    t = self._promotes.get(f.field_id, f.type)
                else:
                    t = rebuild_type(f.type, fpath + ".")
                required = self._requireds.get(f.field_id, f.required)
                doc = self._docs.get(f.field_id, f.doc)
                out.append(NestedField(f.field_id, name, t, required, doc))
            for (leaf, type_str, doc, required) in \
                    adds_by_parent.get(path.rstrip("."), []):
                out.append(NestedField(next_id(), leaf, fresh_ids(type_str),
                                       required, doc))
            return out

        fields = rebuild_fields(self._schema.fields, "")

        def move_in(fields: list, fid: int, pos: str, other) -> bool:
            idx = next((i for i, f in enumerate(fields)
                        if f.field_id == fid), None)
            if idx is not None:
                f = fields.pop(idx)
                if pos == "first":
                    fields.insert(0, f)
                else:
                    oidx = next(i for i, g in enumerate(fields)
                                if g.field_id == other)
                    fields.insert(oidx if pos == "before" else oidx + 1, f)
                return True
            # recurse into nested structs
            for i, f in enumerate(fields):
                t = f.type
                if isinstance(t, ListTypeDef):
                    t = t.element
                if isinstance(t, MapTypeDef):
                    t = t.value
                if isinstance(t, StructTypeDef):
                    sub = list(t.fields)
                    if move_in(sub, fid, pos, other):
                        new_t = StructTypeDef(tuple(sub))
                        ft = f.type
                        if isinstance(ft, ListTypeDef):
                            new_t = ListTypeDef(ft.element_id, new_t,
                                                ft.element_required)
                        elif isinstance(ft, MapTypeDef):
                            new_t = MapTypeDef(ft.key_id, ft.key, ft.value_id,
                                               new_t, ft.value_required)
                        fields[i] = NestedField(f.field_id, f.name, new_t,
                                                f.required, f.doc)
                        return True
            return False

        for (fid, pos, other) in self._moves:
            if not move_in(fields, fid, pos, other):
                raise ValueError(f"cannot move field id {fid}")

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
