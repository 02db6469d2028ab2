"""Nested-field schema evolution (W11): add/rename/drop/promote/move INSIDE
structs, with id-based recursive read projection.

Scenarios ported from the reference's core/src/test/java/org/apache/iceberg/
TestSchemaUpdate.java (nested add/rename/delete/promote/move cases),
re-expressed against the Spark read path.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from linkedin_iceberg_spark.schema import StructTypeDef


@pytest.fixture()
def nested_df(spark):
    return spark.createDataFrame(
        [Row(id=1, info=Row(a=10, b="x"), tags=[Row(k="t1", w=1)]),
         Row(id=2, info=Row(a=20, b="y"), tags=[Row(k="t2", w=2)]),
         Row(id=3, info=None, tags=None)],
        "id long, info struct<a int, b string>, "
        "tags array<struct<k string, w int>>")


def test_nested_add_rename_delete(catalog, nested_df, spark):
    t = catalog.create_table("db.nested1", nested_df)
    t.append(nested_df)
    (t.update_schema()
     .rename_column("info.a", "alpha")
     .add_column("info.note", "string")
     .delete_column("info.b")
     .commit())
    info_t = t.schema.find_field("info").type
    assert isinstance(info_t, StructTypeDef)
    assert [f.name for f in info_t.fields] == ["alpha", "note"]

    out = {r.id: r for r in t.to_df().collect()}
    assert out[1].info.alpha == 10 and out[1].info.note is None
    assert not hasattr(out[1].info, "b")
    assert out[3].info is None  # null structs stay null

    # append under the NEW schema; both generations read consistently
    t.append(spark.createDataFrame(
        [Row(id=4, info=Row(alpha=40, note="n"), tags=[])],
        t.schema.to_spark()))
    out = {r.id: r for r in t.to_df().collect()}
    assert out[4].info.note == "n" and out[1].info.alpha == 10


def test_nested_promote_and_move(catalog, nested_df):
    t = catalog.create_table("db.nested2", nested_df)
    t.append(nested_df)
    (t.update_schema()
     .update_column("info.a", "long")
     .move_after("info.b", "info.a")   # no-op order, exercises nested move
     .move_first("info.b")
     .commit())
    info_t = t.schema.find_field("info").type
    assert [f.name for f in info_t.fields] == ["b", "a"]
    assert t.schema.find_field("info.a").type == "long"
    row = {r.id: r for r in t.to_df().collect()}[2]
    assert row.info.a == 20 and isinstance(row.info.a, int)


def test_struct_inside_array_evolves(catalog, nested_df):
    t = catalog.create_table("db.nested3", nested_df)
    t.append(nested_df)
    (t.update_schema()
     .rename_column("tags.k", "key")
     .add_column("tags.score", "double")
     .commit())
    out = {r.id: r for r in t.to_df().collect()}
    assert out[1].tags[0].key == "t1"
    assert out[1].tags[0].score is None
    assert out[3].tags is None


def test_nested_add_into_missing_parent_rejected(catalog, nested_df):
    t = catalog.create_table("db.nested4", nested_df)
    with pytest.raises(ValueError, match="no column"):
        t.update_schema().add_column("nope.x", "string")
    with pytest.raises(ValueError, match="not a struct"):
        t.update_schema().add_column("id.x", "string")


def test_nested_ids_stay_stable_across_evolution(catalog, nested_df):
    t = catalog.create_table("db.nested5", nested_df)
    t.append(nested_df)
    fid_a = t.schema.find_field("info.a").field_id
    t.update_schema().rename_column("info.a", "alpha").commit()
    assert t.schema.find_field("info.alpha").field_id == fid_a
    # a fresh add must NOT reuse any id
    t.update_schema().add_column("info.extra", "int").commit()
    ids = [f.field_id for f in t.schema._all_fields()]
    assert len(ids) == len(set(ids))
