"""r7: identifier fields — the v2 spec's row-identity declaration
(schema identifier-field-ids / SET IDENTIFIER FIELDS DDL), consumed as
the default key set by the upsert sink."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def idt(catalog, spark):
    catalog.sql("CREATE TABLE db.idt (id BIGINT NOT NULL, "
                "region STRING NOT NULL, v DOUBLE, note STRING) "
                "USING iceberg")
    t = catalog.load_table("db.idt")
    t.append(spark.createDataFrame(
        [(1, "eu", 1.0, "a"), (2, "us", 2.0, "b")],
        t.schema.to_spark()))
    return t


def test_set_and_drop_identifier_fields_sql(idt, catalog):
    st = catalog.sql("ALTER TABLE db.idt SET IDENTIFIER FIELDS id, "
                     "region").collect()[0]
    assert st.detail == "identifier_fields=id,region"
    idt.refresh()
    assert idt.identifier_fields == ["id", "region"]
    # ids persist through the metadata JSON round-trip
    t2 = catalog.load_table("db.idt")
    assert t2.identifier_fields == ["id", "region"]
    # DESCRIBE EXTENDED surfaces them
    rows = {r.col_name: r.data_type for r in
            catalog.sql("DESCRIBE EXTENDED db.idt").collect()}
    assert rows.get("Identifier Fields") == "id,region"

    catalog.sql("ALTER TABLE db.idt DROP IDENTIFIER FIELDS region")
    idt.refresh()
    assert idt.identifier_fields == ["id"]
    with pytest.raises(ValueError, match="not identifier field"):
        catalog.sql("ALTER TABLE db.idt DROP IDENTIFIER FIELDS note")


def test_identifier_field_spec_rules(idt, catalog):
    # optional column rejected
    with pytest.raises(ValueError, match="must be required"):
        idt.set_identifier_fields(["note"])
    # float/double rejected even if required
    catalog.sql("ALTER TABLE db.idt ALTER COLUMN v SET NOT NULL")
    idt.refresh()
    with pytest.raises(ValueError, match="NaN"):
        idt.set_identifier_fields(["v"])
    with pytest.raises(ValueError, match="no such column"):
        idt.set_identifier_fields(["zz"])


def test_identifier_fields_survive_rename(idt, catalog):
    idt.set_identifier_fields(["id"])
    catalog.sql("ALTER TABLE db.idt RENAME COLUMN id TO row_id")
    idt.refresh()
    # resolution is by field id, so the NAME follows the rename
    assert idt.identifier_fields == ["row_id"]


def test_upsert_sink_defaults_to_identifier_fields(idt, catalog, spark):
    from linkedin_iceberg_spark.streaming.sink import (
        upsert_batch_idempotent)

    batch = spark.createDataFrame(
        [(2, "us", 20.0, "B2"), (3, "ap", 3.0, "c")],
        idt.schema.to_spark())
    # no identifier fields declared yet: omitted key_cols must raise
    with pytest.raises(ValueError, match="identifier fields"):
        upsert_batch_idempotent(idt, batch, epoch_id=0, query_id="q7")
    idt.set_identifier_fields(["id"])
    upsert_batch_idempotent(idt, batch, epoch_id=0, query_id="q7")
    idt.refresh()
    got = {r.id: (r.v, r.note) for r in idt.to_df().collect()}
    assert got == {1: (1.0, "a"), 2: (20.0, "B2"), 3: (3.0, "c")}
