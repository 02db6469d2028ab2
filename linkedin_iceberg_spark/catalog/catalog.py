"""Directory-based catalog (ref: core/.../hadoop/HadoopCatalog.java,
api/.../catalog/Catalog.java).

A warehouse dir holds one subdirectory per table (namespace levels become
nested dirs).  Table existence == metadata/v1.metadata.json exists."""

from __future__ import annotations

import os
import shutil
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession

from linkedin_iceberg_spark.catalog.metadata import TableMetadata, TableOperations
from linkedin_iceberg_spark.catalog.spec import PartitionSpec
from linkedin_iceberg_spark.catalog.table import Table
from linkedin_iceberg_spark.schema import Schema


class NoSuchTableError(Exception):
    pass


class AlreadyExistsError(Exception):
    pass


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _table_location(self, name: str) -> str:
        parts = name.split(".")
        return os.path.join(self.warehouse, *parts)

    def create_table(self, name: str, schema: Union[Schema, "DataFrame"],
                     spec: Optional[PartitionSpec] = None,
                     properties: Optional[dict] = None) -> Table:
        if isinstance(schema, DataFrame):
            schema = Schema.from_spark(schema.schema)
        location = self._table_location(name)
        ops = TableOperations(location)
        if ops.refresh() is not None:
            raise AlreadyExistsError(f"table {name} already exists")
        spec = spec or PartitionSpec.unpartitioned()
        if spec.fields and spec.fields[0].source_name is None:
            spec = spec.bind(schema)
        md = TableMetadata.new_table(location, schema, spec, properties)
        version = ops.commit(0, md)
        md._version = version  # type: ignore[attr-defined]
        return Table(self.spark, ops, md, version, name)

    def load_table(self, name: str) -> Table:
        location = self._table_location(name)
        ops = TableOperations(location)
        md = ops.refresh()
        if md is None:
            raise NoSuchTableError(f"no such table: {name}")
        return Table(self.spark, ops, md, getattr(md, "_version", 1), name)

    def table_exists(self, name: str) -> bool:
        return TableOperations(self._table_location(name)).refresh() is not None

    def drop_table(self, name: str, purge: bool = True) -> bool:
        location = self._table_location(name)
        if not os.path.isdir(os.path.join(location, "metadata")):
            return False
        if purge:
            shutil.rmtree(location)
        else:
            shutil.rmtree(os.path.join(location, "metadata"))
        return True

    def list_tables(self, namespace: str = "") -> list:
        base = os.path.join(self.warehouse, *namespace.split(".")) \
            if namespace else self.warehouse
        out = []
        for root, dirs, _files in os.walk(base):
            if os.path.basename(root) == "metadata":
                tdir = os.path.dirname(root)
                rel = os.path.relpath(tdir, self.warehouse)
                out.append(rel.replace(os.sep, "."))
                dirs.clear()
        return sorted(out)

    def create_table_as_select(self, name: str, df: DataFrame,
                               spec: Optional[PartitionSpec] = None,
                               properties: Optional[dict] = None) -> Table:
        """CTAS (ref: core/.../Transactions.createTableTransaction): create +
        first append; on failure the half-written table is dropped."""
        t = self.create_table(name, df, spec=spec, properties=properties)
        try:
            t.append(df)
        except Exception:
            self.drop_table(name)
            raise
        return t

    def migrate(self, name: str, path_or_df, spec: Optional[PartitionSpec] = None,
                fmt: str = "parquet") -> Table:
        """Import an existing parquet directory/table (ref:
        spark/.../SparkTableUtil.java importSparkTable / the legacy Hive
        adapter hive-metastore/.../legacy/LegacyHiveTable.java — our analog
        reads any Spark-readable path and snapshots it as a table)."""
        df = path_or_df if isinstance(path_or_df, DataFrame) else \
            self.spark.read.format(fmt).load(path_or_df)
        return self.create_table_as_select(name, df, spec=spec)
