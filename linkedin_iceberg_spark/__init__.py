"""linkedin_iceberg_spark — a PySpark-native analytics engine with the
capabilities of Apache Iceberg (LinkedIn fork, reference @ /root/reference).

Architecture: the relational plane (joins/aggs/windows/sort/set-ops/functions)
is idiomatic Spark DataFrame/SQL — Catalyst plans it.  We implement the table
format plane the reference implements: snapshots, manifest metadata, per-file
column stats, hidden partitioning via transforms, predicate projection for
pruning, ACID commit operators, time travel, schema evolution, compaction,
row-level (v2) deletes, and streaming source/sink glue.

Layout:
  schema.py        — field-id schema model  (ref: api/.../Schema.java)
  expressions/     — predicate algebra + evaluators (ref: api/.../expressions/)
  transforms/      — partition transforms w/ murmur3 bucket parity
                     (ref: api/.../transforms/)
  catalog/         — metadata JSON, snapshots, commit protocol, table, scan
                     (ref: core/)
  operators/       — dedup / similarity / text / multimodal / as-of & range join
  sources/         — testdata loader helpers
  streaming/       — epoch-idempotent sink, incremental-scan source
                     (ref: spark2/.../StreamingWriter.java, core/.../MicroBatches.java)
  maintenance/     — rewrite-data-files, expire-snapshots, remove-orphans
                     (ref: spark/.../actions/)
"""

from linkedin_iceberg_spark.catalog.catalog import Catalog
from linkedin_iceberg_spark.schema import Schema, NestedField
from linkedin_iceberg_spark.catalog.spec import PartitionSpec
from linkedin_iceberg_spark import events

__version__ = "0.2.0"

__all__ = ["Catalog", "Schema", "NestedField", "PartitionSpec", "events",
           "__version__"]
