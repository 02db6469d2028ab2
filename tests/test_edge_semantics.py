"""Edge-case semantics: decimal literal rescaling, decimal-0 hash bytes,
string upper-bound truncation at the surrogate boundary, and the
null-vs-empty-string partition-value ambiguity."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog.stats import truncate_upper
from linkedin_iceberg_spark.expressions import bind, eq
from linkedin_iceberg_spark.schema import Schema
from linkedin_iceberg_spark.transforms.bucket_hash import to_hash_bytes


from pyspark.sql import types as T


def _dec_schema():
    return Schema.from_spark(T.StructType([
        T.StructField("d", T.DecimalType(9, 2)),
        T.StructField("s", T.StringType())]))


def test_decimal_literal_rescaled_to_column_scale():
    bound = bind(_dec_schema(), eq("d", Decimal("12.5")))
    lit = bound.literal
    assert lit == Decimal("12.50") and lit.as_tuple().exponent == -2
    # the unscaled value seen by bucket/truncate is the STORED one
    assert to_hash_bytes(lit, "decimal(9,2)") == \
        to_hash_bytes(Decimal("12.50"), "decimal(9,2)")


def test_decimal_literal_precision_loss_rejected():
    with pytest.raises(TypeError, match="precision"):
        bind(_dec_schema(), eq("d", Decimal("1.005")))


def test_decimal_zero_hash_bytes_single_zero_byte():
    # Java BigInteger.ZERO.toByteArray() == [0x00]
    assert to_hash_bytes(Decimal("0"), "decimal(9,2)") == b"\x00"
    assert to_hash_bytes(Decimal("0.00"), "decimal(9,2)") == b"\x00"


def test_truncate_upper_skips_surrogate_block():
    s = "a" * 16 + "zz"
    prefix15_d7ff = "a" * 15 + "퟿" + "zz"
    out = truncate_upper(prefix15_d7ff, 16)
    # U+D7FF must jump to U+E000, never a lone surrogate
    assert out == "a" * 15 + ""
    out.encode("utf-8")  # must be valid UTF-8
    assert out > prefix15_d7ff[:16]
    assert truncate_upper(s, 16) == "a" * 15 + "b"


def test_out_of_range_literals_fold_to_constants():
    # ref: Literals.java:179-206 ABOVE_MAX / BELOW_MIN folding
    from pyspark.sql import types as T

    from linkedin_iceberg_spark.expressions import gt, in_, lt, not_in
    from linkedin_iceberg_spark.expressions.expressions import (
        AlwaysFalse,
        AlwaysTrue,
    )
    sch = Schema.from_spark(T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("f", T.FloatType())]))
    assert isinstance(bind(sch, gt("i", 2**40)), AlwaysFalse)
    assert isinstance(bind(sch, lt("i", 2**40)), AlwaysTrue)
    assert isinstance(bind(sch, lt("i", -(2**40))), AlwaysFalse)
    assert isinstance(bind(sch, eq("i", 3_000_000_000)), AlwaysFalse)
    assert isinstance(bind(sch, gt("f", 1e39)), AlwaysFalse)
    assert isinstance(bind(sch, in_("i", [2**40, 2**41])), AlwaysFalse)
    assert isinstance(bind(sch, not_in("i", [2**40])), AlwaysTrue)
    # in-range members survive the IN-list filtering
    b = bind(sch, in_("i", [1, 2**40]))
    assert getattr(b, "literals", None) == frozenset({1})


def test_empty_string_partition_distinct_from_null(catalog, spark):
    from linkedin_iceberg_spark import PartitionSpec
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x"), (4, "")], "id long, s string")
    spec = PartitionSpec.builder_for(Schema.from_spark(df.schema)) \
        .identity("s").build()
    t = catalog.create_table("db.empty_part", df, spec=spec)
    t.append(df)
    parts = {e.data_file.partition["s"] for e in t._live_entries()
             if e.data_file.content == M.CONTENT_DATA}
    # "" and null are DISTINCT partitions (Spark's dir encoding collapses
    # them; the injective write-column prefix keeps them apart)
    assert "" in parts and None in parts and "x" in parts
    # pruning on the empty string must keep (only) the matching file
    tasks = t.new_scan().filter(eq("s", "")).plan_files()
    assert len(tasks) == 1
    got = t.scan(row_filter=eq("s", "")).select("id").orderBy("id")
    assert [r.id for r in got.collect()] == [1, 4]
    assert t.to_df().filter(F.col("s").isNull()).count() == 1


def test_per_column_metrics_modes(catalog, spark, sf_dir):
    """write.metadata.metrics.column.<name> overrides (ref:
    TableProperties METRICS_MODE_COLUMN_CONF_PREFIX): a 'none' column
    carries no counts or bounds, a 'counts' column no bounds, while the
    default columns keep theirs (r7)."""
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = catalog.create_table(
        "db.metcol", orders,
        properties={
            "write.metadata.metrics.column.o_orderpriority": "none",
            "write.metadata.metrics.column.o_orderstatus": "counts",
        })
    t.append(orders.limit(200))
    sch = t.schema
    fid_none = sch.id_for_name("o_orderpriority")
    fid_counts = sch.id_for_name("o_orderstatus")
    fid_def = sch.id_for_name("o_orderkey")
    for e in t._live_data_and_deletes()[0]:
        f = e.data_file
        assert fid_none not in f.value_counts
        assert fid_none not in f.lower_bounds
        assert fid_counts in f.value_counts
        assert fid_counts not in f.lower_bounds
        assert fid_def in f.value_counts
        assert fid_def in f.lower_bounds
    # the default-mode columns still prune
    from linkedin_iceberg_spark.expressions import lt
    assert len(t.new_scan().filter(lt("o_orderkey", -5)).plan_files()) \
        == 0
