"""Z-order (Morton) clustering for multi-column file skipping.

Sort-clustering (rewrite_data_files(sort_by=...)) gives perfect file
bounds on ONE leading column; predicates on any other column still scan
every file.  Z-ordering interleaves the bits of several columns' scaled
values so files cover small hyper-rectangles of the combined space —
range/point predicates on EACH z-column prune to O(matching files).
This is the standard lakehouse clustering trade (coarser per-column
bounds than a dedicated sort, but bounded on all z-columns at once).

Implementation is pure built-in expressions (whole-stage codegen):
  1. one metadata-sized agg computes each column's (min, max);
  2. each value is linearly scaled to a `bits`-bit integer;
  3. bits are interleaved into a single long z-value;
  4. the rewrite range-partitions + sorts on the z-value.
Linear scaling is exact for uniform-ish columns; heavily skewed columns
want rank-based boundaries — at 100 TB swap step 2 for approx-quantile
boundaries (same interleave), which is a straight extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scaled(col, lo, hi, bits: int):
    """Linear map of `col` to [0, 2^bits): JVM-side, null -> 0."""
    span = float(hi) - float(lo)
    max_code = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    code = F.floor((col.cast("double") - F.lit(float(lo)))
                   / F.lit(span) * F.lit(max_code + 1)).cast("long")
    return F.coalesce(F.least(F.greatest(code, F.lit(0)),
                              F.lit(max_code)), F.lit(0)).cast("long")


def zorder_value(df: DataFrame, cols: list, bits: int = None):
    """Column expression: the Morton interleave of `cols` (numeric /
    date / timestamp), plus the (lo, hi) stats it used.  `bits` defaults
    to 63 // len(cols) (the z-value stays in a signed long)."""
    if bits is None:
        bits = min(16, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} columns overflows a long")
    aggs = []
    for c in cols:
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"_lo_{c}"), F.max(num).alias(f"_hi_{c}")]
    stats = df.agg(*aggs).collect()[0]  # metadata-sized: 2 values per column

    z = F.lit(0).cast("long")
    n = len(cols)
    for j, c in enumerate(cols):
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        code = _scaled(F.col(c), lo or 0.0, hi or 0.0, bits)
        for i in range(bits):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_cluster(df: DataFrame, cols: list, n_partitions: int,
                   bits: int = None) -> DataFrame:
    """Range-partition + sort `df` by the z-value of `cols`: each output
    partition (-> file) covers a compact hyper-rectangle of the z-space."""
    z = zorder_value(df, cols, bits)
    return (df.withColumn("_zval", z)
            .repartitionByRange(max(1, n_partitions), "_zval")
            .sortWithinPartitions("_zval")
            .drop("_zval"))
