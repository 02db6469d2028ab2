"""KMV (k-minimum-values) bottom-k sketches: mergeable distinct-count
AND set-overlap estimation.

HLL (agg_hll_mergeable) answers "how many distinct"; it cannot answer
"how much do these two corpora OVERLAP" — the question behind
decontamination audits ("is the eval set inside the training tokens?"),
source-mix diagnostics, and dedup effectiveness checks at 100 TB.  KMV
sketches support union, intersection, and Jaccard with one pass per
corpus:

  sketch(S)  = the k smallest normalized hashes of S's distinct values
  D(S)      ~= (k-1) / u_k                     (k-th minimum estimator)
  sketch(A u B) = bottom-k of sketch(A) u sketch(B)   (mergeable)
  J(A,B)    ~= |bottomk(AuB) n sketch(A) n sketch(B)| / k
  |A n B|   ~= J * D(A u B)

Standard errors ~ 1/sqrt(k): k=4096 gives ~1.6% on counts and ~0.008
absolute on a Jaccard near 0.5 — and when the true distinct union is
UNDER k the sketch degrades gracefully into the exact answer (the
estimators detect m < k and switch to exact mode).

Scale shape: the only heavy operation is one distinct per corpus (one
hash shuffle over values, map-side combinable); everything after runs
on k rows.  Sketches persist as tiny DataFrames/parquet and merge
without rescanning — the per-partition rollup pattern.

Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations" (SIGMOD'07) is the published basis; no reference analog
(the 0.9-era fork has no sketch plane at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

DEFAULT_K = 4096


def _u(col) -> "F.Column":
    """xxhash64 normalized to (0, 1] — the KMV coordinate."""
    return (F.xxhash64(col).cast("double") + 2.0 ** 63 + 1.0) / 2.0 ** 64


def kmv_sketch(df: DataFrame, col: str, k: int = DEFAULT_K) -> DataFrame:
    """Bottom-k sketch of the DISTINCT values of ``col``: one column
    ``u`` with at most k rows.  One distinct shuffle + TakeOrdered(k);
    everything downstream is O(k)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (df.select(_u(F.col(col)).alias("u")).distinct()
            .orderBy("u").limit(k))


def kmv_sketch_grouped(df: DataFrame, col: str, group_col: str,
                       k: int = DEFAULT_K) -> DataFrame:
    """Per-group bottom-k sketches: (group_col, u) with <= k rows per
    group — the persistable per-source/per-partition rollup input."""
    if k < 2:
        raise ValueError("k must be >= 2")
    distinct = df.select(group_col, _u(F.col(col)).alias("u")).distinct()
    rn = F.row_number().over(W.partitionBy(group_col).orderBy("u"))
    return distinct.withColumn("_rn", rn).filter(F.col("_rn") <= k) \
        .drop("_rn")


def kmv_merge(sketches: list, k: int = DEFAULT_K) -> DataFrame:
    """Union sketches WITHOUT rescanning data: bottom-k of the
    concatenation (valid because bottom-k of a union equals bottom-k of
    the union of bottom-ks)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("u").limit(k)


def kmv_distinct(sketch: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """One-row DataFrame with the distinct-count estimate.  m < k means
    the sketch holds EVERY distinct hash -> exact count."""
    return sketch.agg(F.count("*").alias("m"), F.max("u").alias("u_k")) \
        .select(F.when(F.col("m") < k, F.col("m").cast("double"))
                .otherwise((F.lit(k - 1)) / F.col("u_k"))
                .alias("distinct_est"))


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, col: str,
                k: int = DEFAULT_K) -> DataFrame:
    """One-row DataFrame estimating the set relationship between the
    distinct ``col`` values of two corpora: ``union_est``,
    ``jaccard_est``, ``intersection_est`` (exact when the true distinct
    union fits in k).  Cost: one distinct pass per corpus; the sketch
    joins run on <= k rows (AQE broadcasts them)."""
    sa = kmv_sketch(df_a, col, k)
    sb = kmv_sketch(df_b, col, k)
    su = kmv_merge([sa, sb], k)
    marked = (su.join(sa.select("u", F.lit(True).alias("_a")), "u", "left")
              .join(sb.select("u", F.lit(True).alias("_b")), "u", "left"))
    agg = marked.agg(
        F.count("*").alias("m"),
        F.max("u").alias("u_k"),
        F.sum(F.when(F.col("_a") & F.col("_b"), 1).otherwise(0))
        .alias("both"))
    return agg.select(
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.lit(k - 1) / F.col("u_k")).alias("union_est"),
        (F.col("both") / F.col("m")).alias("jaccard_est"),
        (F.when(F.col("m") < k, F.col("m").cast("double"))
         .otherwise(F.lit(k - 1) / F.col("u_k"))
         * F.col("both") / F.col("m")).alias("intersection_est"))
