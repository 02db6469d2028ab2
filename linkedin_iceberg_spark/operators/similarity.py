"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exact baseline (single scan, broadcast query
vector, JVM-side F.aggregate/zip_with arithmetic — no Python in the loop).
The LSH-bucketed variant is the 100 TB path: candidates only within
hyperplane-sign buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double")
                              * v.cast("double")))


def cosine_topk(df: DataFrame, query_vec, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding", round_to: int = 5) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.
    Scale: the query vector is a literal (broadcast into codegen); Spark
    executes TakeOrderedAndProject — per-partition heaps, no global sort."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return (df.select(F.col(id_col), F.round(cos, round_to).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def cosine_pairs(df: DataFrame, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_to: int = 5) -> DataFrame:
    """All pairs with cosine >= threshold (exact, O(n^2) candidates).
    Use ann_lsh_candidates to pre-bucket at scale."""
    a = df.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"))
    b = df.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"))
    pairs = a.join(b, F.col("v1") < F.col("v2"))
    cos = _dot(F.col("e1"), F.col("e2")) / (_norm(F.col("e1"))
                                            * _norm(F.col("e2")))
    return (pairs.withColumn("cos_sim_raw", cos)
            .filter(F.col("cos_sim_raw") >= threshold)
            .select("v1", "v2",
                    F.round("cos_sim_raw", round_to).alias("cos_sim"))
            .orderBy("v1", "v2"))


def _deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list:
    """Pseudorandom hyperplanes from a seeded LCG (no numpy RNG state,
    reproducible across runs/workers)."""
    planes = []
    state = seed
    for _p in range(n_planes):
        vec = []
        for _i in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) \
                % (1 << 64)
            # map to [-1, 1)
            vec.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        planes.append(vec)
    return planes


def ann_lsh_candidates(df: DataFrame, n_planes: int = 8,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = None) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of `n_planes` projections.
    Returns candidate pairs (v1, v2, bucket) joined within buckets only —
    the shuffle key is an int bucket id.  Recall is tuned by running
    multiple plane sets (union of candidates) at scale."""
    if dim is None:
        first = df.select(F.size(vec_col)).head()
        dim = first[0] if first else 0
    planes = _deterministic_planes(dim, n_planes)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plit = F.array(*[F.lit(x) for x in plane])
        sign = F.when(_dot(F.col(vec_col), plit) >= 0, F.lit(1 << i)) \
            .otherwise(F.lit(0))
        bucket = bucket + sign
    bucketed = df.select(F.col(id_col), bucket.alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("v1"),
                    F.col(f"b.{id_col}").alias("v2"),
                    F.col("a.bucket").alias("bucket"))
            .orderBy("v1", "v2"))
