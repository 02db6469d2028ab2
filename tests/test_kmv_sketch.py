"""KMV bottom-k sketches: exact mode, estimator accuracy, mergeability
(operators/sketch.py)."""

import pytest
from pyspark.sql import Row, functions as F

from linkedin_iceberg_spark.operators.sketch import (
    kmv_distinct,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
    kmv_sketch_grouped,
)


def _vals(spark, xs):
    return spark.createDataFrame([Row(v=str(x)) for x in xs])


def test_exact_mode_below_k(spark):
    a = _vals(spark, range(100))          # distinct = 100
    b = _vals(spark, range(60, 160))      # overlap = 40, union = 160
    out = kmv_overlap(a, b, "v", k=4096).collect()[0]
    assert out["union_est"] == 160.0
    assert out["intersection_est"] == pytest.approx(40.0)
    assert out["jaccard_est"] == pytest.approx(40 / 160)
    d = kmv_distinct(kmv_sketch(a, "v", k=4096), k=4096).collect()[0]
    assert d["distinct_est"] == 100.0


def test_estimator_bands_above_k(spark):
    n = 20_000
    a = _vals(spark, range(n))
    b = _vals(spark, range(n // 2, n + n // 2))   # J = 1/3, union = 30000
    k = 2048
    out = kmv_overlap(a, b, "v", k=k).collect()[0]
    # ~1/sqrt(k) relative on counts, ~sqrt(J(1-J)/k) absolute on Jaccard;
    # 6-sigma bands so the test is deterministic-in-practice
    assert abs(out["union_est"] - 30_000) <= 6 * 30_000 / (k ** 0.5)
    assert abs(out["jaccard_est"] - 1 / 3) <= \
        6 * ((1 / 3) * (2 / 3) / k) ** 0.5
    assert abs(out["intersection_est"] - 10_000) <= 0.15 * 10_000


def test_merge_equals_rescan(spark):
    xs = [f"tok{i}" for i in range(5000)]
    parts = [_vals(spark, xs[i::3]) for i in range(3)]
    k = 512
    merged = kmv_merge([kmv_sketch(p, "v", k) for p in parts], k)
    direct = kmv_sketch(_vals(spark, xs), "v", k)
    assert sorted(r["u"] for r in merged.collect()) == \
        sorted(r["u"] for r in direct.collect())


def test_grouped_sketch_matches_per_group(spark):
    rows = [Row(g=f"g{i % 4}", v=f"x{i}") for i in range(2000)]
    df = spark.createDataFrame(rows)
    k = 64
    grouped = kmv_sketch_grouped(df, "v", "g", k)
    for g in ["g0", "g1", "g2", "g3"]:
        solo = kmv_sketch(df.filter(F.col("g") == g), "v", k)
        assert sorted(r["u"] for r in
                      grouped.filter(F.col("g") == g).collect()) == \
            sorted(r["u"] for r in solo.collect())


def test_k_guard(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_vals(spark, [1]), "v", k=1)
