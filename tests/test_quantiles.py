"""exact_quantiles: order-statistics quantiles, grouped and global —
the corpus-threshold primitive (exact, reproducible, unlike
percentile_approx)."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.quantiles import exact_quantiles


def _brute(vals, pct):
    vals = sorted(vals)
    n = len(vals)
    rk = max(1, -(-pct * n // 100))  # ceil
    return vals[rk - 1]


def test_grouped_matches_brute_force(spark):
    rows = [(i, "g" + str(i % 3), (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {(r.g, r.pct): (r.n, r.quantile_value)
           for r in exact_quantiles(df, "v", pcts=(10, 50, 99),
                                    group_col="g", id_col="id").collect()}
    for g in ("g0", "g1", "g2"):
        vals = [v for i, gg, v in rows if gg == g]
        for pct in (10, 50, 99):
            assert got[(g, pct)] == (len(vals), _brute(vals, pct)), \
                (g, pct)


def test_global_matches_grouped_single_group(spark):
    rows = [(i, (i * 13) % 997) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    glob = {r.pct: (r.n, r.quantile_value)
            for r in exact_quantiles(df, "v", pcts=(25, 50, 75, 90),
                                     id_col="id").collect()}
    one = df.withColumn("g", F.lit("all"))
    grp = {r.pct: (r.n, r.quantile_value)
           for r in exact_quantiles(one, "v", pcts=(25, 50, 75, 90),
                                    group_col="g", id_col="id").collect()}
    assert glob == grp
    vals = [v for _, v in rows]
    for pct in (25, 50, 75, 90):
        assert glob[pct] == (500, _brute(vals, pct))


def test_nulls_excluded_and_ties_stable(spark):
    rows = [(1, "a", 5), (2, "a", 5), (3, "a", 5), (4, "a", None),
            (5, "a", 9), (6, "b", None)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = exact_quantiles(df, "v", pcts=(50, 100), group_col="g",
                          id_col="id").collect()
    # group b is all-NULL: no rows at all
    assert all(r.g == "a" for r in got)
    by = {r.pct: (r.n, r.quantile_value) for r in got}
    assert by[50] == (4, 5)   # rank ceil(0.5*4)=2 -> tied value 5
    assert by[100] == (4, 9)  # max


def test_pct_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", pcts=(0, 50))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", pcts=())


def test_global_many_partitions_offsets(spark):
    """The offset arithmetic survives a value distribution that lands
    unevenly across range partitions (skewed values + duplicates)."""
    rows = [(i, 1 if i < 900 else i) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    got = {r.pct: r.quantile_value
           for r in exact_quantiles(df, "v", pcts=(50, 95, 100),
                                    id_col="id").collect()}
    vals = [v for _, v in rows]
    assert got == {p: _brute(vals, p) for p in (50, 95, 100)}


def test_sampled_quantiles_exact_when_small(spark):
    """k >= group size: the sample IS the group, results equal
    exact_quantiles (modulo the column name)."""
    from linkedin_iceberg_spark.operators.quantiles import (
        sampled_quantiles)

    rows = [(i, "g" + str(i % 2), (i * 37) % 101) for i in range(150)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {(r.g, r.pct): (r.n_sampled, r.quantile_value)
           for r in sampled_quantiles(df, "v", pcts=(10, 50, 95),
                                      group_col="g", id_col="id",
                                      k=10_000).collect()}
    want = {(r.g, r.pct): (r.n, r.quantile_value)
            for r in exact_quantiles(df, "v", pcts=(10, 50, 95),
                                     group_col="g", id_col="id"
                                     ).collect()}
    assert got == want


def test_sampled_quantiles_bounded_and_close(spark):
    """k << n: the sample caps at k, is deterministic across
    repartitionings, and its median lands near the true median."""
    from linkedin_iceberg_spark.operators.quantiles import (
        sampled_quantiles)

    rows = [(i, i % 1000) for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = sampled_quantiles(df, "v", pcts=(50,), id_col="id",
                          k=512).collect()
    b = sampled_quantiles(df.repartition(17), "v", pcts=(50,),
                          id_col="id", k=512).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0].n_sampled == 512
    assert abs(a[0].quantile_value - 500) < 100  # ~1/sqrt(512) rank err


def test_sampled_quantiles_global_two_level(spark):
    """The global path's two-level bottom-k equals a driver-side brute
    bottom-k over the same hash order."""
    import hashlib

    from linkedin_iceberg_spark.operators.quantiles import (
        sampled_quantiles)

    rows = [(i, (i * 13) % 997) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(11)
    got = {r.pct: r.quantile_value
           for r in sampled_quantiles(df, "v", pcts=(25, 75),
                                      id_col="id", k=200).collect()}

    def h(v, i):
        return hashlib.md5(f"v1-{v}-{i}".encode()).hexdigest()

    sample = sorted(rows, key=lambda r: (h(r[1], r[0]), r[0]))[:200]
    vals = sorted(v for _, v in sample)
    for pct in (25, 75):
        rk = max(1, -(-pct * len(vals) // 100))
        assert got[pct] == vals[rk - 1], pct
