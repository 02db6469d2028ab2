"""Connected components (large-star/small-star) vs a Python union-find.

The operator is the grouping stage of the near-dup dedup pipelines
(pairs -> clusters); correctness here is label-exactness: every node maps
to the MINIMUM id of its component.
"""

import random

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.graph import (
    connected_components, connected_components_oracle_sql)


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _expected(edges):
    uf = _UF()
    for u, v in edges:
        uf.union(u, v)
    return sorted((n, uf.find(n)) for n in uf.p)


def _run(spark, edges, local_threshold=100_000):
    df = spark.createDataFrame(edges, "u long, v long")
    out = connected_components(df, local_threshold=local_threshold)
    return sorted((r.id, r.component) for r in out.collect())


def test_two_components_and_selfloop(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (5, 5)]
    # self-loop (5,5) is dropped entirely: node 5 never appears in a real
    # edge, so it is not part of the graph the operator sees
    assert _run(spark, edges) == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_chain_needs_multiple_rounds(spark):
    # a long path is the worst case for min-propagation; large-star/
    # small-star contracts it in O(log^2 n) rounds (distributed path)
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges, local_threshold=0)
    assert got == [(i, 0) for i in range(n + 1)]


def test_duplicate_and_reversed_edges(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 2), (2, 3)]
    assert _run(spark, edges) == [(1, 1), (2, 1), (3, 1)]


@pytest.mark.parametrize("seed,n,m", [(1, 40, 30), (2, 100, 60),
                                      (3, 100, 160), (4, 30, 80)])
@pytest.mark.parametrize("local_threshold", [0, 100_000])
def test_random_graphs_match_union_find(spark, seed, n, m, local_threshold):
    # local_threshold=0 forces the distributed large-star/small-star path;
    # the default takes the driver-side union-find fast path
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _run(spark, edges, local_threshold) == _expected(edges)


def test_star_heavy_hub(spark):
    # hub node with many leaves: one component rooted at the min leaf
    edges = [(1000, i) for i in range(500, 540)]
    got = _run(spark, edges)
    assert all(c == 500 for _n, c in got)
    assert len(got) == 41


def test_distributed_path_at_scale(spark):
    """20k-edge random graph through the large-star/small-star path only
    (local fast path disabled) — exercises multi-round convergence on a
    graph with a giant component plus many small ones."""
    rng = random.Random(99)
    n = 30_000
    edges = []
    # sparse background (mostly small components)
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(12_000)]
    # a long chain stitched through the id space (forces deep merging)
    chain = rng.sample(range(n), 4_000)
    edges += list(zip(chain, chain[1:]))
    # a few dense hubs
    for h in range(5):
        hub = rng.randrange(n)
        edges += [(hub, rng.randrange(n)) for _ in range(800)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, local_threshold=0)
    assert got == _expected(edges)


def test_oracle_sql_matches(spark):
    """The recursive-CTE oracle computes the same labels in DuckDB."""
    import duckdb

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges)

    con = duckdb.connect()
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = connected_components_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(v1, v2)")
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == oracle
