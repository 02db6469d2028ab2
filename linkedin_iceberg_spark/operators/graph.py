"""Distributed connected components over an edge DataFrame.

The workhorse for near-duplicate GROUPING: pairwise dedup operators
(minhash/simhash/embedding-cosine) emit candidate/verified PAIRS, but a
training-data pipeline needs CLUSTERS — "these 7 documents are all the same
article" — so it can keep one representative per cluster.  Transitivity is
what turns pairs into clusters, and that is exactly connected components.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the published
shuffle-friendly formulation.  Each round is two DataFrame
self-aggregations (groupBy on node id → min over neighborhood); the edge
set monotonically contracts toward stars rooted at each component's
minimum id, converging in O(log^2 n) rounds (2-4 in practice for dedup
graphs, whose components are small clique-ish clusters).

Scale notes (100 TB lens):
  * every shuffle is groupBy on a single long node id — 8-byte keys;
  * no step materializes a component on one machine: a 10^9-node component
    still processes as (node, min-neighbor) pairs;
  * `localCheckpoint` truncates lineage each round so the iterative plan
    does not recompute (and the DAG does not grow) across iterations;
  * convergence check is a count() per round — one lightweight job.

The reference has no graph plane (it delegates all relational compute to
host engines); this operator exists for the LLM-pipeline dedup flows the
engine adds on top (see operators/dedup.py, operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Unordered pairs stored once, larger endpoint first; self-loops
    dropped, deduplicated."""
    e = edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
    return (e.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor v to
    m = min(N(u) ∪ {u}).  Emits (v, m) for v > u, v != m.

    `edges` rows are unordered pairs (stored in either orientation);
    neighborhoods need both directions, so symmetrize first."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"),
                                         F.col("u").alias("v")))
    m = (sym.groupBy("u")
         .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Over edges oriented small→large ((v,u) with v <= u): for each node u,
    connect every neighbor v < u (and u itself) to m = min(N_small(u) ∪ {u}).
    Emits (v, m) and (u, m)."""
    # orient each edge so u holds the LARGER endpoint
    oriented = edges.select(F.greatest("u", "v").alias("u"),
                            F.least("u", "v").alias("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    to_min = (oriented.join(m, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_to_min = m.select(F.col("u"), F.col("m").alias("v"))
    return (to_min.unionByName(self_to_min)
            .filter(F.col("u") != F.col("v"))
            .distinct())


def connected_components(edges: DataFrame, src: str = "u", dst: str = "v",
                         max_iter: int = 50,
                         local_threshold: int = 100_000) -> DataFrame:
    """Connected components of the undirected graph given by `edges`.

    Returns (id: long, component: long) for every node appearing in any
    edge, where `component` is the MINIMUM node id in that node's
    component (a canonical, deterministic label).

    Edge sets at or under `local_threshold` (after dedup) finish with a
    driver-side union-find — the standard hybrid: near-dup graphs are
    sparse, and when the DEDUPED edge list is metadata-sized, one collect
    beats multiple distributed rounds of job-scheduling overhead.  Larger
    graphs run the large-star/small-star alternation, whose every shuffle
    is an 8-byte node id.  Pass local_threshold=0 to force the
    distributed path.

    Raises RuntimeError if `max_iter` alternations pass without
    convergence (cannot happen for finite graphs at the default 50 —
    the algorithm provably converges in O(log^2 n) rounds)."""
    e = _canonical(edges.select(F.col(src).alias("u"),
                                F.col(dst).alias("v")))
    spark = edges.sparkSession
    if local_threshold > 0:
        head = e.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            parent: dict = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in head:
                ra, rb = find(r.u), find(r.v)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            rows = [(n, find(n)) for n in parent]
            return spark.createDataFrame(rows, "id long, component long")
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct()
             .localCheckpoint(eager=True))
    e = e.localCheckpoint(eager=True)

    converged = False
    for _i in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # star fixpoint: edge sets equal (both are distinct'd) — two
        # count()s + an exceptAll emptiness probe on the contracted set
        if e2.count() == e.count() and e2.exceptAll(e).limit(1).count() == 0:
            e = e2
            converged = True
            break
        e = e2
    if not converged:
        raise RuntimeError(f"connected_components: no convergence in "
                           f"{max_iter} rounds")

    # e is now a star forest pointing each non-root at its component min
    comp = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (nodes.join(comp, "id", "left_anti")
             .select("id", F.col("id").alias("component")))
    return comp.unionByName(roots)


def connected_components_oracle_sql(pairs_cte: str, left: str = "v1",
                                    right: str = "v2") -> str:
    """ANSI-SQL (DuckDB) oracle for connected_components: WITH RECURSIVE
    reachability from each node; component = min reachable id.  Quadratic
    in component size — an ORACLE for small verification sets, not a scale
    path.  `pairs_cte` must be a complete WITH-able subquery producing
    columns (`left`, `right`)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_cte}),
edges AS (
  SELECT {left} AS src, {right} AS dst FROM pairs
  UNION
  SELECT {right}, {left} FROM pairs
),
walk (id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.lab
)
SELECT id, min(lab) AS component FROM walk GROUP BY id"""
