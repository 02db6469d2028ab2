"""Embedding-cosine near-dup dedup: full pipeline vs the DuckDB oracle,
plus decision-level invariants (one keeper per group, keeper is min id).
"""

from conftest import assert_df_equals_oracle, duckdb_oracle

from linkedin_iceberg_spark.operators.dedup import (
    dedup_embedding, dedup_embedding_oracle_sql)


def test_dedup_embedding_matches_oracle(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = dedup_embedding(e, threshold=0.4, n_planes=6, n_tables=8, dim=64)
    sql = dedup_embedding_oracle_sql(dim=64, threshold=0.4, n_planes=6,
                                     n_tables=8)
    assert_df_equals_oracle(out, sql, sf_dir)


def test_dedup_embedding_invariants(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = dedup_embedding(e, threshold=0.4, n_planes=6, n_tables=8,
                           dim=64).collect()
    assert len(rows) == e.count()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for gid, members in by_group.items():
        keepers = [m for m in members if m.is_kept == 1]
        assert len(keepers) == 1
        assert keepers[0].vec_id == gid == min(m.vec_id for m in members)
    # some real clusters exist at this threshold (not all singletons)
    assert any(len(m) > 1 for m in by_group.values())


# ------------------------------------------------------------ SemDeDup

def test_semdedup_known_clusters(spark):
    from pyspark.sql import Row

    from linkedin_iceberg_spark.operators.dedup import dedup_semantic

    # two tight clusters + one isolated vector; near-dups only inside
    # the clusters
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        Row(vec_id=0, embedding=base_a),
        Row(vec_id=1, embedding=[0.99, 0.05, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.98, 0.0, 0.05, 0.0]),
        Row(vec_id=3, embedding=base_b),
        Row(vec_id=4, embedding=[0.05, 0.99, 0.0, 0.0]),
        Row(vec_id=5, embedding=[0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    out = {r["vec_id"]: (r["group_id"], r["is_kept"])
           for r in dedup_semantic(df, n_cells=3, n_iters=2,
                                   threshold=0.9).collect()}
    assert out[0] == (0, 1) and out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3] == (3, 1) and out[4] == (3, 0)
    assert out[5] == (5, 1)


def test_semdedup_matches_sql_replay(spark, sf_dir):
    import os

    from tests.conftest import duckdb_oracle

    from linkedin_iceberg_spark.operators.dedup import (
        dedup_semantic, dedup_semantic_oracle_sql)

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    got = dedup_semantic(e, n_cells=4, n_iters=1, threshold=0.4).collect()
    want = duckdb_oracle(
        dedup_semantic_oracle_sql(n_cells=4, n_iters=1, threshold=0.4),
        sf_dir)
    assert [(r["vec_id"], r["group_id"], r["is_kept"]) for r in got] == \
        list(map(tuple, want[["vec_id", "group_id", "is_kept"]]
                 .itertuples(index=False)))


def test_semdedup_default_derives_cell_count(spark, sf_dir):
    """n_cells=None (the default) derives max(min_cells, ceil(N/target))
    and is value-identical to passing the derived count explicitly —
    including past the >64-cells broadcast-join assignment switch."""
    import os

    from linkedin_iceberg_spark.operators.dedup import dedup_semantic

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()

    def rows(df):
        return [(r["vec_id"], r["group_id"], r["is_kept"])
                for r in df.collect()]

    # small corpus: derived count clamps to min_cells
    assert rows(dedup_semantic(e, n_iters=1, threshold=0.4)) == \
        rows(dedup_semantic(e, n_cells=8, n_iters=1, threshold=0.4))
    # tiny target cell size: derived count exceeds 64 -> join-path
    # assignment, still value-identical to the explicit equivalent
    derived = max(8, -(-n // 2))
    assert derived > 64
    assert rows(dedup_semantic(e, n_iters=1, threshold=0.4,
                               target_cell_size=2)) == \
        rows(dedup_semantic(e, n_cells=derived, n_iters=1, threshold=0.4))
