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
