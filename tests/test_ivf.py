"""IVF-flat ANN operator (operators/similarity.py ivf_topk/ivf_assign)."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_assign_covers_all(spark, sf_dir):
    e = _emb(spark, sf_dir)
    cents = [(i, [float(x) for x in r[0]])
             for i, r in enumerate(e.orderBy("vec_id").limit(4)
                                   .select("embedding").collect())]
    a = ivf_assign(e, cents)
    assert a.count() == e.count()
    cells = {r[0] for r in a.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2, 3}
    # each centroid's own vector lands in its own cell (self-cos = 1)
    own = a.orderBy("vec_id").limit(4).select("cell").collect()
    assert [r[0] for r in own] == [0, 1, 2, 3]


def test_ivf_topk_subset_of_probed_cells(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    out = ivf_topk(e, q, k=5, n_cells=8, n_probe=2).collect()
    assert len(out) == 5
    assert len({r["cell"] for r in out}) <= 2
    # the query's own vector is its nearest neighbor
    assert out[0]["vec_id"] == 3 and abs(out[0]["cos_sim"] - 1.0) < 1e-9


def test_ivf_recall_vs_exact(spark, sf_dir):
    """Probing half the cells recovers most of the exact top-k — and
    probing ALL cells recovers it exactly (IVF with n_probe=n_cells is
    exhaustive search)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    exact = {r["vec_id"] for r in cosine_topk(e, q, k=10).collect()}
    full = {r["vec_id"]
            for r in ivf_topk(e, q, k=10, n_cells=4, n_probe=4).collect()}
    assert full == exact
    probed = {r["vec_id"]
              for r in ivf_topk(e, q, k=10, n_cells=4, n_probe=2).collect()}
    assert len(probed & exact) >= 5
