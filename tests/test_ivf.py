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


# ------------------------------------------------------------------ PQ

def test_pq_roundtrip_and_search(spark, sf_dir):
    import os

    from linkedin_iceberg_spark.operators.similarity import (
        cosine_topk, pq_encode, pq_search, pq_topk, pq_train)

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    books = pq_train(e, m=8, n_codes=8, n_iters=2)
    assert len(books) == 8 and all(len(b) == 8 for b in books)
    assert all(len(vec) == 8 for b in books for _, vec in b)

    enc = pq_encode(e, books)
    row = enc.select("codes").head()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 8 for c in row["codes"])

    q = e.filter("vec_id = 0").select("embedding").head()[0]
    corpus = e.filter("vec_id <> 0")
    got = pq_search(enc.filter("vec_id <> 0"), corpus, books, q, k=5,
                    shortlist=max(50, n // 3))
    exact = cosine_topk(corpus, q, k=5)
    assert [r["vec_id"] for r in got.collect()] == \
        [r["vec_id"] for r in exact.collect()]

    # determinism: retrain -> identical codebooks
    books2 = pq_train(e, m=8, n_codes=8, n_iters=2)
    assert books == books2


def test_pq_guards(spark, sf_dir):
    import os

    import pytest as _pytest

    from linkedin_iceberg_spark.operators.similarity import (
        pq_search, pq_train)

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with _pytest.raises(ValueError, match="divide"):
        pq_train(e, m=7, n_codes=4, n_iters=1)
    books = pq_train(e.limit(20), m=4, n_codes=4, n_iters=1)
    with _pytest.raises(ValueError, match="shortlist"):
        pq_search(e, e, books, [0.0] * 64, k=10, shortlist=5)


def test_hybrid_rrf_channel_semantics(spark):
    """RRF fusion semantics on a hand-checkable corpus: a doc present in
    only one channel still scores (standard RRF), ranks tie-break by id,
    and the fusion favors double-channel presence."""
    from linkedin_iceberg_spark.operators.similarity import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta gamma"), (3, "delta"),
         (4, "alpha")],
        "doc_id long, text string")
    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [1.0, 0.05]),
         (4, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = {r.doc_id: (r.kw_rank, r.vec_rank, r.rrf_score) for r in
           hybrid_rrf_topk(docs, embs, ["alpha", "beta", "gamma"],
                           [1.0, 0.0], k=10, pool=3).collect()}
    # keyword channel: 2 (3 hits) > 1 (2) > 4 (1); doc 3 absent
    assert out[2][0] == 1 and out[1][0] == 2 and out[4][0] == 3
    assert out[3][0] is None and out[3][1] is not None
    # vec channel: cosine 1.0 for doc 1, ~0.9987 doc 3, ~0.9939 doc 2;
    # doc 4 orthogonal but pool=3 keeps top-3 only
    assert out[1][1] == 1 and out[3][1] == 2 and out[2][1] == 3
    # both-channel docs outrank single-channel at comparable ranks
    assert out[2][2] > out[3][2]
