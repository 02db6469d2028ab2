"""knn_join (exact + IVF modes) and deterministic sampling operators."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.sampling import (
    sample_fraction,
    sample_stratified,
)
from linkedin_iceberg_spark.operators.similarity import knn_join


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q(emb):
    return (emb.filter(F.col("vec_id") % 100 == 0)
            .select(F.col("vec_id").alias("q_id"), "embedding"))


def test_knn_exact_self_is_top1(spark, emb):
    out = knn_join(_q(emb), emb, k=3, query_id="q_id").collect()
    top1 = {r["q_id"]: r for r in out if r["rank"] == 1}
    for qid, r in top1.items():
        assert r["neighbor_id"] == qid and r["cos_sim"] == 1.0
    n_q = emb.filter(F.col("vec_id") % 100 == 0).count()
    assert len(out) == 3 * n_q


def test_knn_ivf_full_probe_equals_exact(spark, emb):
    exact = knn_join(_q(emb), emb, k=5, query_id="q_id").collect()
    ivf = knn_join(_q(emb), emb, k=5, n_cells=4, n_probe=4,
                   query_id="q_id").collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_knn_ivf_partial_probe_subset(spark, emb):
    """Partial probing returns each query's true ranking RESTRICTED to the
    probed cells: every returned neighbor appears in the exact full
    ranking with cos_sim unchanged."""
    exact = {(r["q_id"], r["neighbor_id"]): r["cos_sim"]
             for r in knn_join(_q(emb), emb, k=500, query_id="q_id")
             .collect()}
    ivf = knn_join(_q(emb), emb, k=5, n_cells=4, n_probe=1,
                   query_id="q_id").collect()
    assert ivf
    for r in ivf:
        assert exact[(r["q_id"], r["neighbor_id"])] == r["cos_sim"]


def test_sample_fraction_determinism_and_rate(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s1 = sample_fraction(o, 0.2, "o_orderkey", salt="s")
    s2 = sample_fraction(o, 0.2, "o_orderkey", salt="s")
    assert s1.count() == s2.count()
    n, total = s1.count(), o.count()
    assert abs(n / total - 0.2) < 0.05
    # nested property: a 10% sample is a subset of the 20% sample
    s_small = sample_fraction(o, 0.1, "o_orderkey", salt="s")
    assert s_small.join(s1, "o_orderkey", "left_anti").count() == 0
    # different salt re-rolls
    s3 = sample_fraction(o, 0.2, "o_orderkey", salt="other")
    assert s3.join(s1, "o_orderkey", "left_anti").count() > 0


def test_sample_stratified_rates_and_stability(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    kept = sample_stratified(o, "o_orderpriority",
                             {"1-URGENT": 1.0, "2-HIGH": 0.0},
                             id_col="o_orderkey", default_fraction=0.5)
    by = {r["o_orderpriority"]: r["n"]
          for r in kept.groupBy("o_orderpriority")
          .agg(F.count("*").alias("n")).collect()}
    tot = {r["o_orderpriority"]: r["n"]
           for r in o.groupBy("o_orderpriority")
           .agg(F.count("*").alias("n")).collect()}
    assert by["1-URGENT"] == tot["1-URGENT"]   # fraction 1.0 keeps all
    assert "2-HIGH" not in by                  # fraction 0.0 drops all
    for p in tot:
        if p not in ("1-URGENT", "2-HIGH"):
            assert abs(by[p] / tot[p] - 0.5) < 0.1
    # append-stability: the kept set over a subset equals the subset of
    # the kept set (a row's fate never depends on other rows)
    half = o.filter(F.col("o_orderkey") % 2 == 0)
    kept_half = sample_stratified(half, "o_orderpriority",
                                  {"1-URGENT": 1.0, "2-HIGH": 0.0},
                                  id_col="o_orderkey",
                                  default_fraction=0.5)
    diff = (kept_half.select("o_orderkey")
            .exceptAll(kept.filter(F.col("o_orderkey") % 2 == 0)
                       .select("o_orderkey")))
    assert diff.count() == 0


def test_sample_validation(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError):
        sample_fraction(o, 1.5, "o_orderkey")
    with pytest.raises(ValueError):
        sample_stratified(o, "o_orderpriority", {"x": -0.1},
                          id_col="o_orderkey")


def test_kmeans_fit_properties(spark, emb):
    from linkedin_iceberg_spark.operators.similarity import (
        ivf_assign, kmeans_fit)
    c0 = kmeans_fit(emb, n_cells=4, n_iters=0)   # init = lowest-id sample
    c2 = kmeans_fit(emb, n_cells=4, n_iters=2)
    assert [cid for cid, _ in c2] == [0, 1, 2, 3]
    assert c2 != c0                              # training moved centroids
    # deterministic: a second run reproduces the exact centroids
    assert kmeans_fit(emb, n_cells=4, n_iters=2) == c2
    # trained centroids produce a full, valid assignment
    a = ivf_assign(emb.select("vec_id", "embedding"), c2)
    assert a.count() == emb.count()
    assert a.select("cell").distinct().count() == 4
    # training reduces mean cosine distance to the assigned centroid
    def mean_cos(cents):
        from linkedin_iceberg_spark.operators.similarity import _cos_to_lit
        assigned = ivf_assign(emb.select("vec_id", "embedding"), cents)
        expr = None
        for cid, vec in cents:
            c = _cos_to_lit("embedding", vec)
            expr = F.when(F.col("cell") == cid, c) if expr is None \
                else expr.when(F.col("cell") == cid, c)
        return assigned.select(F.avg(expr).alias("m")).head()["m"]
    assert mean_cos(c2) > mean_cos(c0)


def test_kmeans_empty_cell_keeps_previous(spark):
    from linkedin_iceberg_spark.operators.similarity import kmeans_fit
    # 3 identical vectors + init with 2 centroids: one cell goes empty
    # (all rows assign to the same centroid) and must keep its previous
    # centroid instead of crashing or going NaN
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, n_cells=2, n_iters=2)
    assert len(cents) == 2
    assert all(all(x == x for x in vec) for _cid, vec in cents)  # no NaN


def test_quantize_int8_bounds_and_roundtrip(spark, emb):
    from linkedin_iceberg_spark.operators.similarity import (
        dequantize_int8, quantize_int8)
    qd = quantize_int8(emb.select("vec_id", "embedding"))
    # every element within int8 range, error within scale/2
    stats = qd.select(
        F.array_max(F.transform("qvec", lambda v: F.abs(v))).alias("amax"),
        F.array_max(F.zip_with(
            "embedding", "qvec",
            lambda x, q: F.abs(x.cast("double")
                               - q.cast("double") * F.col("scale"))))
         .alias("err"),
        F.col("scale")).collect()
    for r in stats:
        assert r["amax"] <= 127
        assert r["err"] <= r["scale"] / 2 + 1e-9
    # round-trip cosine vs original stays high (64-dim, int8)
    rec = dequantize_int8(qd.select("vec_id", "scale", "qvec"),
                          out_col="rec")
    both = (emb.select("vec_id", "embedding")
            .join(rec.select("vec_id", "rec"), "vec_id"))
    from linkedin_iceberg_spark.operators.similarity import _dot, _norm
    cos = (_dot(F.col("embedding"), F.col("rec"))
           / (_norm(F.col("embedding")) * _norm(F.col("rec"))))
    assert both.select(F.min(cos)).head()[0] > 0.999


def test_quantize_zero_vector(spark):
    from linkedin_iceberg_spark.operators.similarity import quantize_int8
    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    r = quantize_int8(df).head()
    assert r["scale"] == 0.0 and r["qvec"] == [0, 0, 0]


def test_sample_threshold_rounds_not_truncates(spark, sf_dir):
    from linkedin_iceberg_spark.operators.sampling import _threshold
    # 0.000249 * 1e6 = 248.99999999999997 under float; the SQL replay
    # compares against 249 — truncation would drop bucket 248
    assert _threshold(0.000249) == 249
    assert _threshold(0.5) == 500000
    assert _threshold(0.0) == 0 and _threshold(1.0) == 1_000_000


def test_split_assign_shares_bucket_recipe(spark, sf_dir):
    """split_assign and the samplers use the SAME md5 recipe (one helper):
    a doc's split bucket (mod 100) equals its sample bucket (mod 1e6)
    mod 100 for the same salt."""
    from linkedin_iceberg_spark.operators.sampling import hash_bucket
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    both = d.select(
        hash_bucket("doc_id", "v1", 100).alias("b100"),
        (hash_bucket("doc_id", "v1", 1_000_000) % 100).alias("b1m"))
    assert both.filter(F.col("b100") != F.col("b1m")).count() == 0


def test_cap_per_group_bounds_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.operators.sampling import cap_per_group
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = cap_per_group(d, "source", n=5, id_col="doc_id", salt="t")
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts and all(v <= 5 for v in counts.values())
    # deterministic: a second evaluation keeps the identical set
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               cap_per_group(d, "source", n=5, id_col="doc_id", salt="t")
               .select("doc_id").collect())
    assert a == b
    # a different salt draws a different (still capped) sample
    c = sorted(r["doc_id"] for r in
               cap_per_group(d, "source", n=5, id_col="doc_id", salt="u")
               .select("doc_id").collect())
    assert c != a


def test_mix_by_token_budget_is_greedy_maximal(spark, sf_dir):
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.operators.sampling import (
        hash_bucket, mix_by_token_budget)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    budgets = {"src0": 300, "src1": 700}
    kept = mix_by_token_budget(d, "source", "n_tokens", budgets,
                               id_col="doc_id", salt="g", default_budget=200)
    sums = {r["source"]: r["s"] for r in
            kept.groupBy("source").agg(F.sum("n_tokens").alias("s"))
            .collect()}
    for src, s in sums.items():
        assert s <= budgets.get(src, 200)
    # prefix-cut semantics: walking each source in hash order, a row is
    # kept iff the running total INCLUDING every prior row (kept or not)
    # stays within budget — the first overflow ends the prefix
    ordered = d.withColumn("_b", hash_bucket("doc_id", "g")) \
        .orderBy("source", "_b", "doc_id").collect()
    kept_ids = {r["doc_id"] for r in kept.collect()}
    running = {}
    for r in ordered:
        src = r["source"]
        b = budgets.get(src, 200)
        running[src] = running.get(src, 0) + r["n_tokens"]
        assert (r["doc_id"] in kept_ids) == (running[src] <= b)


def test_sample_weighted_pps_properties(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.operators.sampling import sample_weighted

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = d.count()
    target = max(10, n // 4)
    kept = sample_weighted(d, "n_chars", n_expected=target,
                           id_col="doc_id", salt="t1")
    k = kept.count()
    # Poisson sampling: size concentrates around the target
    assert 0.5 * target <= k <= 1.5 * target, (k, target)

    # deterministic: same inputs -> identical kept set, any partitioning
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  sample_weighted(d.repartition(7), "n_chars",
                                  n_expected=target, id_col="doc_id",
                                  salt="t1").select("doc_id").collect())
    assert ids1 == ids2

    # weighting bites: kept docs are longer on average than the corpus
    avg_all = d.agg(F.avg("n_chars")).collect()[0][0]
    avg_kept = kept.agg(F.avg("n_chars")).collect()[0][0]
    assert avg_kept > avg_all


def test_sample_weighted_guards(spark):
    from pyspark.sql import Row

    from linkedin_iceberg_spark.operators.sampling import sample_weighted

    df = spark.createDataFrame([Row(id=1, w=0), Row(id=2, w=-5),
                                Row(id=3, w=None), Row(id=4, w=10)])
    kept = sample_weighted(df, "w", n_expected=100, id_col="id")
    # zero/negative/NULL weights always drop; w=10 rows clip at p=1
    assert [r["id"] for r in kept.collect()] == [4]

    with pytest.raises(ValueError, match="positive"):
        sample_weighted(df, "w", n_expected=0, id_col="id")
    big = spark.createDataFrame([Row(id=1, w=2 ** 40)])
    with pytest.raises(ValueError, match="overflow"):
        sample_weighted(big, "w", n_expected=2 ** 20, id_col="id")
