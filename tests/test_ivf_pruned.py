"""Persisted IVF index: partition pruning does the probe's file skipping."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import in_
from linkedin_iceberg_spark.operators.similarity import (
    default_centroids, ivf_index_table, ivf_topk, ivf_topk_from_table,
    probe_cells)


def test_ivf_table_prunes_to_probed_cells(catalog, spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = default_centroids(e, n_cells=8)
    t = ivf_index_table(catalog, "db.ivf", e, cents)

    all_files = t.new_scan().plan_files()
    cells_present = {task.file.partition["cell"] for task in all_files}
    assert len(cells_present) > 2  # several cells materialized

    q = cents[0][1]
    probes = probe_cells(cents, q, n_probe=2)
    pruned = t.new_scan().filter(in_("cell", [int(c) for c in probes])) \
        .plan_files()
    # the probe plans ONLY the probed cells' files
    assert {task.file.partition["cell"] for task in pruned} <= set(probes)
    assert len(pruned) < len(all_files)

    got = ivf_topk_from_table(t, cents, q, k=10, n_probe=2).collect()
    want = ivf_topk(e, q, k=10, n_cells=8, n_probe=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ivf_assign_join_parity(spark, sf_dir):
    """The broadcast-join assignment (large-n_cells path) is value-
    identical to the inlined-literal expression path."""
    from linkedin_iceberg_spark.operators.similarity import (
        ivf_assign, ivf_assign_join)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = default_centroids(e, n_cells=8)
    a = {r.vec_id: r.cell for r in
         ivf_assign(e, cents).select("vec_id", "cell").collect()}
    b = {r.vec_id: r.cell for r in
         ivf_assign_join(e, cents).select("vec_id", "cell").collect()}
    assert a == b


def test_ivf_refresh_growth_gated_and_recall(catalog, spark, sf_dir):
    """r4 (verdict #7): the persisted IVF index has a maintenance story.

    Build the index on HALF the corpus, verify refresh is a growth-gated
    no-op, append the other half (2x growth), refresh — centroids retrain,
    every row is re-assigned, files + properties swap in one atomic
    transaction — and assert probe recall against brute-force top-k."""
    from linkedin_iceberg_spark.operators.similarity import (
        cosine_topk, ivf_centroids, ivf_refresh)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = e.filter(F.col("vec_id") < 250)
    cents0 = default_centroids(half, n_cells=8)
    t = ivf_index_table(catalog, "db.ivfr", half, cents0)

    # below the growth threshold: no-op, same centroids come back
    refreshed, cents = ivf_refresh(t, growth_factor=0.5)
    assert not refreshed
    assert cents == ivf_centroids(t)

    # corpus doubles: refresh retrains and re-clusters atomically
    rest = e.filter(F.col("vec_id") >= 250)
    from linkedin_iceberg_spark.operators.similarity import ivf_assign
    t.append(ivf_assign(rest, cents0))
    t = catalog.load_table("db.ivfr")
    v_before = t.version
    refreshed, new_cents = ivf_refresh(t, growth_factor=0.5)
    assert refreshed
    assert new_cents != cents0
    # ONE commit swapped files and properties together
    assert t.version == v_before + 1
    assert ivf_centroids(t) == new_cents
    assert int(t.properties["ivf.indexed-count"]) == 500
    assert t.to_df().count() == 500
    # cells on disk match a fresh assignment under the NEW centroids
    want = {r.vec_id: r.cell for r in
            ivf_assign(e, new_cents).select("vec_id", "cell").collect()}
    got = {r.vec_id: r.cell for r in
           t.to_df().select("vec_id", "cell").collect()}
    assert got == want

    # probe recall vs brute force on the full corpus
    k = 10
    hits = 0
    for qi in (0, 100, 400):
        q = [r for r in e.filter(F.col("vec_id") == qi)
             .select("embedding").collect()][0][0]
        exact = {r.vec_id for r in cosine_topk(e, q, k).collect()}
        approx = {r.vec_id for r in
                  ivf_topk_from_table(t, new_cents, q, k,
                                      n_probe=3).collect()}
        hits += len(exact & approx)
    assert hits >= int(0.6 * 3 * k)  # >= 60% average recall at n_probe=3


def test_truncate_embeddings_renormalize(spark, sf_dir):
    """Renormalized prefixes are unit-norm and preserve cosine ranking."""
    from linkedin_iceberg_spark.operators.similarity import (
        cosine_topk, truncate_embeddings)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = truncate_embeddings(e, 16, renormalize=True)
    norms = t.select(
        F.sqrt(F.aggregate("vec_trunc", F.lit(0.0),
                           lambda a, x: a + x * x)).alias("n")).collect()
    assert all(abs(r["n"] - 1.0) < 1e-9 for r in norms)
    # same ranking as un-renormalized slices (cosine is scale-invariant)
    raw = truncate_embeddings(e, 16, renormalize=False)
    q = raw.filter(F.col("vec_id") == 0).select("vec_trunc").head()[0]
    a = [r["vec_id"] for r in cosine_topk(
        t.select("vec_id", F.col("vec_trunc").alias("embedding")),
        q, k=10).collect()]
    b = [r["vec_id"] for r in cosine_topk(
        raw.select("vec_id", F.col("vec_trunc").alias("embedding")),
        q, k=10).collect()]
    assert a == b
