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
