"""r7: the hybrid-RRF embedding channel backed by a persisted IVF
index — full probe is value-identical to the exact channel (the
converges-to-exact contract), and partial probes plan only the probed
cells' FILES (partition pruning, not row filtering)."""

from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import in_
from linkedin_iceberg_spark.operators.similarity import (
    default_centroids, hybrid_rrf_topk, ivf_centroids, ivf_index_table,
    probe_cells)

TERMS = ["spark", "query", "data", "filter"]


def _fixture(catalog, spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    idx = ivf_index_table(catalog, "db.hyb_ivf", e,
                          default_centroids(e, n_cells=8))
    return d, e, qv, idx


def test_hybrid_ivf_full_probe_equals_exact(catalog, spark, sf_dir):
    d, e, qv, idx = _fixture(catalog, spark, sf_dir)
    exact = hybrid_rrf_topk(d, e, TERMS, qv, k=10, pool=50)
    # n_probe defaults to n_cells when a vec_index is given: full probe
    via_idx = hybrid_rrf_topk(d, None, TERMS, qv, k=10, pool=50,
                              vec_index=idx)
    assert [tuple(r) for r in via_idx.collect()] == \
        [tuple(r) for r in exact.collect()]


def test_hybrid_ivf_partial_probe_prunes_files(catalog, spark, sf_dir):
    d, e, qv, idx = _fixture(catalog, spark, sf_dir)
    cents = ivf_centroids(idx)
    probes = probe_cells(cents, qv, n_probe=2)
    all_files = idx.new_scan().plan_files()
    pruned = idx.new_scan().filter(
        in_("cell", [int(c) for c in probes])).plan_files()
    assert len(pruned) < len(all_files)
    assert {t.file.partition["cell"] for t in pruned} <= \
        {int(c) for c in probes}
    # the partial-probe channel still fuses and returns k rows, and its
    # vec channel candidates all come from probed cells
    out = hybrid_rrf_topk(d, None, TERMS, qv, k=10, pool=50,
                          vec_index=idx, n_probe=2)
    assert out.count() == 10
    got_vec_ids = {r["doc_id"] for r in out.collect()
                   if r["vec_rank"] is not None}
    probed_ids = {r["vec_id"]
                  for r in idx.new_scan()
                  .filter(in_("cell", [int(c) for c in probes]))
                  .to_df().select("vec_id").collect()}
    assert got_vec_ids <= probed_ids
