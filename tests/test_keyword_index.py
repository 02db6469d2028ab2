"""r7: the persisted inverted keyword index — the keyword channel's
serving shape: token-bucket-partitioned postings, file-level pruning
for a query's terms, value-identical scores to the exact corpus scan
(the converges-to-exact contract), and incremental append."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import in_
from linkedin_iceberg_spark.operators.keyword import (
    keyword_index_append, keyword_index_table, keyword_topk_from_table,
    term_bucket)
from linkedin_iceberg_spark.operators.similarity import hybrid_rrf_topk

TERMS = ["spark", "query", "data", "filter"]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _exact_channel(d, terms, pool):
    t = F.array(*[F.lit(x) for x in terms])
    return (d.select(
        "doc_id",
        F.size(F.array_intersect(
            F.array_distinct(F.split(F.lower(F.col("text")),
                                     "[^a-z0-9]+")), t))
        .alias("kw_score"))
        .filter(F.col("kw_score") > 0)
        .orderBy(F.col("kw_score").desc(), "doc_id")
        .limit(pool))


def test_index_channel_equals_exact_scan(catalog, spark, sf_dir):
    d = _docs(spark, sf_dir)
    idx = keyword_index_table(catalog, "db.kwidx", d)
    got = keyword_topk_from_table(idx, TERMS, pool=50).collect()
    want = _exact_channel(d, TERMS, 50).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_query_prunes_to_term_buckets(catalog, spark, sf_dir):
    d = _docs(spark, sf_dir)
    idx = keyword_index_table(catalog, "db.kwidx_p", d, n_buckets=16)
    buckets = sorted({term_bucket(t, 16) for t in TERMS})
    all_files = idx.new_scan().plan_files()
    pruned = idx.new_scan().filter(in_("bucket", buckets)).plan_files()
    assert len(pruned) < len(all_files)
    assert {t.file.partition["bucket"] for t in pruned} <= set(buckets)


def test_incremental_append_extends_results(catalog, spark, sf_dir):
    d = _docs(spark, sf_dir)
    first = d.filter("doc_id % 2 = 0")
    rest = d.filter("doc_id % 2 = 1")
    idx = keyword_index_table(catalog, "db.kwidx_a", first)
    n0 = int(idx.properties["kw.indexed-count"])
    keyword_index_append(idx, rest)
    idx.refresh()
    assert int(idx.properties["kw.indexed-count"]) == n0 + rest.count()
    got = keyword_topk_from_table(idx, TERMS, pool=50).collect()
    want = _exact_channel(d, TERMS, 50).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hybrid_rrf_with_kw_index_equals_exact(catalog, spark, sf_dir):
    d = _docs(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    idx = keyword_index_table(catalog, "db.kwidx_h", d)
    exact = hybrid_rrf_topk(d, e, TERMS, qv, k=10, pool=50)
    via_idx = hybrid_rrf_topk(None, e, TERMS, qv, k=10, pool=50,
                              kw_index=idx)
    assert [tuple(r) for r in via_idx.collect()] == \
        [tuple(r) for r in exact.collect()]


def test_empty_terms_rejected(catalog, spark, sf_dir):
    d = _docs(spark, sf_dir)
    idx = keyword_index_table(catalog, "db.kwidx_e", d.limit(10))
    with pytest.raises(ValueError, match="non-empty term"):
        keyword_topk_from_table(idx, ["", None], pool=5)


def test_index_survives_compaction(catalog, spark, sf_dir):
    """The inverted index is an ENGINE table, so the maintenance plane
    applies unchanged: rewrite_data_files compacts postings per bucket
    partition and query results are byte-identical after."""
    from linkedin_iceberg_spark.catalog.maintenance import (
        rewrite_data_files)

    d = _docs(spark, sf_dir)
    idx = keyword_index_table(catalog, "db.kwidx_c",
                              d.filter("doc_id % 2 = 0"), n_buckets=8)
    keyword_index_append(idx, d.filter("doc_id % 2 = 1"))
    idx.refresh()
    before = keyword_topk_from_table(idx, TERMS, pool=50).collect()
    n_before = len(idx._live_data_and_deletes()[0])
    rewrite_data_files(idx)
    idx.refresh()
    n_after = len(idx._live_data_and_deletes()[0])
    assert n_after < n_before
    # compaction preserves the bucket partitioning (pruning intact)
    assert all(e.data_file.partition.get("bucket") is not None
               for e in idx._live_data_and_deletes()[0])
    after = keyword_topk_from_table(idx, TERMS, pool=50).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]


def test_token_clustering_skips_files_within_bucket(catalog, spark,
                                                    sf_dir):
    """Postings cluster by token (write.sort-by) so the token predicate
    skips a bucket's non-covering FILES through min/max bounds — the
    second pruning level under the bucket partitions."""
    from linkedin_iceberg_spark.expressions import and_, in_

    d = _docs(spark, sf_dir)
    idx = keyword_index_table(catalog, "db.kwidx_t", d.limit(20),
                              n_buckets=2)
    # append the bulk with small target files so one bucket spans
    # several token-clustered files
    idx.update_properties(
        set_props={"write.target-max-records-per-file": "2000"})
    keyword_index_append(idx, d.subtract(d.limit(20)))
    idx.refresh()

    terms = ["spark"]
    b = [term_bucket("spark", 2)]
    bucket_only = idx.new_scan().filter(in_("bucket", b)).plan_files()
    with_token = idx.new_scan().filter(
        and_(in_("bucket", b), in_("token", terms))).plan_files()
    assert len(bucket_only) > 1  # the bucket really spans files
    assert len(with_token) < len(bucket_only)
    # and the query still answers exactly
    got = keyword_topk_from_table(idx, terms, pool=20).collect()
    want = _exact_channel(d, terms, 20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
