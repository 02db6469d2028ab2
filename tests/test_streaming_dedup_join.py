"""Streaming dedup (dropDuplicatesWithinWatermark) and the watermarked
stream-stream interval join, checked against their batch-SQL oracles.

Both queries replay/split their sources across micro-batches
(maxFilesPerTrigger=1), so state carry across batch boundaries — the
dedup key store, the join buffers — is what is actually under test.
"""

from conftest import assert_df_equals_oracle

from linkedin_iceberg_spark import queries as Q


def test_streaming_dedup_matches_distinct(spark, sf_dir):
    out = Q._REGISTRY["streaming_dedup"][0](spark, sf_dir)
    assert_df_equals_oracle(out, Q._REGISTRY["streaming_dedup"][1], sf_dir)


def test_stream_stream_join_matches_batch_join(spark, sf_dir):
    out = Q._REGISTRY["streaming_stream_join"][0](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # every match obeys the interval bound
    assert all(0 <= r.lag_us <= 6 * 3600 * 1_000_000 for r in rows)
    assert_df_equals_oracle(out, Q._REGISTRY["streaming_stream_join"][1],
                            sf_dir)


def test_incremental_dedup_first_seen_wins(spark):
    """dedup_decide against a growing index: exact copies are rejected,
    novel docs accepted, and a doc colliding only with a REJECTED doc is
    still rejected (rejected docs' signatures enter the index too)."""
    from pyspark.sql import Row
    from linkedin_iceberg_spark.streaming.incremental_dedup import (
        dedup_decide)

    def docs(rows):
        return spark.createDataFrame([Row(doc_id=i, text=t)
                                      for i, t in rows])

    empty = spark.createDataFrame([], "doc_id long, band int, sig long")
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different content about spark table formats here"
    d1, s1 = dedup_decide(docs([(0, a), (1, b)]), empty, shingle_n=3)
    assert {r["doc_id"]: r["accepted"] for r in d1.collect()} == \
        {0: True, 1: True}

    # batch 2: copy of a (reject), novel (accept), copy of the copy
    # (reject — via the rejected doc's signatures, same batch, lower id)
    idx = s1
    c = "novel text that matches nothing in the corpus at all surely"
    d2, s2 = dedup_decide(docs([(10, a), (11, c), (12, a)]), idx,
                          shingle_n=3)
    got = {r["doc_id"]: r["accepted"] for r in d2.collect()}
    assert got == {10: False, 11: True, 12: False}

    # batch 3 against the accumulated index: the batch-2 novel doc now
    # rejects its own copy
    idx2 = s1.union(s2)
    d3, _ = dedup_decide(docs([(20, c)]), idx2, shingle_n=3)
    assert d3.collect()[0]["accepted"] is False
