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
