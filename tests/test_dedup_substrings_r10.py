"""dedup_substrings (Lee et al. 2022 ExactSubstr recipe) — r10.

Contract under test:
  * a >= k-token run repeated anywhere in the corpus is cut from every
    occurrence except the first (first-seen = smaller doc, then smaller
    start position) — at ANY offset, which aligned dedup_spans misses;
  * docs shorter than k tokens carry no windows and are kept whole;
  * a token is cut iff it is covered by some duplicated non-first
    window (self-overlapping repeats collapse to less than one full
    copy — the documented ExactSubstr approximation);
  * the generated DuckDB oracle replays the md5 pipeline bit-for-bit;
  * string ids order correctly (struct min, no arithmetic encoding).
"""

import pytest
from pyspark.sql import Row

from linkedin_iceberg_spark.operators.dedup import (
    dedup_spans,
    dedup_substrings,
    dedup_substrings_oracle_sql,
)

from conftest import assert_df_equals_oracle


def _run(spark, docs, k=4, **kw):
    out = dedup_substrings(spark.createDataFrame(docs), k=k, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_shifted_duplicate_cut_first_seen_wins(spark):
    docs = [
        Row(doc_id=1, text="a b c d e f g h"),   # first occurrence: whole
        Row(doc_id=2, text="x y a b c d e z"),   # shifted copy of a..e
        Row(doc_id=3, text="a b c d e f g h"),   # exact copy: emptied
        Row(doc_id=4, text="p q r"),             # < k tokens: kept whole
    ]
    out = _run(spark, docs, k=4)
    assert out[1]["clean_text"] == docs[0].text and out[1]["n_removed"] == 0
    # doc2: windows at p=2,3 duplicate doc1's -> positions 2..6 cut
    assert out[2]["clean_text"] == "x y z" and out[2]["n_removed"] == 5
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 8
    assert out[4]["clean_text"] == "p q r" and out[4]["n_removed"] == 0
    assert all(r["n_tokens"] == len(d.text.split())
               for r, d in zip((out[i] for i in (1, 2, 3, 4)), docs))


def test_aligned_span_dedup_misses_shifted_copy(spark):
    """The discriminator vs dedup_spans: a one-token shift escapes the
    aligned-window recipe but not the all-offset substring recipe."""
    docs = [Row(doc_id=1, text="a b c d e f g h"),
            Row(doc_id=2, text="x y a b c d e z")]
    spans_out = {r["doc_id"]: r for r in
                 dedup_spans(spark.createDataFrame(docs),
                             span_tokens=4).collect()}
    assert spans_out[2]["n_dropped"] == 0      # aligned windows: blind
    subs_out = _run(spark, docs, k=4)
    assert subs_out[2]["n_removed"] == 5       # substring windows: cut


def test_within_doc_repeat_and_self_overlap(spark):
    docs = [
        Row(doc_id=1, text="a b c d a b c d"),  # clean second half cut
        Row(doc_id=2, text="m m m m m m"),      # self-overlap collapses
    ]
    out = _run(spark, docs, k=4)
    assert out[1]["clean_text"] == "a b c d" and out[1]["n_removed"] == 4
    # windows p=1,2 duplicate p=0; covered 1..5 cut, first token survives
    assert out[2]["clean_text"] == "m" and out[2]["n_removed"] == 5


def test_adjacent_islands_merge_exact_coverage(spark):
    """Two separate repeated runs in one doc cut exactly their own
    positions — the gaps-and-islands merge neither bridges the gap nor
    leaks positions."""
    first = Row(doc_id=1, text="a b c d UNIQ1 w x y z")
    second = Row(doc_id=2, text="a b c d KEEP w x y z")
    out = _run(spark, [first, second], k=4)
    assert out[2]["clean_text"] == "KEEP" and out[2]["n_removed"] == 8


def test_string_ids_order_lexicographically(spark):
    docs = [Row(doc_id="beta", text="a b c d e"),
            Row(doc_id="alpha", text="a b c d e")]
    out = _run(spark, docs, k=5)
    assert out["alpha"]["n_removed"] == 0      # first-seen: 'alpha' < 'beta'
    assert out["beta"]["clean_text"] == ""


def test_xxhash64_mode_matches_md5_mode(spark, sf_dir):
    import os
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = dedup_substrings(df, k=8, hash_mode="md5").orderBy("doc_id")
    b = dedup_substrings(df, k=8, hash_mode="xxhash64").orderBy("doc_id")
    assert a.collect() == b.collect()


def test_k_guard(spark):
    with pytest.raises(ValueError):
        dedup_substrings(spark.range(1).selectExpr(
            "id AS doc_id", "'x' AS text"), k=1)


def test_oracle_replay_sf(spark, sf_dir):
    import os
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = dedup_substrings(df, k=8).orderBy("doc_id")
    assert_df_equals_oracle(out, dedup_substrings_oracle_sql(k=8),
                            sf_dir=sf_dir)
