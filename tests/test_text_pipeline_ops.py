"""Unit tests for the round-3 text-pipeline operators: repetition
signals, PII scrubbing, and benchmark decontamination."""

import pytest
from pyspark.sql import Row

from linkedin_iceberg_spark.operators.text import (
    decontaminate,
    pii_scrub,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def test_repetition_dup_lines_and_top_bigram(spark):
    df = _docs(spark, [
        "a b\na b\nc d",          # 1 dup line of 3 -> 1/3
        "x y x y x y x",          # 'x y' bigram 3 of 6 -> 0.5
        "unique words only here",  # no dup lines, all bigrams unique
        "",                        # empty doc
    ])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[0]["n_lines"] == 3
    assert out[1]["top_bigram_frac"] == pytest.approx(0.5, abs=1e-4)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] == 0.0


def test_pii_scrub_counts_and_text(spark):
    df = _docs(spark, [
        "mail a.b+c@example.co.uk now",
        "acct 1234567890 and 987654321 ok",   # 10- and 9-digit runs
        "short 12345678 is kept",              # 8 digits: below threshold
        "two mails x@y.io y@z.org",
    ])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_longnums"] == 0
    assert out[0]["scrubbed_text"] == "mail <EMAIL> now"
    assert out[1]["n_longnums"] == 2
    assert out[1]["scrubbed_text"] == "acct <NUM> and <NUM> ok"
    assert out[2]["n_longnums"] == 0
    assert "12345678" in out[2]["scrubbed_text"]
    assert out[3]["n_emails"] == 2
    assert out[3]["scrubbed_text"] == "two mails <EMAIL> <EMAIL>"


def test_decontaminate_overlap_rule(spark):
    corpus = _docs(spark, [
        "one two three four five six",    # exact copy of bench doc
        "zz one two three four five six yy",  # contains the bench 6-gram
        "totally different words in this document here",
        "one two three four five",        # only a 5-gram prefix: kept
        "tiny doc",                        # shorter than ngram: kept
    ])
    bench = _docs(spark, ["one two three four five six"])
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, ngram=6).collect())
    assert kept == [2, 3, 4]


def test_decontaminate_short_docs_never_match(spark):
    corpus = _docs(spark, ["a b c", "a b c d e f g h"])
    bench = _docs(spark, ["a b c"])   # bench doc shorter than ngram
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, ngram=6).collect())
    # bench has no 6-grams, so nothing can be contaminated
    assert kept == [0, 1]
