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


def test_chunk_boundaries_and_overlap(spark):
    from linkedin_iceberg_spark.operators.text import chunk_documents
    df = _docs(spark, ["a b c d e f g h i j"])         # 10 tokens
    out = sorted(chunk_documents(df, max_tokens=4, overlap=0).collect(),
                 key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in out] == \
        ["a b c d", "e f g h", "i j"]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 2]
    # zero-overlap chunks reconstruct the document exactly
    assert " ".join(r["chunk_text"] for r in out) == "a b c d e f g h i j"
    # overlap: stride 2, each inner boundary repeats 2 tokens
    ov = sorted(chunk_documents(df, max_tokens=4, overlap=2).collect(),
                key=lambda r: r["chunk_id"])
    assert ov[0]["chunk_text"] == "a b c d"
    assert ov[1]["chunk_text"] == "c d e f"
    assert ov[-1]["chunk_text"].endswith("j")
    # short doc -> exactly one chunk
    one = chunk_documents(_docs(spark, ["x y"]), max_tokens=10).collect()
    assert len(one) == 1 and one[0]["chunk_text"] == "x y"
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_pack_sequences_concat_cut_rules(spark):
    from linkedin_iceberg_spark.operators.text import pack_sequences
    rows = [(i, n) for i, n in enumerate([100, 100, 60, 300, 10, 250])]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = {r["doc_id"]: r for r in
           pack_sequences(df, budget=256, order_col="doc_id",
                          count_col="n").collect()}
    # clamped stream: 100,100,60,256,10,250 -> starts 0,100,200,260,516,526
    assert out[0]["bin"] == 0 and out[0]["bin_tokens_before"] == 0
    assert not out[0]["spills_next_bin"]
    assert out[1]["bin"] == 0 and out[1]["bin_tokens_before"] == 100
    assert not out[1]["spills_next_bin"]
    # doc2 starts at offset 200 of bin 0 and its tail crosses the cut
    assert out[2]["bin"] == 0 and out[2]["bin_tokens_before"] == 200
    assert out[2]["spills_next_bin"]
    # oversize doc (300 clamped to 256) starts 4 into bin 1 and spills
    assert out[3]["bin"] == 1 and out[3]["bin_tokens_before"] == 4
    assert out[3]["spills_next_bin"]
    # starts 516, 526 -> bin 2
    assert out[4]["bin"] == 2 and out[4]["bin_tokens_before"] == 4
    assert out[5]["bin"] == 2 and out[5]["bin_tokens_before"] == 14
    assert out[5]["spills_next_bin"]
    # stream conservation: every first token lands in exactly one bin and
    # offsets stay inside the budget
    for r in out.values():
        assert 0 <= r["bin_tokens_before"] < 256


def test_pii_digit_run_inside_email_not_double_counted(spark):
    from linkedin_iceberg_spark.operators.text import pii_scrub
    df = _docs(spark, ["ref a@b1234567890.net end",
                       "plain 1234567890 run"])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    # the digit run is consumed by the email pass: no <NUM> is emitted,
    # so the audit count must be 0
    assert out[0]["n_emails"] == 1 and out[0]["n_longnums"] == 0
    assert "<NUM>" not in out[0]["scrubbed_text"]
    assert out[1]["n_longnums"] == 1
    assert out[1]["scrubbed_text"] == "plain <NUM> run"


def test_chunk_null_text_yields_one_empty_chunk(spark):
    from pyspark.sql import Row
    from linkedin_iceberg_spark.operators.text import chunk_documents
    df = spark.createDataFrame([Row(doc_id=0, text=None),
                                Row(doc_id=1, text="a b")])
    out = {r["doc_id"]: r for r in
           chunk_documents(df, max_tokens=5).collect()}
    assert set(out) == {0, 1}          # the NULL row is NOT dropped
    assert out[0]["chunk_text"] == ""


def test_dedup_spans_first_seen_wins(spark):
    from pyspark.sql import Row

    from linkedin_iceberg_spark.operators.dedup import dedup_spans
    boiler = " ".join(f"b{i}" for i in range(10))     # one exact span
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    docs = [
        Row(doc_id=1, text=boiler + " " + uniq("x")),  # first: keeps both
        Row(doc_id=2, text=boiler + " " + uniq("y")),  # boiler dropped
        Row(doc_id=3, text=boiler),                    # fully duplicated
        Row(doc_id=4, text=uniq("z") + " tail"),       # short last span kept
    ]
    out = {r["doc_id"]: r for r in
           dedup_spans(spark.createDataFrame(docs), span_tokens=10)
           .collect()}
    assert out[1]["clean_text"] == docs[0].text
    assert out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == uniq("y")
    assert out[2]["n_dropped"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_dropped"] == 1
    assert out[4]["clean_text"] == docs[3].text  # 'tail' span is unique
    assert sum(r["n_spans"] for r in out.values()) == 2 + 2 + 1 + 2


def test_lm_bigram_score_properties(spark):
    """Hand-checkable corpus: repeated fluent bigrams score higher than
    a gibberish doc of corpus-unseen-once bigrams; short docs get 0/0."""
    from linkedin_iceberg_spark.operators.text import lm_bigram_score

    rows = [(1, "the cat sat on the mat " * 5),
            (2, "the cat sat on the mat"),
            (3, "zq xv qj kw pz vy"),
            (4, "word"),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score_micro)
           for r in lm_bigram_score(df).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[4] == (0, 0) and got[5] == (0, 0)
    # doc 1/2 share the corpus-frequent bigrams; doc 3's are singletons
    assert got[1][1] > got[3][1]
    assert got[2][1] > got[3][1]
    # n_bigrams: doc 2 has 5 bigrams; doc 1 has 6*5-1=29 (space-joined)
    assert got[2][0] == 5 and got[1][0] == 29


def test_rocchio_classify_separable(spark):
    """A vocabulary-separable corpus classifies held-out docs to the
    right centroid; ties break to the smallest label; empty held-out
    docs land on the smallest-norm centroid; NULL-label train rows are
    dropped from training but the test split keeps its own labels."""
    from linkedin_iceberg_spark.operators.text import rocchio_classify

    rows = []
    # train ids: id % 5 != 0; class 'cat' uses cat-words, 'dog' dog-words
    for i in (1, 2, 3, 4, 6, 7):
        rows.append((i, "meow purr whiskers meow purr", "cat"))
    for i in (8, 9, 11, 12, 13, 14):
        rows.append((i, "bark woof fetch bark woof", "dog"))
    rows.append((16, "bark bark bark", None))   # NULL label: ignored
    # held-out (id % 5 == 0)
    rows.append((5, "meow whiskers purr purr", "cat"))
    rows.append((10, "woof fetch bark", "dog"))
    rows.append((15, "", "cat"))                # empty text
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in rocchio_classify(df).collect()}
    assert set(got) == {5, 10, 15}
    assert got[5].pred_label == "cat" and got[5].actual_label == "cat"
    assert got[10].pred_label == "dog"
    assert got[5].n_tokens == 4 and got[10].n_tokens == 3
    assert got[15].n_tokens == 0
    # empty doc: dist^2 = |m_c|^2, so the smaller-norm centroid wins;
    # both centroids here have equal norm by construction? no — counts
    # differ (5 vs 5 tokens per doc, 6 docs each) so norms tie and the
    # lexicographic tiebreak gives 'cat'
    assert got[15].pred_label == "cat"


def test_rocchio_classify_matches_brute_force(spark):
    """Property check on a pseudo-random corpus: the DataFrame plan's
    argmin equals a driver-side exact recomputation (python ints are
    arbitrary precision — validates the decimal(38,0) arithmetic)."""
    import hashlib
    from linkedin_iceberg_spark.operators.text import rocchio_classify

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(40):
        toks = [words[(i * 7 + j * 3) % len(words)]
                for j in range((i % 6) + 1)]
        rows.append((i, " ".join(toks), "L" + str(i % 3)))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.pred_label
           for r in rocchio_classify(df, n_features=8).collect()}

    def bucket(w):
        return int(hashlib.md5(f"v1-{w}".encode()).hexdigest()[:15],
                   16) % 8

    scale = 1_000_000
    feats, labels = {}, {}
    for i, text, lab in rows:
        v = {}
        for w in text.split():
            if w:
                v[bucket(w)] = v.get(bucket(w), 0) + 1
        feats[i], labels[i] = v, lab
    train = [i for i in feats if i % 5 != 0]
    cents = {}
    for lab in {labels[i] for i in train}:
        ids = [i for i in train if labels[i] == lab]
        s = {}
        for i in ids:
            for b, x in feats[i].items():
                s[b] = s.get(b, 0) + x
        cents[lab] = {b: (scale * c) // len(ids) for b, c in s.items()}
    for i in feats:
        if i % 5 != 0:
            continue
        best = min(
            ((sum((scale * feats[i].get(b, 0) - m.get(b, 0)) ** 2
                  for b in set(feats[i]) | set(m)), lab)
             for lab, m in cents.items()))
        assert got[i] == best[1], f"doc {i}"


def test_rocchio_classify_train_cap(spark):
    """train_per_class_cap bounds the training side deterministically:
    a huge cap equals uncapped, and a tiny cap still classifies a
    separable corpus (centroids from fewer rows, same argmin)."""
    from linkedin_iceberg_spark.operators.text import rocchio_classify

    rows = []
    for i in range(1, 40):
        if i % 5 == 0:
            continue
        lab = "cat" if i % 2 else "dog"
        rows.append((i, "meow purr" if lab == "cat" else "bark woof",
                     lab))
    rows += [(5, "meow meow purr", "cat"), (10, "woof bark", "dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    uncapped = {r.doc_id: r.pred_label
                for r in rocchio_classify(df).collect()}
    huge = {r.doc_id: r.pred_label
            for r in rocchio_classify(
                df, train_per_class_cap=10_000).collect()}
    assert huge == uncapped
    tiny = {r.doc_id: r.pred_label
            for r in rocchio_classify(
                df, train_per_class_cap=3).collect()}
    assert tiny[5] == "cat" and tiny[10] == "dog"
