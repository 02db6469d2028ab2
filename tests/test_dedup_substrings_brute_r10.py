"""dedup_substrings vs an INDEPENDENT brute-force reference — r10.

The registry oracle replays the distributed pipeline in DuckDB, which
proves portability but shares the algorithm.  This suite checks the
SEMANTICS against a naive O(docs x tokens x k) Python reference that
never heard of windows-as-hashes: for every k-token slice it records
the first (doc, pos) occurrence by direct tuple comparison and cuts
every covered position of every later occurrence.  Tiny alphabets and
short docs make duplicate windows dense, exercising island merging,
self-overlap, cross-doc ties, and sub-k tails far harder than the
handwritten cases."""

import random

from pyspark.sql import Row

from linkedin_iceberg_spark.operators.dedup import dedup_substrings


def _brute(docs, k):
    """docs: dict id -> text.  Returns id -> cleaned text."""
    toks = {i: t.split() for i, t in docs.items()}
    first = {}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - k + 1):
            w = tuple(tk[p:p + k])
            if w not in first or (i, p) < first[w]:
                first[w] = (i, p)
    out = {}
    for i, tk in toks.items():
        cover = set()
        for p in range(len(tk) - k + 1):
            if first[tuple(tk[p:p + k])] != (i, p):
                cover.update(range(p, p + k))
        out[i] = " ".join(t for j, t in enumerate(tk) if j not in cover)
    return out


def _fuzz_corpus(rng, n_docs, vocab, max_len):
    docs = {}
    for i in range(n_docs):
        n = rng.randrange(0, max_len + 1)
        words = [rng.choice(vocab) for _ in range(n)]
        # seed long verbatim repeats across docs too
        if docs and words and rng.random() < 0.5:
            src = docs[rng.choice(list(docs))].split()
            if src:
                lo = rng.randrange(len(src))
                hi = min(len(src), lo + rng.randrange(1, 12))
                at = rng.randrange(len(words) + 1)
                words[at:at] = src[lo:hi]
        docs[i] = " ".join(words)
    return docs


def test_matches_bruteforce_on_random_corpora(spark):
    rng = random.Random(20260816)
    for case in range(6):
        k = rng.choice([2, 3, 4])
        docs = _fuzz_corpus(rng, n_docs=rng.randrange(2, 7),
                            vocab=list("abcd"), max_len=24)
        want = _brute(docs, k)
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in docs.items()])
        mode = "md5" if case % 2 == 0 else "xxhash64"
        got = {r["doc_id"]: r["clean_text"]
               for r in dedup_substrings(df, k=k,
                                         hash_mode=mode).collect()}
        assert got == want, (case, k, mode, docs)


def test_bruteforce_dense_self_overlap(spark):
    """Worst case for island merging: one letter repeated — every
    window in every doc after the first position duplicates."""
    docs = {0: "a a a a a a a a a a", 1: "a a a a a", 2: "b a a a a b"}
    for k in (2, 3):
        want = _brute(docs, k)
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in docs.items()])
        got = {r["doc_id"]: r["clean_text"]
               for r in dedup_substrings(df, k=k).collect()}
        assert got == want, (k, want, got)
