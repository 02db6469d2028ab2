"""Model-based randomized checks: chunk_documents and pack_sequences vs
pure-Python reference models over seeded random inputs (one Spark job per
parameter set — the model is the slow-but-obviously-right implementation)."""

import random

from pyspark.sql import Row

from linkedin_iceberg_spark.operators.text import (
    chunk_documents,
    pack_sequences,
)


def _model_chunks(tokens, max_tokens, overlap):
    stride = max_tokens - overlap
    out, start, cid = [], 0, 0
    while True:
        w = tokens[start:start + max_tokens]
        out.append((cid, " ".join(w), len(w)))
        if start + max_tokens >= len(tokens):
            break
        start += stride
        cid += 1
    return out


def _model_pack(sizes, budget):
    out, cum = [], 0
    for n in sizes:
        c = min(n, budget)
        b, off = divmod(cum, budget)
        out.append((b, off, off + c > budget))
        cum += c
    return out


def test_chunk_matches_model(spark):
    rng = random.Random(7)
    docs = []
    for i in range(120):
        n = rng.randint(1, 60)
        docs.append(Row(doc_id=i,
                        text=" ".join(f"w{rng.randint(0, 30)}"
                                      for _ in range(n))))
    df = spark.createDataFrame(docs)
    for max_tokens, overlap in [(8, 0), (8, 3), (5, 4), (64, 0)]:
        got = {}
        for r in chunk_documents(df, max_tokens, overlap).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"]))
        for d in docs:
            want = _model_chunks(d.text.split(" "), max_tokens, overlap)
            assert sorted(got[d.doc_id]) == want, \
                (max_tokens, overlap, d.doc_id)


def test_pack_matches_model(spark):
    rng = random.Random(11)
    sizes = [rng.randint(1, 400) for _ in range(300)]
    df = spark.createDataFrame(
        [Row(doc_id=i, n=n) for i, n in enumerate(sizes)])
    for budget in (64, 256, 1000):
        rows = sorted(pack_sequences(df, budget, order_col="doc_id",
                                     count_col="n").collect(),
                      key=lambda r: r["doc_id"])
        want = _model_pack(sizes, budget)
        got = [(r["bin"], r["bin_tokens_before"], r["spills_next_bin"])
               for r in rows]
        assert got == want, budget


def _model_spans(docs, span_tokens):
    """Pure-Python dedup_spans: first-seen-wins over fixed token windows."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.split()
        spans = [" ".join(toks[i:i + span_tokens])
                 for i in range(0, len(toks), span_tokens)]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        out[doc_id] = (" ".join(kept), len(spans), len(spans) - len(kept))
    return out


def test_dedup_spans_matches_model(spark):
    from linkedin_iceberg_spark.operators.dedup import dedup_spans
    rng = random.Random(77)
    # small vocab + shared boilerplate blocks force cross-doc collisions
    vocab = [f"w{i}" for i in range(12)]
    boiler = [" ".join(rng.choice(vocab) for _ in range(6))
              for _ in range(3)]
    docs = []
    for doc_id in range(40):
        parts = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.5:
                parts.append(rng.choice(boiler))
            else:
                parts.append(" ".join(rng.choice(vocab)
                                      for _ in range(rng.randint(1, 9))))
        docs.append((doc_id, " ".join(parts)))
    for span_tokens in (3, 6, 10):
        want = _model_spans(docs, span_tokens)
        df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
        got = {r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
               for r in dedup_spans(df, span_tokens=span_tokens).collect()}
        assert got == want, f"span_tokens={span_tokens}"
