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
