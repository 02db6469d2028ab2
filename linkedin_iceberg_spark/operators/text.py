"""Text analysis operators (SURVEY.md M7): language ID, quality scoring,
token counting, fingerprinting.  All built-in-function pipelines —
deterministic, UDF-free, safe at 100 TB."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (n-gram heuristic stand-in; a real
# deployment swaps in fastText — decode gated the same way)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "para"],
}


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: score = fraction of tokens in each
    language's stopword list; argmax wins, 'und' (undetermined) if no hits."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(F.array_distinct(toks), arr))
        scores.append(F.struct((hits / F.size(toks)).alias("score"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise("und")
         .alias("lang_pred"),
        F.round(best["score"], 4).alias("lang_score"))


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length band + token count + punctuation-ratio heuristic."""
    n_chars = F.length(text_col)
    n_tok = F.size(F.split(text_col, r"\s+"))
    punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9 ]", ""))
    score = (F.when((n_chars >= 100) & (n_chars <= 1000), 0.5).otherwise(0.0)
             + F.when(n_tok >= 20, 0.3).otherwise(0.0)
             + F.when((punct / n_chars) < 0.1, 0.2).otherwise(0.0))
    return df.select(F.col(id_col), F.round(score, 2).alias("quality"))


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic —
    the standard budget approximation when no tokenizer is available)."""
    ws = F.size(F.split(text_col, r"\s+"))
    bpe_ish = F.ceil(F.length(text_col) / 4).cast("long")
    return df.select(F.col(id_col), ws.alias("n_ws_tokens"),
                     bpe_ish.alias("n_bpe_est"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", n_minhash: int = 4) -> DataFrame:
    """Document fingerprint: xxhash64 of normalized text (exact-dup key)
    plus a compact 4-way shingle minhash (rolling-hash analog) for near-dup
    blocking."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.split(norm, " ")
    cols = [F.col(id_col), F.xxhash64(norm).alias("exact_fp")]
    for k in range(n_minhash):
        cols.append(
            F.array_min(F.transform(toks, lambda w: F.xxhash64(w, F.lit(k))))
            .alias(f"minhash{k}"))
    return df.select(*cols)


# GPT-2-style pre-tokenizer (public recipe), restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB/Go) support — no lookahead, explicit
# ASCII classes.  Contractions, optionally-space-prefixed letter runs,
# digit runs, punctuation runs.
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 weights: dict = None, out_col: str = "split",
                 salt: str = "v1") -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket.

    Each row lands in a split according to md5(salt || id) mod 100 against
    cumulative weight bands — reproducible across runs, engines, and
    repartitions (no RNG state), stable under appends (a row's split never
    changes), and re-derivable in plain SQL for verification.  Changing
    `salt` re-rolls the assignment — the standard dataset-versioning knob.
    Scale: one hash + CASE per row, no shuffle."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every split weight must be positive")
    from linkedin_iceberg_spark.operators.sampling import hash_bucket
    bucket = hash_bucket(id_col, salt, buckets=100)
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (Gopher-rule family): the
    fraction of duplicated lines and the token share of the most frequent
    word bigram.  Boilerplate-heavy and looping documents score high on
    both and are filtered before training.

    Scale: line stats are pure array functions (no shuffle); the bigram
    pass is posexplode -> lead -> two groupBys, every shuffle keyed by
    (doc_id[, bigram]) — never wider than the tokenized corpus, no
    all-pairs anywhere."""
    from pyspark.sql import Window

    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    ).otherwise(0.0)
    base = df.select(F.col(id_col),
                     F.round(dup_line_frac, 4).alias("dup_line_frac"),
                     n_lines.cast("long").alias("n_lines"),
                     F.split(F.col(text_col), " ").alias("_toks"))

    tok = base.select(id_col, F.posexplode("_toks").alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    big = (tok.withColumn("_nxt", F.lead("tok").over(w))
           .filter(F.col("_nxt").isNotNull())
           .select(id_col, F.concat_ws(" ", "tok", "_nxt").alias("bg")))
    counts = big.groupBy(id_col, "bg").count()
    top = (counts.groupBy(id_col)
           .agg(F.max("count").alias("_top"), F.sum("count").alias("_n"))
           .select(F.col(id_col),
                   F.round(F.col("_top") / F.col("_n"), 4)
                    .alias("top_bigram_frac")))
    return (base.drop("_toks")
            .join(top, on=id_col, how="left")
            .fillna({"top_bigram_frac": 0.0}))


# both patterns restricted to the Java-regex/RE2 common subset (no
# lookahead, explicit classes) so Spark and the SQL oracle agree exactly
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM_RE = r"[0-9]{9,}"


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails and long digit runs (phone/account-shaped) before
    training, keeping per-doc redaction counts for audit.  One JVM-side
    regex pass per pattern — no UDF, no shuffle."""
    after_email = F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(after_email, PII_LONGNUM_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), 0))
         .cast("long").alias("n_emails"),
        # count long-number redactions on the email-scrubbed text so the
        # audit counts match the <NUM> placeholders actually emitted (a
        # digit run INSIDE an email is consumed by the email pass)
        F.size(F.regexp_extract_all(after_email,
                                    F.lit(PII_LONGNUM_RE), 0))
         .cast("long").alias("n_longnums"),
        scrubbed.alias("scrubbed_text"))


def decontaminate(df: DataFrame, bench: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", ngram: int = 8) -> DataFrame:
    """Benchmark decontamination: drop every training document sharing at
    least one word ``ngram``-gram with a benchmark/eval document — the
    standard exact-substring overlap rule for eval-set leakage.

    Scale: each side explodes to DISTINCT (doc, shingle-hash) pairs and the
    overlap is a broadcast-or-shuffle anti-join on the 8-byte hashed
    shingle — never all-pairs, and the benchmark side (small by nature)
    broadcasts.  Documents shorter than ``ngram`` tokens carry no shingles
    and are always kept, matching the SQL-oracle semantics."""
    from linkedin_iceberg_spark.operators.dedup import shingles

    def sh(d):
        # docs shorter than ngram tokens produce no shingles (shingles()
        # would emit one truncated window for them — drop it so the rule
        # matches the oracle's empty range() exactly)
        return (d.filter(F.size(F.split(F.col(text_col), r"\s+")) >= ngram)
                .select(F.col(id_col),
                        F.explode(shingles(text_col, ngram)).alias("_s"))
                .filter(F.col("_s") != "")
                .select(id_col, F.xxhash64("_s").alias("_h"))
                .distinct())

    bench_h = sh(bench).select("_h").distinct()
    hit = (sh(df).join(F.broadcast(bench_h), "_h")
           .select(id_col).distinct())
    return df.join(hit, on=id_col, how="left_anti")


def bpe_pretokenize(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """BPE pre-tokenization counts: the merge step of a real BPE runs on
    these pre-tokens, so their count/uniqueness is the budget signal a
    training pipeline filters on.  JVM-side regexp_extract_all — one pass,
    no shuffle, no UDF; the identical RE2-compatible pattern runs in the
    SQL oracle."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_pretok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_pretok"),
        F.round(F.length(text_col) /
                F.greatest(F.size(toks), F.lit(1)), 4)
         .alias("chars_per_pretok"))


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split long documents into token-window chunks with optional overlap
    — the pre-tokenization chunking step every training/RAG pipeline runs
    before budgeted sequence assembly.

    Chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; the last chunk may be short; documents
    shorter than max_tokens yield exactly one chunk.  Output:
    (id, chunk_id, chunk_text, n_chunk_tokens), deterministic.

    Scale: tokens stay inside the row as an array; chunk windows are an
    index-range transform + explode — one projection chain, no shuffle,
    no UDF."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    # NULL text must not silently drop the row (posexplode over a NULL
    # starts array emits nothing): treat it as the empty document, which
    # yields one empty chunk like any other short doc
    toked = df.select(F.col(id_col),
                      F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                      .alias("_toks"))
    # chunk starts: 0, stride, 2*stride, ... while start < n (at least one)
    starts = F.expr(
        f"sequence(0, greatest(cast(ceil((size(_toks) - {max_tokens}) "
        f"/ {stride}.0) AS INT), 0) * {stride}, {stride})")
    chunks = (toked
              .select(id_col, "_toks",
                      F.posexplode(starts).alias("chunk_id", "_start"))
              .select(
                  F.col(id_col),
                  F.col("chunk_id").cast("long").alias("chunk_id"),
                  F.expr(f"slice(_toks, _start + 1, {max_tokens})")
                   .alias("_w")))
    return chunks.select(
        id_col, "chunk_id",
        F.concat_ws(" ", F.col("_w")).alias("chunk_text"),
        F.size("_w").cast("long").alias("n_chunk_tokens"))


def pack_sequences(df: DataFrame, budget: int, order_col: str,
                   count_col: str, id_col: str = "doc_id",
                   bin_col: str = "bin",
                   shard_col: Optional[str] = None) -> DataFrame:
    """Concat-and-cut sequence packing (the standard GPT-pretraining
    recipe): conceptually concatenate the rows' token streams in
    `order_col` order and cut every `budget` tokens.  Each row is
    assigned the bin where its FIRST token falls; `bin_tokens_before` is
    its offset inside that bin, and `spills_next_bin` marks rows whose
    tail crosses the cut (they are split across training sequences —
    exactly what concat-cut packing does to documents).  Rows larger
    than the budget are clamped to `budget` for stream accounting
    (truncate-to-context semantics).

    Deterministic and closed-form: everything derives from one running
    cumulative sum, so plain SQL replays it exactly.

    Scale: with `shard_col` (the 100 TB mode) each shard's stream packs
    INDEPENDENTLY — the window partitions on the shard key, so the
    cumulative sum runs as one parallel task per shard and bins are
    per-shard (identify a bin by (shard, bin)).  Without it the window
    is a single global stream: exact replay of one concatenated corpus
    order, but the cumulative sum funnels through ONE task — keep that
    mode for tests/small corpora.

    The frame is explicitly ROWS UNBOUNDED PRECEDING..CURRENT ROW:
    Spark's default for an ordered window is RANGE, under which rows
    with duplicate (order_col, id_col) keys become frame PEERS and each
    would receive the full peer-group sum — silently diverging from
    concat-cut semantics and the SQL oracle's ROWS frame."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window
    base = Window.partitionBy(shard_col) if shard_col is not None \
        else Window
    w = (base.orderBy(order_col, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    clamped = F.least(F.col(count_col), F.lit(budget))
    start = (F.sum(clamped).over(w) - clamped).cast("long")
    bin_id = F.floor(start / budget).cast("long")
    return (df.withColumn("_start", start)
            .withColumn(bin_col, bin_id)
            .withColumn("bin_tokens_before",
                        (F.col("_start") - F.col(bin_col) * budget)
                        .cast("long"))
            .withColumn("spills_next_bin",
                        (F.col("bin_tokens_before") + clamped)
                        > F.lit(budget))
            .drop("_start"))


def trigram_novelty(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    rare_max: int = 2,
                    broadcast_freq: bool = True) -> DataFrame:
    """Corpus-relative novelty signal: the fraction of a document's
    character trigrams that are RARE across the whole corpus (total
    corpus occurrences <= `rare_max`).  A high ratio flags gibberish,
    boilerplate-free noise, or genuinely novel text; a near-zero ratio
    flags template spam — the integer-exact stand-in for a KenLM-style
    perplexity filter (per-trigram log-probs don't replay across engines;
    rare-trigram counting does, bit for bit).

    Docs shorter than 3 chars have no trigrams and are dropped (contract
    shared with the SQL oracle).  Output: (id, n_tri, n_rare, rare_ratio)
    with the ratio rounded to 6 decimals of two exact integers.

    Scale: the trigram explode is ~len(text) rows per doc.  For ASCII-ish
    corpora the frequency table is bounded by |charset|^3 distinct keys
    and BROADCASTs (default), so exploded rows are never shuffled for
    the lookup; the only full shuffle is the per-doc re-aggregate on the
    id.  That bound does NOT hold for large-alphabet text — CJK corpora
    have effectively unbounded distinct trigrams — so pass
    ``broadcast_freq=False`` there to take a plain shuffled equi-join on
    the trigram key instead of an over-limit broadcast.  Two corpus
    scans total (one to count, one to score) either way."""
    if rare_max < 1:
        raise ValueError("rare_max must be >= 1")
    tri_arr = F.expr(
        f"transform(sequence(1, length({text_col}) - 2),"
        f" i -> substring({text_col}, i, 3))")
    tri = (df.filter(F.length(text_col) >= 3)
           .select(F.col(id_col), F.explode(tri_arr).alias("_tri")))
    freq = tri.groupBy("_tri").agg(F.count(F.lit(1)).alias("_c"))
    if broadcast_freq:
        freq = F.broadcast(freq)
    scored = (tri.join(freq, "_tri")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_tri"),
                   F.sum(F.when(F.col("_c") <= rare_max, 1).otherwise(0))
                   .alias("n_rare")))
    return scored.select(
        F.col(id_col),
        F.col("n_tri").cast("long").alias("n_tri"),
        F.col("n_rare").cast("long").alias("n_rare"),
        F.round(F.col("n_rare") / F.col("n_tri"), 6).alias("rare_ratio"))


def lm_bigram_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    scale: int = 1_000_000) -> DataFrame:
    """Corpus-trained bigram language-model quality score — the
    perplexity-filter lens of the CCNet/Gopher pipelines, self-trained
    so it needs no external model: add-one-smoothed bigram probabilities
    are estimated from the corpus itself, and each document scores the
    MEAN probability of its own bigrams (gibberish/boilerplate scores
    low against the corpus's own statistics, fluent text scores high).

    INTEGER-exact by construction (the house rule for cross-engine
    value checks): each bigram contributes
    ``floor(scale * (c(w1,w2)+1) / (c(w1)+V))`` with BIGINT ``DIV``, and
    the document score is the integer mean of those micro-probs — no
    float summation order anywhere, so a second engine replays the
    number bit-for-bit.  ``scale``*(max bigram count+1) must stay under
    2^63 (10^6 leaves room for ~9e12 occurrences of one bigram).

    Scale: one tokenize scan; bigrams via a per-document window (one
    shuffle on id); counts are map-side-combinable hash aggregations;
    the probability lookup joins per-DOC bigram counts (not occurrences)
    against the two count tables — hot-word skew on w1 is bounded by
    pre-aggregation and AQE's skew-join split.  V (distinct unigrams) is
    a 1-row broadcast.

    Returns (id, n_bigrams, lm_score_micro), one row per input document
    (documents with <2 tokens score 0 over 0 bigrams)."""
    from pyspark.sql import Window as W

    toks = (df.select(F.col(id_col),
                      F.posexplode(F.split(F.lower(F.col(text_col)),
                                           "[^a-z0-9]+"))
                      .alias("_p", "_w"))
            .filter(F.col("_w") != ""))
    uni = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c1"))
    vdf = uni.agg(F.count(F.lit(1)).alias("_V"))
    w = W.partitionBy(id_col).orderBy("_p")
    bi = (toks.select(F.col(id_col), F.col("_w").alias("_w1"),
                      F.lead("_w").over(w).alias("_w2"))
          .filter(F.col("_w2").isNotNull()))
    # per-document bigram multiplicity first: the count joins below see
    # one row per distinct (doc, w1, w2), not one per occurrence
    doc_bi = bi.groupBy(id_col, "_w1", "_w2") \
        .agg(F.count(F.lit(1)).alias("_m"))
    corpus_bi = doc_bi.groupBy("_w1", "_w2") \
        .agg(F.sum("_m").alias("_c2"))
    p_micro = F.expr(f"({scale}L * (_c2 + 1L)) DIV (_c1 + _V)")
    scored = (doc_bi.join(corpus_bi, ["_w1", "_w2"])
              .join(uni, F.col("_w1") == F.col("_w"))
              .crossJoin(F.broadcast(vdf))
              .groupBy(id_col)
              .agg(F.sum("_m").alias("_n"),
                   F.sum(F.col("_m") * p_micro).alias("_s")))
    ids = df.select(F.col(id_col))
    return (ids.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("_n"), F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce(F.expr("_s DIV _n"), F.lit(0)).cast("long")
                    .alias("lm_score_micro"))
            .orderBy(id_col))


def rocchio_classify(df: DataFrame, text_col: str = "text",
                     label_col: str = "lang", id_col: str = "doc_id",
                     n_features: int = 64, train_mod: int = 5,
                     test_residue: int = 0, scale: int = 1_000_000,
                     salt: str = "v1",
                     train_per_class_cap: Optional[int] = None
                     ) -> DataFrame:
    """Rocchio / nearest-class-centroid text classifier over hashed
    bag-of-words count features — the cheap supervised domain/quality
    filter of web-corpus pipelines (the linear stand-in for a fastText
    classifier), trained and applied wholly inside the engine.

    Rows with ``id % train_mod != test_residue`` train one centroid per
    label; held-out rows (``== test_residue``) are assigned the label of
    the nearest centroid under squared Euclidean distance.  Features are
    token counts hashed into ``n_features`` buckets with the house
    md5-bucket recipe (the ONE portable hash, shared with the samplers),
    so a second engine replays the exact feature vectors.

    INTEGER-exact end to end (the house rule): centroids are quantized
    to ``floor(scale * sum(x) / N_class)`` with BIGINT DIV; distances
    expand to ``X2 - 2*XM + M2`` computed in decimal(38,0) (Spark
    decimal arithmetic is exact to 38 digits; the oracle replays in
    HUGEINT) — no float anywhere, so the argmin is bit-stable across
    engines.  Ties break to the lexicographically smallest label.
    Magnitude bound: scale * per-doc-per-bucket count must stay well
    under 1e19 (1e6 scale leaves room for ~1e9-token documents); for
    unbounded corpora cap the training side per class (hash-ordered,
    `sampling.cap_per_group`) — a centroid estimate does not need
    millions of rows.

    Scale shape: one tokenize scan; per-(doc,bucket) counts are map-side
    combinable; the centroid table is labels x n_features rows (tiny,
    broadcast into the cross-term join); per-doc work is sparse (only
    the doc's own non-empty buckets).  No window over data-sized rows —
    the argmin window partitions by doc over |labels| rows.

    Returns (id, actual_label, pred_label, n_tokens), one row per
    held-out document (empty documents get the smallest-norm centroid).
    Training rows with a NULL label are dropped."""
    lbl = F.col(label_col)
    toks = (df.select(F.col(id_col), lbl.alias("_y"),
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+")).alias("_w"))
            .filter(F.col("_w") != ""))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("-"), F.col("_w"))),
        1, 15), 16, 10).cast("long") % n_features)
    feat = (toks.select(F.col(id_col), F.col("_y"), bucket.alias("_b"))
            .groupBy(id_col, "_y", "_b")
            .agg(F.count(F.lit(1)).alias("_x")))
    is_test = (F.col(id_col) % train_mod) == test_residue
    # class sizes from the BASE table: empty training documents are real
    # class members with zero vectors and pull the centroid to origin.
    # train_per_class_cap bounds the training side by DETERMINISTIC HASH
    # ORDER (the shared cap_per_group recipe) — the magnitude-bound knob
    # the docstring prescribes for unbounded corpora: a centroid
    # estimate does not need millions of rows, and the cap keeps
    # scale * N_class * count well inside decimal(38,0)
    train_docs = df.filter(~is_test).filter(lbl.isNotNull())
    if train_per_class_cap is not None:
        from linkedin_iceberg_spark.operators.sampling import (
            cap_per_group)
        train_docs = cap_per_group(train_docs, label_col,
                                   train_per_class_cap, id_col,
                                   salt=salt)
    train_ids = train_docs.select(id_col)
    n_c = (train_docs.groupBy(lbl.alias("_c"))
           .agg(F.count(F.lit(1)).alias("_n")))
    cent = (feat.join(train_ids, id_col, "left_semi")
            .groupBy(F.col("_y").alias("_c"), "_b")
            .agg(F.sum("_x").alias("_s"))
            .join(n_c, "_c")
            .select("_c", "_b",
                    F.expr(f"({scale}L * _s) DIV _n").alias("_m")))
    dec = "decimal(38,0)"
    m2 = cent.groupBy("_c").agg(
        F.sum(F.col("_m").cast(dec) * F.col("_m")).alias("_m2"))
    tf = feat.filter(is_test).select(
        id_col, "_b", (F.lit(scale) * F.col("_x")).alias("_sx"))
    x2 = tf.groupBy(id_col).agg(
        F.sum(F.col("_sx").cast(dec) * F.col("_sx")).alias("_x2"))
    xm = (tf.join(F.broadcast(cent), "_b")
          .groupBy(id_col, "_c")
          .agg(F.sum(F.col("_sx").cast(dec) * F.col("_m")).alias("_xm")))
    from pyspark.sql import Window as W
    base = df.filter(is_test).select(F.col(id_col), lbl.alias("_actual"))
    grid = (base.crossJoin(F.broadcast(m2))
            .join(x2, id_col, "left")
            .join(xm, [id_col, "_c"], "left"))
    d2 = (F.coalesce(F.col("_x2"), F.lit(0).cast(dec))
          - F.lit(2) * F.coalesce(F.col("_xm"), F.lit(0).cast(dec))
          + F.col("_m2"))
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(d2.asc(), F.col("_c").asc()))
    n_tok = feat.groupBy(id_col).agg(F.sum("_x").alias("_nt"))
    return (grid.withColumn("_rn", rn).filter(F.col("_rn") == 1)
            .join(n_tok, id_col, "left")
            .select(F.col(id_col),
                    F.col("_actual").alias("actual_label"),
                    F.col("_c").alias("pred_label"),
                    F.coalesce(F.col("_nt"), F.lit(0)).cast("long")
                    .alias("n_tokens"))
            .orderBy(id_col))
