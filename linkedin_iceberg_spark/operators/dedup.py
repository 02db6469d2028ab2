"""Deduplication operators for large-scale training-data pipelines.

All shuffles are on compact keys (hashes / bucket ids), never full text.
All hashing is Spark-built-in xxhash64 / hash (JVM-side, codegen'd) so every
operator is deterministic and UDF-free — the 100 TB hot path stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Widen narrow inputs before CPU-heavy per-row stages (shingling,
    hashing).  Small-file scans can arrive as 1-2 partitions, serializing
    the whole shingle pipeline on one core; repartitioning those to the
    cluster's default parallelism is a cheap shuffle of raw rows.  At scale
    this is a NO-OP: a 100 TB scan already has thousands of partitions, so
    the guard never triggers and no text is ever shuffled.

    The probe is `inputFiles()` (a driver-side file-list of the
    analyzed plan) first — `df.rdd.getNumPartitions()` builds the full
    physical plan plus a Python RDD bridge, pure driver overhead on hot
    paths — and falls back to the RDD probe only for non-file-backed
    inputs, where the file list is blind.  Files under-count partitions
    when a file splits (maxPartitionBytes), so the guard can repartition
    a few-big-files input unnecessarily — one cheap raw-row shuffle, and
    impossible in the at-scale regime (files >> cores)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_inputs = len(df.inputFiles())
    except Exception:
        n_inputs = 0
    if n_inputs == 0:
        # not file-backed (in-memory, post-shuffle/join lineage): the
        # cheap probe is blind here — pay the RDD-conversion probe once
        # rather than force a full raw-row shuffle on an input that may
        # already be wide
        n_inputs = df.rdd.getNumPartitions()
    if n_inputs < target:
        return df.repartition(target)
    return df


def dedup_exact(df: DataFrame, cols: list, id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group.
    Scale: group on xxhash64(cols) to shuffle 8-byte keys, then resolve the
    (vanishingly rare) hash collisions within groups by exact compare."""
    h = F.xxhash64(*cols)
    w = W.partitionBy(h, *cols).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def shingles(col, n: int = 3):
    """Word n-gram shingles of a text column as an array<string>."""
    toks = F.split(col, r"\s+")
    # sliding windows via transform over index range
    return F.expr(
        f"transform(sequence(0, greatest(size(split({_c(col)}, '\\\\s+')) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(split({_c(col)}, '\\\\s+'), i + 1, {n})))"
    )


def _c(col) -> str:
    """Column -> SQL string (only used for expr() composition on plain names)."""
    if isinstance(col, str):
        return col
    return col._jc.toString()  # pragma: no cover


def minhash_lsh_candidates(df: DataFrame, text_col: str, id_col: str,
                           num_hashes: int = 32, bands: int = 8,
                           shingle_n: int = 3,
                           hash_mode: str = "xxhash64") -> DataFrame:
    """MinHash + LSH banding: near-duplicate candidate pairs.

    Pipeline (all built-in functions):
      1. shingle: word n-grams                       (no shuffle)
      2. K minhashes: min over xxhash64(shingle, k)  (no shuffle)
      3. B bands of R=K/B rows; band signature hash  (no shuffle)
      4. self-join on (band_id, band_hash)           (the ONLY shuffle;
         keys are 16 bytes — at 100 TB this is the textbook LSH join)
    Returns (d1, d2, n_shared_bands) candidate pairs, d1 < d2.

    hash_mode: "xxhash64" (default — fastest JVM hash) or "md5" (60-bit
    md5-hex prefixes for the token hash, the K seeded streams, and the
    band signature: every stage is expressible in ANSI SQL, so a second
    engine can recompute the EXACT candidate set — see
    minhash_oracle_sql; same pattern as simhash's portable mode)."""
    banded = minhash_band_signatures(df, text_col, id_col, num_hashes,
                                     bands, shingle_n, hash_mode)
    # materialize the banded signatures ONCE (lazy local checkpoint, ~B
    # rows/doc of ~20 bytes) before self-joining: without it the planner
    # computes the whole tokenize+hash pipeline TWICE — once per join
    # side, one of them under a BroadcastExchange where no exchange reuse
    # can fire (r11; same build-once discipline as
    # runtime_filter.py's checkpointed dim side).  At scale this trades a
    # doc-count-sized local write for a second full corpus scan+hash.
    #
    # Recovery trade (documented r12): localCheckpoint truncates lineage
    # into EXECUTOR-LOCAL storage — on a cluster, losing an executor after
    # materialization makes its partitions unrecoverable and fails the job
    # where a persist() would recompute.  persist() was evaluated and
    # REJECTED here: Spark's CacheManager keys cached data on the
    # CANONICALIZED PLAN, so a second invocation of the same query in one
    # session would silently serve the first invocation's rows instead of
    # recomputing — result caching across runs, which this engine's
    # benchmarking/oracle contract forbids (and unpersist() has no sound
    # call site: the operator returns a lazy plan whose consumer decides
    # when, or whether, to execute it).  Deployments with executor churn
    # should prefer retry-on-failure of this single-job pipeline over
    # plan-level caching.  Plan-contract note: the checkpoint truncates
    # the visible plan, so audits cannot see PushedFilters below it for
    # this path (tools/explain_audit.py keeps this query's scan-side
    # assertions out of its contract for that reason).
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    bb = banded.alias("bb")
    pairs = (a.join(bb, (F.col("a.band") == F.col("bb.band"))
                    & (F.col("a.sig") == F.col("bb.sig"))
                    & (F.col(f"a.{id_col}") < F.col(f"bb.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("d1"),
                      F.col(f"bb.{id_col}").alias("d2"))
             .agg(F.count("*").alias("n_shared_bands")))
    return pairs.orderBy("d1", "d2")


def minhash_band_signatures(df: DataFrame, text_col: str, id_col: str,
                            num_hashes: int = 32, bands: int = 8,
                            shingle_n: int = 3,
                            hash_mode: str = "xxhash64") -> DataFrame:
    """Stages 1-3 of the MinHash-LSH pipeline as a reusable unit: per-doc
    banded signatures (id, band, sig).  minhash_lsh_candidates self-joins
    them; the incremental-dedup path PERSISTS them as the corpus index and
    joins each new batch against it (see streaming/incremental_dedup.py).
    ZERO shuffles: each document's K minhashes are row-local folds
    (array_min over a transform of the shingle-hash array), so the whole
    signature build lives in the scan's stage — r11 replaced the
    explode + K-min-buffer groupBy (one full (id, hash) shuffle plus
    hash-agg machinery) with per-row array expressions; values are
    bit-identical (min over a doc's shingle set == array_min over the
    same array), proven by an exhaustive store/live set compare on sf0.1
    for both hash modes.  Output is B rows per doc of ~20 bytes — the
    index is corpus-sized in docs, not tokens.  (r12: a single-pass
    K-accumulator aggregate() fold was measured and REJECTED — see the
    inline note below.)"""
    rows_per_band = num_hashes // bands
    # tokenize ONCE into an array column, then window over it — keeps the
    # split out of the per-element lambda
    toked = _ensure_parallelism(df).select(
        id_col, F.split(F.col(text_col), r"\s+").alias("_toks"))
    if hash_mode == "md5":
        # portable mode: shingle STRINGS, hashed with md5 — every stage
        # expressible in ANSI SQL (see minhash_banded_cte_sql).  The
        # (possibly long) shingle string is hashed exactly once into _hs;
        # the K minhash streams re-hash the 8-byte value with the seed —
        # O(1) per stream instead of a full string hash per stream
        sh_arr = F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {shingle_n}, 0)),"
            f" i -> concat_ws(' ', slice(_toks, i + 1, {shingle_n})))")
        hs = F.expr(
            "transform(filter(_sh_arr, s -> length(s) > 0),"
            " s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))")
        base = (toked.withColumn("_sh_arr", sh_arr)
                .withColumn("_hs", hs)
                # docs with no non-empty shingle produced no groupBy row
                # in the pre-r11 shape; keep exactly that document set
                .filter(F.size("_hs") > 0))
        minhash_cols = [
            f"array_min(transform(_hs, h -> cast(conv(substring(md5("
            f"concat_ws('-', cast(h as string), '{k}')), 1, 15), 16, 10)"
            f" as bigint))) AS mh{k}"
            for k in range(num_hashes)]
    else:
        # fast mode: hash each window DIRECTLY from its token elements
        # (multi-arg xxhash64) — no shingle-string concat_ws allocation.
        # try_element_at: documents SHORTER than shingle_n still produce
        # their one (padded) window — element_at would throw
        # INVALID_ARRAY_INDEX under ANSI mode (Spark 4 default); xxhash64
        # skips the NULLs, hashing the tokens that exist.
        # No array_distinct: min over duplicates == min over distinct,
        # and skipping the per-row hash-set build is cheaper than the
        # (rare) duplicate-window re-hash it would save
        els = ", ".join(f"try_element_at(_toks, i + {j + 1})"
                        for j in range(shingle_n))
        sh_arr = F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {shingle_n}, 0)),"
            f" i -> xxhash64({els}))")
        base = (toked
                .filter("size(_toks) > 0 and "
                        "not (size(_toks) = 1 and _toks[0] = '')")
                .withColumn("_hs", sh_arr))
        minhash_cols = [
            f"array_min(transform(_hs, h -> xxhash64(h, {k}))) AS mh{k}"
            for k in range(num_hashes)]
    # K separate array_min(transform(...)) projections DELIBERATELY (r12
    # measured the alternative): a single-pass
    # aggregate(_hs, array_repeat(MaxLong, K), (acc, h) -> zip_with(acc,
    # seeds, (a, s) -> least(a, hash))) fold computes bit-identical
    # signatures and looked ~15% faster at sf0.1 — but that win was
    # DRIVER PLANNING time (one expression vs K); at 10x data the fold
    # is 10-15% SLOWER per row (zip_with allocates a fresh K-element
    # array per shingle element, where each transform runs a tight
    # single-lambda loop over a primitive array).  Execution cost rules
    # at 100 TB, so the per-stream shape stays.
    # string expressions + ONE selectExpr per stage: building K Column
    # objects costs ~3 py4j round-trips each (r11 driver profile: ~0.3 s
    # of the headline LSH query was expression construction); a single
    # parse call is one round-trip for the whole projection — same plan,
    # same values (see similarity._bucket_sql for the same discipline)
    sigs = base.selectExpr(f"`{id_col}`", *minhash_cols)

    # band signatures: inline() the per-band structs in one projection
    band_structs = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        if hash_mode == "md5":
            cat = ", ".join(f"cast({c} as string)" for c in cols)
            sig = (f"cast(conv(substring(md5(concat_ws('-', {cat})), 1, 15),"
                   f" 16, 10) as bigint)")
        else:
            sig = f"xxhash64({', '.join(cols)})"
        band_structs.append(f"struct({b} AS band, {sig} AS sig)")
    return sigs.selectExpr(
        f"`{id_col}`", f"inline(array({', '.join(band_structs)}))")


def minhash_lsh_verified(df: DataFrame, text_col: str, id_col: str,
                         threshold: float = 0.9, num_hashes: int = 32,
                         bands: int = 16, shingle_n: int = 1) -> DataFrame:
    """MinHash-LSH candidates with EXACT Jaccard verification.

    The standard two-stage near-dup pipeline: banded LSH proposes candidate
    pairs (the only shuffle is the band-bucket self-join), then each
    candidate's true shingle-set Jaccard is computed and pairs below
    `threshold` are dropped.  With r = num_hashes/bands rows per band, a
    pair at similarity s is missed with probability (1 - s^r)^bands — at
    the defaults (r=2, b=16) and s >= 0.9 that is < 4e-12, so the output
    equals the exact all-pairs result and is verifiable against a plain
    SQL oracle.  Scale: verification touches only candidate pairs, never
    all pairs.

    Returns (d1, d2, jaccard) with jaccard rounded to 4 places."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands,
                                  shingle_n).select("d1", "d2")
    df = _ensure_parallelism(df)
    if shingle_n == 1:
        tok = (df.select(F.col(id_col),
                         F.explode(F.array_distinct(
                             F.split(F.col(text_col), r"\s+"))).alias("_w"))
               .filter(F.length("_w") > 0))
    else:
        toked = df.select(id_col,
                          F.split(F.col(text_col), r"\s+").alias("_toks"))
        sh_arr = F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {shingle_n}, 0)), "
            f"i -> concat_ws(' ', slice(_toks, i + 1, {shingle_n})))")
        tok = (toked.select(id_col,
                            F.explode(F.array_distinct(sh_arr)).alias("_w"))
               .filter(F.length("_w") > 0))
    cnt = tok.groupBy(id_col).agg(F.count("*").alias("n"))
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (cand.join(ta, F.col("d1") == F.col(f"ta.{id_col}"))
             .join(tb, (F.col("d2") == F.col(f"tb.{id_col}"))
                   & (F.col("ta._w") == F.col("tb._w")))
             .groupBy("d1", "d2").agg(F.count("*").alias("i")))
    c1, c2 = cnt.alias("c1"), cnt.alias("c2")
    jac = (inter.join(c1, F.col("d1") == F.col(f"c1.{id_col}"))
           .join(c2, F.col("d2") == F.col(f"c2.{id_col}"))
           .withColumn("_j", F.col("i")
                       / (F.col("c1.n") + F.col("c2.n") - F.col("i"))))
    return (jac.filter(F.col("_j") >= threshold)
            .select("d1", "d2", F.round("_j", 4).alias("jaccard"))
            .orderBy("d1", "d2"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 6, n_segments: int = 4,
                  hash_mode: str = "xxhash64") -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole principle.

    64-bit simhash = sign(sum of ±1 per bit over token hashes).  Any pair
    within `max_hamming` (< n_segments) must agree on >= 1 of the
    `n_segments` 16-bit segments -> join only on segment equality.
    Scale: the join key is (segment_idx, 16-bit value) — tiny shuffle.

    hash_mode: "xxhash64" (default — fastest JVM hash) or "md5" (60-bit
    prefix of md5 hex; bit-identical recipe is expressible in ANSI SQL so
    an independent engine can recompute the whole pipeline — see
    simhash_oracle_sql).  Both stay in whole-stage codegen."""
    if hash_mode == "md5":
        # top 15 hex chars -> 60-bit non-negative long; bits 60-63 then
        # always vote negative, so the fingerprint is effectively 60-bit on
        # both engines
        token_hash = F.conv(F.substring(F.md5(F.col("_w")), 1, 15),
                            16, 10).cast("long")
    else:
        token_hash = F.xxhash64("_w")
    toks = (_ensure_parallelism(df).select(id_col, F.explode(
        F.array_distinct(F.split(text_col, r"\s+"))).alias("_w"))
        .filter(F.length("_w") > 0)
        .withColumn("_h", token_hash))

    # per-bit vote: +1 if bit set else -1; simhash bit = vote > 0
    bit_cols = [
        F.sum(F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"v{i}")
        for i in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*bit_cols)
    sim = F.lit(0).cast("long")
    for i in range(64):
        # shiftleft handles bit 63 (two's-complement) — a 1<<63 literal
        # would overflow a long
        sim = sim + F.when(F.col(f"v{i}") > 0,
                           F.shiftleft(F.lit(1).cast("long"), i)) \
            .otherwise(F.lit(0).cast("long"))
    fp = votes.select(id_col, sim.alias("simhash"))

    seg_width = 64 // n_segments
    segs = []
    for s in range(n_segments):
        segs.append(F.struct(
            F.lit(s).alias("seg"),
            F.shiftrightunsigned(F.col("simhash"), s * seg_width)
             .bitwiseAND(F.lit((1 << seg_width) - 1)).alias("segval")))
    seg_df = (fp.select(id_col, "simhash",
                        F.explode(F.array(*segs)).alias("s"))
              .select(id_col, "simhash", F.col("s.seg").alias("seg"),
                      F.col("s.segval").alias("segval")))

    a = seg_df.alias("a")
    b = seg_df.alias("b")
    cand = (a.join(b, (F.col("a.seg") == F.col("b.seg"))
                   & (F.col("a.segval") == F.col("b.segval"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("d1"),
                    F.col(f"b.{id_col}").alias("d2"),
                    F.col("a.simhash").alias("h1"),
                    F.col("b.simhash").alias("h2"))
            .distinct())
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int")
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("d1", "d2", "hamming")
            .orderBy("d1", "d2"))


def minhash_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       bands: int = 8, shingle_n: int = 3) -> str:
    """ANSI-SQL equivalent of minhash_lsh_candidates(hash_mode="md5") with
    every stage INLINED — an independent engine (DuckDB) recomputes the
    shingling, the 60-bit md5 token hash, all K seeded minhash streams,
    the band signatures, and the bucket self-join, value-checking the
    EXACT candidate set (not just Jaccard-verified survivors)."""
    prefix = minhash_banded_cte_sql(table, text_col, id_col, num_hashes,
                                    bands, shingle_n)
    return f"""{prefix}
SELECT a.{id_col} AS d1, b.{id_col} AS d2, count(*) AS n_shared_bands
FROM banded a JOIN banded b
  ON a.band = b.band AND a.sig = b.sig AND a.{id_col} < b.{id_col}
GROUP BY 1, 2 ORDER BY d1, d2"""


def minhash_banded_cte_sql(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 8, shingle_n: int = 3,
                           recursive: bool = False) -> str:
    """The shared ``WITH ... banded`` CTE chain (shingle -> 60-bit md5 hash
    -> K seeded minhash streams -> band signatures) WITHOUT a final SELECT,
    so every oracle that needs band signatures (the candidate-pair oracle
    above, streaming/incremental_dedup's accept-decision replay) composes
    from one copy instead of splicing each other's SQL text."""
    mins = ",\n    ".join(
        f"MIN(('0x' || substr(md5(h::VARCHAR || '-' || '{k}'), 1, 15))"
        f"::BIGINT) AS mh{k}"
        for k in range(num_hashes))
    rows_per_band = num_hashes // bands
    sig_cases = []
    for b in range(bands):
        cols = " || '-' || ".join(
            f"mh{b * rows_per_band + r}::VARCHAR"
            for r in range(rows_per_band))
        sig_cases.append(f"WHEN {b} THEN ('0x' || substr(md5({cols}), 1, 15))"
                         f"::BIGINT")
    sig_case = "CASE b.band\n    " + "\n    ".join(sig_cases) + "\n    END"
    with_kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"""
{with_kw} toks AS (
  SELECT {id_col}, string_split_regex({text_col}, '\\s+') AS tk
  FROM {table}
), pos AS (
  SELECT {id_col}, tk,
         unnest(range(1, greatest(len(tk) - {shingle_n} + 1, 1) + 1)) AS p
  FROM toks
), sh AS (
  SELECT DISTINCT {id_col},
         array_to_string(tk[p : p + {shingle_n} - 1], ' ') AS s
  FROM pos
), hashed AS (
  SELECT {id_col}, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM sh WHERE length(s) > 0
), sigs AS (
  SELECT {id_col},
    {mins}
  FROM hashed GROUP BY {id_col}
), banded AS (
  SELECT {id_col}, b.band,
         {sig_case} AS sig
  FROM sigs, (SELECT unnest(range({bands})) AS band) b
)"""


def dedup_embedding(df: DataFrame, threshold: float = 0.4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 6, n_tables: int = 8,
                    dim: int = None) -> DataFrame:
    """Embedding-cosine near-duplicate dedup: the full keep-one-per-cluster
    pipeline over an array<float> embedding column.

      1. candidates: multi-table random-hyperplane LSH — pairs are proposed
         only within sign-buckets (ann_lsh_candidates), never all-pairs;
      2. verify: exact cosine on candidate pairs only, keep >= threshold;
      3. group: connected components (large-star/small-star) turns verified
         PAIRS into near-dup CLUSTERS via transitivity;
      4. decide: one representative per cluster — the minimum id.

    Returns (id_col, group_id, is_kept) for EVERY input row: group_id is
    the cluster's min id (own id for singletons), is_kept is 1 for the
    representative else 0 — downstream keeps `is_kept = 1`.

    Scale: stages 1-2 shuffle on small keys (bucket ints / id pairs);
    stage 3 is the O(log^2 n) star algorithm; nothing is ever quadratic in
    the corpus.  Recall is the standard multi-table LSH bound: a pair at
    angle θ survives with 1-(1-p^P)^T, p = 1-θ/π (P planes, T tables).
    Deterministic planes -> the whole pipeline is SQL-reproducible
    (dedup_embedding_oracle_sql)."""
    from linkedin_iceberg_spark.operators.graph import connected_components
    from linkedin_iceberg_spark.operators.similarity import (
        _dot, _norm, ann_lsh_candidates)

    cand = (ann_lsh_candidates(df, n_planes=n_planes, id_col=id_col,
                               vec_col=vec_col, dim=dim, n_tables=n_tables)
            .select("v1", "v2").distinct())
    a = df.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("_e1"))
    b = df.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("_e2"))
    cos = _dot(F.col("_e1"), F.col("_e2")) / (_norm(F.col("_e1"))
                                              * _norm(F.col("_e2")))
    verified = (cand.join(a, "v1").join(b, "v2")
                .filter(cos >= threshold).select("v1", "v2"))

    comp = connected_components(verified, "v1", "v2")
    ids = df.select(F.col(id_col))
    joined = ids.join(comp, ids[id_col] == comp["id"], "left")
    group = F.coalesce(F.col("component"), F.col(id_col)).cast("long")
    return (joined.select(
        F.col(id_col),
        group.alias("group_id"),
        F.when(group == F.col(id_col), F.lit(1)).otherwise(F.lit(0))
         .cast("long").alias("is_kept"))
        .orderBy(id_col))


def dedup_embedding_oracle_sql(dim: int, threshold: float = 0.4,
                               n_planes: int = 6, n_tables: int = 8,
                               table: str = "embeddings",
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> str:
    """ANSI-SQL (DuckDB) equivalent of dedup_embedding with the plane
    constants INLINED: an independent engine recomputes bucketing,
    candidate generation, cosine verification, the transitive closure
    (recursive CTE) and the keep-decision — the entire pipeline is
    value-checked, not just row-counted."""
    from linkedin_iceberg_spark.operators.similarity import (
        _deterministic_planes, _table_seed)

    buckets, unions = [], []
    for t in range(n_tables):
        planes = _deterministic_planes(dim, n_planes, seed=_table_seed(t))
        terms = []
        for i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product({vec_col}::DOUBLE[], {lit})"
                f" >= 0 THEN {1 << i} ELSE 0 END)")
        buckets.append(f"b{t} AS (SELECT {id_col}, "
                       f"{' + '.join(terms)} AS bucket FROM {table})")
        unions.append(
            f"SELECT a.{id_col} AS v1, b.{id_col} AS v2 FROM b{t} a "
            f"JOIN b{t} b ON a.bucket = b.bucket "
            f"AND a.{id_col} < b.{id_col}")
    buckets_sql = ",\n".join(buckets)
    unions_sql = " UNION ".join(unions)
    return f"""
WITH RECURSIVE
{buckets_sql},
cand AS ({unions_sql}),
verified AS (
  SELECT c.v1, c.v2
  FROM cand c
  JOIN {table} x ON x.{id_col} = c.v1
  JOIN {table} y ON y.{id_col} = c.v2
  WHERE list_cosine_similarity(x.{vec_col}::DOUBLE[],
                               y.{vec_col}::DOUBLE[]) >= {threshold}
),
edges AS (
  SELECT v1 AS src, v2 AS dst FROM verified
  UNION
  SELECT v2, v1 FROM verified
),
walk (id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.lab
),
comp AS (SELECT id, min(lab) AS component FROM walk GROUP BY id)
SELECT e.{id_col},
       CAST(coalesce(c.component, e.{id_col}) AS BIGINT) AS group_id,
       CAST(CASE WHEN coalesce(c.component, e.{id_col}) = e.{id_col}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM {table} e LEFT JOIN comp c ON c.id = e.{id_col}
ORDER BY e.{id_col}"""


def simhash_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 6,
                       n_segments: int = 4) -> str:
    """ANSI-SQL equivalent of simhash_pairs(hash_mode="md5") with the
    per-bit vote recipe INLINED — an independent engine (DuckDB) recomputes
    tokenization, the 60-bit md5 token hash, all bit votes, the fingerprint,
    the pigeonhole segment join and the hamming filter, giving the simhash
    path a real value-level oracle (same pattern as ann_lsh_oracle_sql)."""
    n_bits = 60  # md5-prefix hash is 60-bit; bits 60-63 always vote negative
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(n_bits))
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits))
    seg_width = 64 // n_segments
    seg_ids = ", ".join(str(s) for s in range(n_segments))
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_col}, unnest(string_split_regex({text_col}, '\\s+'))
           AS tok
  FROM {table}
), hashed AS (
  SELECT {id_col}, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM toks WHERE length(tok) > 0
), votes AS (
  SELECT {id_col},
    {votes}
  FROM hashed GROUP BY {id_col}
), fp AS (
  SELECT {id_col}, {fp} AS simhash FROM votes
), segs AS (
  SELECT {id_col}, simhash, s.seg,
         (simhash >> (s.seg * {seg_width})) & {(1 << seg_width) - 1}
           AS segval
  FROM fp, (SELECT unnest([{seg_ids}]) AS seg) s
), cand AS (
  SELECT DISTINCT a.{id_col} AS d1, b.{id_col} AS d2,
         a.simhash AS h1, b.simhash AS h2
  FROM segs a JOIN segs b
    ON a.seg = b.seg AND a.segval = b.segval AND a.{id_col} < b.{id_col}
)
SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= {max_hamming}
ORDER BY d1, d2"""


def dedup_spans(df: DataFrame, span_tokens: int = 10,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide EXACT span deduplication (the C4/RefinedWeb recipe,
    adapted to fixed windows): split every document into consecutive
    `span_tokens`-token spans, drop every span whose exact text already
    occurred earlier in the corpus (first-seen wins — earlier doc, or
    earlier span of the same doc), and reassemble the surviving text.
    Catches boilerplate the near-dup operators ignore: repeated headers,
    license blocks, navigation chrome shared across otherwise-distinct
    documents.

    Returns (id, clean_text, n_spans, n_dropped) — one row per input
    document (a fully-duplicated document keeps an empty clean_text).

    Scale: tokens never leave their row until one posexplode; spans
    shuffle ONCE on the 16-byte md5 of the span text (group sizes are
    duplicate multiplicities); first-seen-wins is a plain min over a
    (doc, span) STRUCT (lexicographic — correct for string, negative,
    or arbitrary orderable ids), not a window over the corpus.

    ref: the reference has no text plane; the keep-lowest-id discipline
    matches dedup_exact above."""
    toks = _ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "tok"))
    spans = (toks
             .withColumn("span_id", F.floor(F.col("pos") / span_tokens)
                         .cast("long"))
             .groupBy(id_col, "span_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                     lambda s: s.tok), " ").alias("span_text")))
    keyed = spans.withColumn("h", F.md5("span_text")) \
        .withColumn("ord", F.struct(F.col(id_col), F.col("span_id")))
    first = keyed.groupBy("h").agg(F.min("ord").alias("first_ord"))
    kept = (keyed.join(first, "h")
            .filter(F.col("ord") == F.col("first_ord")))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("span_id", "span_text"))),
                           lambda s: s.span_text), " ").alias("clean_text"),
                    F.count("*").alias("n_kept")))
    totals = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.col("n_spans").cast("long").alias("n_spans"),
                    (F.col("n_spans") - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_dropped")))


def dedup_spans_oracle_sql(span_tokens: int = 10, table: str = "documents",
                           text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """ANSI-SQL replay of dedup_spans for DuckDB — every stage inlined
    (tokenize, fixed windows, md5 span hash, order-encoded first-seen
    min, ordered reassembly).  The SQL's arithmetic order encoding
    (id * 1e6 + span) assumes NON-NEGATIVE INTEGER ids with < 1e6 spans
    per document (true for the registered driver query); the operator
    itself uses a struct min and has no such restriction."""
    return f"""
WITH t AS (
  SELECT {id_col}, string_split_regex({text_col}, '\\s+') AS tk
  FROM {table}
), pos AS (
  SELECT {id_col}, tk, unnest(range(1, len(tk) + 1)) AS p
  FROM t
), sp AS (
  SELECT {id_col}, (p - 1) // {span_tokens} AS span_id,
         string_agg(tk[p], ' ' ORDER BY p) AS span_text
  FROM pos GROUP BY 1, 2
), keyed AS (
  SELECT {id_col}, span_id, span_text, md5(span_text) AS h,
         {id_col} * 1000000 + span_id AS ord
  FROM sp
), first AS (
  SELECT h, min(ord) AS first_ord FROM keyed GROUP BY h
), kept AS (
  SELECT k.* FROM keyed k JOIN first f ON k.h = f.h
  WHERE k.ord = f.first_ord
), rebuilt AS (
  SELECT {id_col}, string_agg(span_text, ' ' ORDER BY span_id)
           AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY {id_col}
), totals AS (
  SELECT {id_col}, count(*) AS n_spans FROM sp GROUP BY {id_col}
)
SELECT t.{id_col}, coalesce(r.clean_text, '') AS clean_text,
       CAST(t.n_spans AS BIGINT) AS n_spans,
       CAST(t.n_spans - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM totals t LEFT JOIN rebuilt r ON t.{id_col} = r.{id_col}
ORDER BY t.{id_col}"""


def dedup_substrings(df: DataFrame, k: int = 8, text_col: str = "text",
                     id_col: str = "doc_id",
                     hash_mode: str = "md5") -> DataFrame:
    """Corpus-wide EXACT SUBSTRING dedup ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022): any run of >= `k`
    tokens that occurs more than once across the corpus is cut from every
    occurrence except the first (first-seen wins — smaller doc id, then
    smaller start position), and each document's surviving tokens are
    reassembled.  This is the suffix-array ExactSubstr recipe re-expressed
    for a distributed engine: a repeated substring of length >= k is
    EXACTLY a maximal run of repeated k-token windows, so duplicated
    window detection + adjacent-window merging reproduces the suffix
    array's verdicts without ever building one.

    vs dedup_spans (C4-style): spans cut only ALIGNED fixed windows —
    a duplicate shifted by one token escapes; this operator marks every
    k-window at every offset, so arbitrary-position repeats are caught.

    Pipeline (all built-in functions, UDF-free):
      1. one tokenize per doc; k-token windows via index transform
         (tokens never leave their row)                      (no shuffle)
      2. window hash: md5 of the window text (portable mode, replayable
         in ANSI SQL) or xxhash64 (fast mode)                (no shuffle)
      3. first-seen per hash: min over a (doc, pos) STRUCT — shuffle on
         the 16-byte hash, group sizes are duplicate multiplicities
      4. non-first duplicated windows merge into MAXIMAL spans per doc
         (gaps-and-islands over dropped window starts — the merge step
         keeps the cut-position explode proportional to COVERED tokens,
         not windows x k)
      5. cut covered positions, reassemble surviving tokens in order

    Returns (id, clean_text, n_tokens, n_removed) — one row per input
    document; docs shorter than k tokens carry no windows and are kept
    whole.

    Scale: every shuffle is on (hash) or (doc, position) ints; step 4's
    window function runs over DROPPED windows only (duplicate-volume
    sized, not corpus sized); nothing is quadratic and no text wider
    than one document's tokens ever crosses the wire.

    ref: the reference has no text plane; first-seen-wins matches
    dedup_exact/dedup_spans above."""
    if k < 2:
        raise ValueError("k must be >= 2 (single-token runs are stopwords,"
                         " not substrings)")
    toked = _ensure_parallelism(df).select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("_toks"))

    win_text = F.col("_wt")
    if hash_mode == "md5":
        win_hash = F.md5(win_text)
    else:
        win_hash = F.xxhash64(win_text)
    win = (toked.filter(F.size("_toks") >= k)
           .select(
               id_col,
               F.posexplode(F.expr(
                   f"transform(sequence(0, size(_toks) - {k}),"
                   f" i -> concat_ws(' ', slice(_toks, i + 1, {k})))"))
               .alias("p", "_wt"))
           .select(id_col, "p", win_hash.alias("_h")))

    keyed = win.withColumn("_ord", F.struct(F.col(id_col), F.col("p")))
    first = keyed.groupBy("_h").agg(F.min("_ord").alias("_first"))
    dropped = (keyed.join(first, "_h")
               .filter(F.col("_ord") != F.col("_first"))
               .select(id_col, "p"))

    # gaps-and-islands: successive dropped windows whose coverage
    # [p, p+k) overlaps-or-touches merge into one maximal span
    ow = W.partitionBy(id_col).orderBy("p")
    run = W.partitionBy(id_col).orderBy("p") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    isl = (dropped
           .withColumn("_prev", F.lag("p").over(ow))
           .withColumn("_new",
                       F.when(F.col("_prev").isNull()
                              | (F.col("p") > F.col("_prev") + k), 1)
                       .otherwise(0))
           .withColumn("_isl", F.sum("_new").over(run)))
    spans = (isl.groupBy(id_col, "_isl")
             .agg(F.min("p").alias("_s"),
                  (F.max("p") + k - 1).alias("_e")))
    drop_pos = spans.select(
        id_col, F.explode(F.expr("sequence(_s, _e)")).alias("pos"))

    toks = toked.select(id_col,
                        F.posexplode("_toks").alias("pos", "tok"))
    kept = toks.join(drop_pos, [id_col, "pos"], "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "tok"))),
                            lambda s: s.tok), " ").alias("clean_text"),
                    F.count("*").alias("_n_kept")))
    totals = toked.select(id_col, F.size("_toks").alias("_n"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.col("_n").cast("long").alias("n_tokens"),
                    (F.col("_n") - F.coalesce("_n_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


def dedup_substrings_oracle_sql(k: int = 8, table: str = "documents",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    """ANSI-SQL (DuckDB) replay of dedup_substrings(hash_mode="md5") with
    every stage inlined — tokenize, k-token windows at every offset, md5
    window hash, order-encoded first-seen min, duplicated-window position
    union, cut, ordered reassembly.  The SQL replaces the Spark side's
    gaps-and-islands merge with an explode + DISTINCT over covered
    positions (identical position SET, simpler to express); the
    order encoding (id * 1e6 + p) assumes non-negative integer ids with
    < 1e6 tokens per document — true for the registered driver query;
    the operator itself uses a struct min with no such restriction."""
    return f"""
WITH t AS (
  SELECT {id_col}, string_split_regex({text_col}, '\\s+') AS tk
  FROM {table}
), starts AS (
  SELECT {id_col}, tk,
         unnest(range(0, greatest(len(tk) - {k} + 1, 0))) AS p
  FROM t
), win AS (
  SELECT {id_col}, p,
         md5(array_to_string(tk[p + 1 : p + {k}], ' ')) AS h,
         {id_col} * 1000000 + p AS ord
  FROM starts
), first AS (
  SELECT h, min(ord) AS first_ord FROM win GROUP BY h
), dropped AS (
  SELECT w.{id_col}, w.p
  FROM win w JOIN first f ON w.h = f.h AND w.ord <> f.first_ord
), droppos AS (
  SELECT DISTINCT {id_col}, unnest(range(p, p + {k})) AS pos
  FROM dropped
), toks AS (
  SELECT {id_col}, tk, unnest(range(1, len(tk) + 1)) AS p1
  FROM t
), kept AS (
  SELECT x.{id_col}, x.p1 - 1 AS pos, x.tk[x.p1] AS tok
  FROM toks x LEFT JOIN droppos d
    ON d.{id_col} = x.{id_col} AND d.pos = x.p1 - 1
  WHERE d.{id_col} IS NULL
), rebuilt AS (
  SELECT {id_col}, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY {id_col}
), totals AS (
  SELECT {id_col}, len(tk) AS n_tokens FROM t
)
SELECT t.{id_col}, coalesce(r.clean_text, '') AS clean_text,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.{id_col} = r.{id_col}
ORDER BY t.{id_col}"""


def dedup_text_clustered(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", num_hashes: int = 16,
                         bands: int = 8, shingle_n: int = 3,
                         hash_mode: str = "xxhash64") -> DataFrame:
    """Near-duplicate TEXT dedup with CLUSTER keep-decisions — the
    document analog of dedup_embedding's pipeline: banded MinHash
    candidate pairs become edges, connected components group transitive
    near-dup chains (A~B, B~C => one cluster even when A!~C directly),
    and the min-id member represents each cluster.

    Returns (id, group_id, is_kept) for EVERY input document —
    downstream keeps `is_kept = 1`.  First-seen-wins (the incremental
    path) approximates this; the clustered form is the batch-exact
    answer a full-corpus release wants.

    Scale: candidates are the banded self-join (16-byte keys), the CC
    stage is the O(log^2 n) star algorithm over doc-id pairs, and the
    final join touches ids only."""
    from linkedin_iceberg_spark.operators.graph import connected_components

    pairs = minhash_lsh_candidates(df, text_col, id_col, num_hashes,
                                   bands, shingle_n, hash_mode) \
        .select("d1", "d2")
    comp = connected_components(pairs, "d1", "d2")
    ids = df.select(F.col(id_col))
    joined = ids.join(comp, ids[id_col] == comp["id"], "left")
    group = F.coalesce(F.col("component"), F.col(id_col)).cast("long")
    return (joined.select(
        F.col(id_col), group.alias("group_id"),
        F.when(group == F.col(id_col), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_kept"))
        .orderBy(id_col))


def dedup_text_clustered_oracle_sql(table: str = "documents",
                                    text_col: str = "text",
                                    id_col: str = "doc_id",
                                    num_hashes: int = 16, bands: int = 8,
                                    shingle_n: int = 3) -> str:
    """Full-pipeline SQL replay of dedup_text_clustered (md5 mode):
    the shared banded CTEs, the candidate-pair self-join, and a
    recursive-CTE transitive closure labeling every doc with the min
    reachable id."""
    prefix = minhash_banded_cte_sql(table, text_col, id_col, num_hashes,
                                    bands, shingle_n, recursive=True)
    return f"""{prefix}
, pairs AS (
  SELECT a.{id_col} AS d1, b.{id_col} AS d2 FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2
), edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION SELECT d2, d1 FROM pairs
), walk (id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.lab
), comp AS (SELECT id, min(lab) AS component FROM walk GROUP BY id)
SELECT t.{id_col},
       CAST(coalesce(c.component, t.{id_col}) AS BIGINT) AS group_id,
       CAST(CASE WHEN coalesce(c.component, t.{id_col}) = t.{id_col}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM {table} t LEFT JOIN comp c ON c.id = t.{id_col}
ORDER BY t.{id_col}"""


def dedup_edit_distance(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", max_edits: int = 40,
                        num_hashes: int = 16, bands: int = 8,
                        shingle_n: int = 3,
                        hash_mode: str = "md5") -> DataFrame:
    """Block-then-verify near-dup pairs with an EDIT-DISTANCE verdict:
    banded MinHash proposes candidates (the only wide shuffle), each
    candidate pair's true Levenshtein distance filters survivors at
    ``<= max_edits``.  Jaccard verification (minhash_lsh_verified) treats
    texts as shingle SETS — reorderings look identical; the edit-distance
    verdict is ORDER-SENSITIVE, the right check when "duplicate" means
    "same text up to k typo/boilerplate edits".

    Scale: levenshtein is O(len^2) per pair, but it runs on CANDIDATES
    only — the classic blocked-verify shape; texts reach the verify step
    by two equi-joins on the 8-byte id.  Returns (d1, d2, edits),
    d1 < d2."""
    pairs = minhash_lsh_candidates(df, text_col, id_col, num_hashes,
                                   bands, shingle_n, hash_mode)
    texts = df.select(F.col(id_col), F.col(text_col))
    t1 = texts.withColumnRenamed(id_col, "d1") \
        .withColumnRenamed(text_col, "_t1")
    t2 = texts.withColumnRenamed(id_col, "d2") \
        .withColumnRenamed(text_col, "_t2")
    return (pairs.join(t1, "d1").join(t2, "d2")
            .withColumn("edits", F.levenshtein("_t1", "_t2"))
            .filter(F.col("edits") <= max_edits)
            .select("d1", "d2", "edits")
            .orderBy("d1", "d2"))


def edit_distance_oracle_sql(max_edits: int = 40, table: str = "documents",
                             text_col: str = "text", id_col: str = "doc_id",
                             num_hashes: int = 16, bands: int = 8,
                             shingle_n: int = 3) -> str:
    """Full-pipeline SQL replay of dedup_edit_distance: the shared banded
    CTE proposes the same candidate set, DuckDB's levenshtein() (the
    identical unit-cost DP) re-verifies every pair."""
    prefix = minhash_banded_cte_sql(table, text_col, id_col, num_hashes,
                                    bands, shingle_n)
    return f"""{prefix}
, cand AS (
  SELECT a.{id_col} AS d1, b.{id_col} AS d2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2
)
SELECT c.d1, c.d2,
       CAST(levenshtein(t1.{text_col}, t2.{text_col}) AS INT) AS edits
FROM cand c
JOIN {table} t1 ON t1.{id_col} = c.d1
JOIN {table} t2 ON t2.{id_col} = c.d2
WHERE levenshtein(t1.{text_col}, t2.{text_col}) <= {max_edits}
ORDER BY c.d1, c.d2"""


def dedup_semantic(df: DataFrame, n_cells: int = None, n_iters: int = 2,
                   threshold: float = 0.4, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   target_cell_size: int = 250,
                   min_cells: int = 8) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup with
    K-MEANS CELL blocking — cluster the embeddings, verify exact cosine
    only WITHIN each cell, connected components, keep the minimum id per
    near-dup cluster.  Same output contract as dedup_embedding:
    (id, group_id, is_kept) for every input row.

    vs the LSH-blocked dedup_embedding: k-means blocking adapts to the
    corpus's actual density (cells shrink where vectors crowd), which is
    the published method's rationale at web scale; the trade is that
    cross-cell near-dups are out of scope BY DESIGN (SemDeDup's stated
    approximation), where multi-table LSH still proposes them with the
    standard recall bound.  Both bound the verify stage far below
    all-pairs.

    Scale: training is kmeans_fit's broadcast-iterate loop; assignment
    inlines centroids (one scan, no shuffle); the verify self-join
    shuffles on the cell int and touches only within-cell pairs —
    O(sum cell_i^2), the quantity k-means minimizes; components are the
    O(log^2 n) star rounds.  Deterministic end to end, so the WHOLE
    pipeline (training included) replays in SQL
    (dedup_semantic_oracle_sql).

    ``n_cells`` defaults to None = DERIVED from the corpus:
    max(min_cells, ceil(count / target_cell_size)) — SemDeDup's own
    recipe grows the cluster count with the corpus, which keeps the
    within-cell verify stage (and the whole operator) linear in N; a
    FIXED cell count makes it O(N^2 / n_cells).  The one 1-row count
    this costs is amortized by the k-means scans that follow.  Pass an
    explicit int only when a second engine must replay training
    bit-for-bit (the SQL oracle inlines the cell count)."""
    from linkedin_iceberg_spark.operators.graph import connected_components
    from linkedin_iceberg_spark.operators.similarity import (
        _dot, _norm, ivf_assign, ivf_assign_join, kmeans_fit)

    if n_cells is None:
        n = df.count()
        n_cells = max(min_cells, -(-n // target_cell_size))
    cents = kmeans_fit(df, n_cells, n_iters, id_col=id_col,
                       vec_col=vec_col)
    # literal-inlined assignment is ideal for tens of cells; at derived
    # scale (cells ~ N / target_cell_size, thousands) the inlined
    # expression would be O(n_cells * dim) — switch to the
    # broadcast-join path (same rounding + tie rule, value-identical)
    if n_cells > 64:
        assigned = ivf_assign_join(df.select(id_col, vec_col), cents,
                                   id_col=id_col, vec_col=vec_col)
    else:
        assigned = ivf_assign(df.select(id_col, vec_col), cents,
                              vec_col=vec_col)
    a = assigned.select(F.col("cell"), F.col(id_col).alias("v1"),
                        F.col(vec_col).alias("_e1"))
    b = assigned.select(F.col("cell"), F.col(id_col).alias("v2"),
                        F.col(vec_col).alias("_e2"))
    cos = _dot(F.col("_e1"), F.col("_e2")) / (_norm(F.col("_e1"))
                                              * _norm(F.col("_e2")))
    verified = (a.join(b, "cell")
                .filter(F.col("v1") < F.col("v2"))
                .filter(cos >= threshold)
                .select("v1", "v2"))
    comp = connected_components(verified, "v1", "v2")
    ids = df.select(F.col(id_col))
    joined = ids.join(comp, ids[id_col] == comp["id"], "left")
    group = F.coalesce(F.col("component"), F.col(id_col)).cast("long")
    return (joined.select(
        F.col(id_col),
        group.alias("group_id"),
        F.when(group == F.col(id_col), F.lit(1)).otherwise(F.lit(0))
         .cast("long").alias("is_kept"))
        .orderBy(id_col))


def dedup_semantic_oracle_sql(n_cells: int = 8, n_iters: int = 2,
                              threshold: float = 0.4,
                              table: str = "embeddings",
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> str:
    """ANSI-SQL (DuckDB) replay of the ENTIRE dedup_semantic pipeline:
    the k-means training loop (kmeans_oracle_sql as a nested subquery),
    within-cell pair generation, exact cosine verification, transitive
    closure, and the keep decision — value-checked end to end."""
    from linkedin_iceberg_spark.operators.similarity import (
        kmeans_oracle_sql)

    assign = kmeans_oracle_sql(n_cells, n_iters, table=table,
                               id_col=id_col, vec_col=vec_col)
    return f"""
WITH RECURSIVE assign AS (
  SELECT * FROM ({assign})
),
cand AS (
  SELECT a.{id_col} AS v1, b.{id_col} AS v2
  FROM assign a JOIN assign b
    ON a.cell = b.cell AND a.{id_col} < b.{id_col}
),
verified AS (
  SELECT c.v1, c.v2
  FROM cand c
  JOIN {table} x ON x.{id_col} = c.v1
  JOIN {table} y ON y.{id_col} = c.v2
  WHERE list_cosine_similarity(x.{vec_col}::DOUBLE[],
                               y.{vec_col}::DOUBLE[]) >= {threshold}
),
edges AS (
  SELECT v1 AS src, v2 AS dst FROM verified
  UNION
  SELECT v2, v1 FROM verified
),
walk (id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.lab
),
comp AS (SELECT id, min(lab) AS component FROM walk GROUP BY id)
SELECT e.{id_col},
       CAST(coalesce(c.component, e.{id_col}) AS BIGINT) AS group_id,
       CAST(CASE WHEN coalesce(c.component, e.{id_col}) = e.{id_col}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM {table} e LEFT JOIN comp c ON c.id = e.{id_col}
ORDER BY e.{id_col}"""
