"""Deterministic sampling operators for training-data pipelines.

Every sample here is a pure function of (salt, row key) — reproducible
across runs, engines, repartitions, and appends (a row's fate never
changes), and re-derivable in plain SQL for verification.  No RNG state,
no shuffle: one hash + compare per row.  The md5-bucket recipe is shared
with text.split_assign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # fraction resolution: 1e-6


def hash_bucket(id_col: str, salt: str, buckets: int = _BUCKETS):
    """Deterministic bucket in [0, buckets): 60-bit md5 prefix of
    ``salt-id`` mod buckets — portable (the identical expression exists in
    ANSI SQL / DuckDB).  The ONE copy of the recipe: split_assign (mod
    100) and the samplers (mod 1e6) both call this, so the cross-engine
    determinism contract cannot silently fork.

    NULL ids hash to NULL (concat propagates NULL exactly like the SQL
    replay's ``salt || '-' || id``), so samplers DROP NULL-id rows and
    split_assign leaves their split NULL — identical on both engines.
    (concat_ws would instead silently collapse every NULL id into the
    single md5(salt) bucket, kept/dropped as a block.)"""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("-"),
                       F.col(id_col).cast("string"))),
        1, 15), 16, 10).cast("long") % buckets)


def _bucket(id_col: str, salt: str):
    return hash_bucket(id_col, salt, _BUCKETS)


def _threshold(fraction: float) -> int:
    # round, not truncate: int(0.000249 * 1e6) is 248 by float truncation
    # while the SQL replay compares against 249 — round() restores the
    # exact-replay contract for every 6-decimal fraction
    return int(round(fraction * _BUCKETS))


def sample_fraction(df: DataFrame, fraction: float, id_col: str,
                    salt: str = "v1") -> DataFrame:
    """Keep ~`fraction` of rows, decided per row by hash bucket."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(id_col, salt) < _threshold(fraction))


def sample_stratified(df: DataFrame, strata_col: str, fractions: dict,
                      id_col: str, salt: str = "v1",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum sampling rates (df.sampleBy's deterministic twin):
    keep a row iff its hash bucket falls under its stratum's fraction.
    Strata missing from `fractions` get `default_fraction`.

    The standard rebalancing step for over-represented sources/languages
    in a training mix.  Scale: one hash + one CASE per row, no shuffle,
    no RNG — and unlike sampleBy (Bernoulli per partition-attempt), the
    kept set is stable under retries, repartitions, and appends."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} must be in "
                             "[0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        lim = F.lit(_threshold(frac))
        thresh = F.when(cond, lim) if thresh is None \
            else thresh.when(cond, lim)
    thresh = thresh.otherwise(F.lit(_threshold(default_fraction))) \
        if thresh is not None \
        else F.lit(_threshold(default_fraction))
    return df.filter(_bucket(id_col, salt) < thresh)


def sample_bucket_sql(id_col: str, salt: str = "v1",
                      buckets: int = _BUCKETS) -> str:
    """The hash_bucket expression as DuckDB/ANSI SQL (oracle building
    block).  `buckets` mirrors hash_bucket's parameter so shard-sized
    moduli (shuffle_shards) replay with the same recipe."""
    return (f"(('0x' || substr(md5('{salt}' || '-' || "
            f"{id_col}::VARCHAR), 1, 15))::BIGINT % {buckets})")


def cap_per_group(df: DataFrame, group_col: str, n: int, id_col: str,
                  salt: str = "v1") -> DataFrame:
    """Keep at most `n` rows per group — the C4-style per-domain cap that
    stops a handful of giant sources from dominating a training mix.

    Rows are chosen by DETERMINISTIC HASH ORDER (md5 bucket, ties by id),
    not by id or arrival order: an unbiased sample of each group that is
    reproducible across runs/engines and stable under repartitioning.
    Scale: one per-group window (hashpartitioning on the group key), no
    global sort."""
    from pyspark.sql import Window
    if n <= 0:
        raise ValueError("n must be positive")
    # NULLS LAST explicitly: NULL ids hash to NULL buckets, and Spark's
    # ASC default is nulls-first while DuckDB's (the oracle engine) is
    # nulls-last — without this, NULL-id rows would consume cap slots in
    # Spark but not in the SQL replay
    w = Window.partitionBy(group_col).orderBy(
        _bucket(id_col, salt).asc_nulls_last(),
        F.col(id_col).asc_nulls_last())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def sample_weighted(df: DataFrame, weight_col: str, n_expected: int,
                    id_col: str, salt: str = "v1") -> DataFrame:
    """Weighted (probability-proportional-to-size) Poisson sampling:
    each row is kept with probability min(1, n_expected * w / W), so
    longer/higher-quality documents are proportionally more likely to
    survive and the expected sample size is ~n_expected (exactly, when
    no row's probability clips at 1).  Weights must be non-negative
    INTEGERS (token counts, byte sizes, scaled quality tiers) — that is
    what keeps the decision integer-exact.

    Determinism contract (the module invariant): a row's fate is a pure
    function of (salt, id, w, W).  The per-row threshold is computed in
    pure INTEGER arithmetic — (n * w * 1e6) div W against the shared
    md5 bucket — so the kept set replays bit-identically in ANSI
    SQL/DuckDB with no float in sight (float thresholds would let a
    libm ulp flip a boundary row between engines).  W (the exact
    integer weight total) is the one scan-derived input; it is computed
    in the same pass style as the rest of the module and inlined.

    Scale: one metadata-sized aggregate (sum/max of the weight column),
    then one hash + two integer ops per row — no shuffle, no RNG, no
    sort.  NULL ids and NULL/zero/negative weights drop (threshold and
    bucket both propagate NULL/false), matching the SQL replay."""
    if n_expected <= 0:
        raise ValueError("n_expected must be positive")
    stats = df.agg(
        F.sum(F.col(weight_col).cast("long")).alias("W"),
        F.max(F.col(weight_col).cast("long")).alias("mw")).collect()[0]
    total_w, max_w = stats["W"], stats["mw"]
    if not total_w or total_w <= 0:
        raise ValueError("weights must sum to a positive integer")
    if n_expected * max_w * _BUCKETS >= 2 ** 63:
        raise ValueError(
            "n_expected * max(weight) * 1e6 overflows 64-bit integer "
            "arithmetic; rescale the weight column")
    thresh = F.least(
        F.lit(_BUCKETS).cast("long"),
        F.expr(f"({int(n_expected)}L * CAST({weight_col} AS BIGINT) "
               f"* {_BUCKETS}L) div {int(total_w)}L"))
    return df.filter((F.col(weight_col) > 0) &
                     (_bucket(id_col, salt) < thresh))


def mix_by_token_budget(df: DataFrame, group_col: str, count_col: str,
                        budgets: dict, id_col: str, salt: str = "v1",
                        default_budget: int = 0) -> DataFrame:
    """Data-mixture selection by per-group TOKEN budget: walk each
    group's rows in deterministic hash order and keep a row iff the
    group's running token total (including the row) stays within its
    budget.  This is how a training mix pins "X tokens of source A,
    Y of source B" exactly, rather than approximating it with rates —
    and unlike rate sampling it self-corrects for per-doc length skew.

    Deterministic and append-stable in order (appended rows sort into
    the hash order; re-materialize the mix per release).  Scale: one
    per-group cumulative-sum window (ROWS frame), no global sort, no
    driver state.  SQL-replayable via the shared md5 bucket recipe."""
    from pyspark.sql import Window
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for group {g!r} must be >= 0")
    budget = None
    for g, b in budgets.items():
        cond = F.col(group_col) == F.lit(g)
        budget = F.when(cond, F.lit(int(b))) if budget is None \
            else budget.when(cond, F.lit(int(b)))
    budget = budget.otherwise(F.lit(int(default_budget))) \
        if budget is not None else F.lit(int(default_budget))
    # NULLS LAST: match the DuckDB replay's default null ordering (see
    # cap_per_group) so NULL-id rows never shift which real docs fit
    w = (Window.partitionBy(group_col)
         .orderBy(_bucket(id_col, salt).asc_nulls_last(),
                  F.col(id_col).asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(count_col)).over(w)
    return (df.withColumn("_cum", cum)
            .filter(F.col("_cum") <= budget)
            .drop("_cum"))


def sample_temperature_mix(df: DataFrame, group_col: str, id_col: str,
                           total: int, salt: str = "v1") -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-training
    mixing rule, alpha = 0.5): each group's share of a `total`-document
    release is proportional to sqrt(group size), which up-weights small
    sources and caps the head — quota_g = floor(total * w_g / sum(w)),
    w_g = floor(sqrt(n_g)) — then each group's quota is filled in
    deterministic salted-hash order.

    Every step is INTEGER arithmetic (isqrt is exact in a double for
    n < 2^52; the quota split is bigint multiply + integer division), so
    the selection replays bit-identically in ANSI SQL — no float sampling
    rates to diverge at a bucket boundary.  Quotas shift when the corpus
    grows, so unlike sample_fraction this is per-release, not
    append-stable: re-materialize the mix per release (same contract as
    mix_by_token_budget).

    Scale: one count-per-group aggregate (tiny result), a one-row total
    broadcast back over it, a broadcast join of the quota map onto the
    corpus, and one per-group window — no global sort, no driver state."""
    from pyspark.sql import Window
    if total < 0:
        raise ValueError("total must be >= 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weights = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n"))).cast("long"))
    tot = weights.agg(F.sum("_w").alias("_tw"))
    quota = (weights.crossJoin(F.broadcast(tot))
             .withColumn("_quota",
                         F.expr(f"(CAST({int(total)} AS BIGINT) * _w) "
                                "DIV _tw"))
             .select(group_col, "_quota"))
    w = Window.partitionBy(group_col).orderBy(
        _bucket(id_col, salt).asc_nulls_last(),
        F.col(id_col).asc_nulls_last())
    return (df.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(quota), group_col)
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   salt: str = "v1") -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets
    a `shard` in [0, n_shards) and a 1-based `pos` within its shard, both
    pure functions of (salt, id) — the reproducible replacement for
    `ORDER BY rand()` when materializing a training corpus.  Two
    independent salted hashes decorrelate shard assignment from
    within-shard order, so reading shards round-robin approximates a
    uniform global shuffle.

    Scale: ONE hash-partition exchange on the shard key plus a per-shard
    window — never a global sort.  To materialize, follow with
    ``.repartition(n_shards, "shard").sortWithinPartitions("pos")`` and
    one file per shard; appends re-shard (positions shift), so shard per
    release.  NULL ids hash to NULL shards and are dropped, matching the
    SQL replay's `salt || '-' || id` (see hash_bucket)."""
    from pyspark.sql import Window
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = hash_bucket(id_col, salt, n_shards)
    order = hash_bucket(id_col, salt + "-ord", _BUCKETS)
    w = Window.partitionBy(shard).orderBy(
        order.asc_nulls_last(), F.col(id_col).asc_nulls_last())
    return (df.withColumn("shard", shard)
            .filter(F.col("shard").isNotNull())
            .withColumn("pos", F.row_number().over(w)))


# ---------------------------------------------------------------------------
# DSIR-style data selection (hashed n-gram importance ranking)
# ---------------------------------------------------------------------------

def _hash60(col, salt: str):
    """60-bit md5 prefix of ``salt-<value>`` — the module's portable-hash
    recipe over an arbitrary string Column (hash_bucket's generalization)."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("-"), col.cast("string"))),
        1, 15), 16, 10).cast("long")


def _bigram_buckets(df: DataFrame, text_col: str, buckets: int,
                    salt: str) -> DataFrame:
    """One row per (whitespace-lowercase) BIGRAM occurrence with its
    hashed feature bucket — empty tokens filtered BEFORE pairing so the
    token indices match the SQL replay's list_filter exactly."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    out = df.withColumn("_tk", toks)
    bg = F.when(F.size("_tk") >= 2, F.expr(
        "transform(sequence(0, size(_tk)-2), "
        "i -> concat(_tk[i], ' ', _tk[i+1]))")) \
        .otherwise(F.array().cast("array<string>"))
    return (out.withColumn("_bg", F.explode(bg))
            .withColumn("_b", _hash60(F.col("_bg"), salt) % buckets)
            .drop("_tk", "_bg"))


def dsir_select(raw_df: DataFrame, target_df: DataFrame, text_col: str,
                id_col: str, n: int, buckets: int = 4096,
                scale: int = 1_000_000, smoothing: int = 1,
                salt: str = "dsir") -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — hashed n-gram
    importance over a raw corpus against a small target corpus): score
    every raw document by how target-like its hashed-BIGRAM profile is
    and keep the top ``n``.

    Feature: lowercase whitespace bigram -> 60-bit md5 bucket mod
    ``buckets`` (the module's one portable-hash recipe).  The per-bucket
    importance is the INTEGER
        S(b) = round(scale * ln( ((tc_b+s) * (RC + s*B))
                               / ((rc_b+s) * (TC + s*B)) ))
    (tc/rc = target/raw occurrence counts, TC/RC their totals, s the
    add-s smoothing, B = buckets) and a document's score is the integer
    SUM of its bigram occurrences' S values — so ranking replays
    bit-identically in external SQL (the paper's stochastic Gumbel
    resampling would trade that replay for sampling noise; the engine
    ships the deterministic top-n flavor, ties broken by the portable
    id hash).  Documents with fewer than two tokens score 0.

    Scale: two bigram-count aggregations (map-side combinable ints), an
    S-table of at most ``buckets`` rows broadcast into the raw explode,
    one integer per-doc sum, and a bounded TakeOrdered top-n — no
    all-pairs stage, no floats in any per-row path (ln runs once per
    BUCKET, not per row).  Returns the selected rows of ``raw_df`` with
    an integer ``dsir_score`` column."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    B, s = buckets, smoothing
    tgt = _bigram_buckets(target_df.select(text_col), text_col, B, salt)
    raw = _bigram_buckets(raw_df.select(id_col, text_col),
                          text_col, B, salt)
    tc = tgt.groupBy("_b").agg(F.count("*").alias("tc"))
    rc = raw.groupBy("_b").agg(F.count("*").alias("rc"))
    tot_t = tgt.count()
    tot_r = raw.count()
    stable = (rc.join(tc, "_b", "left")
              .select("_b", F.round(F.lit(scale) * F.log(
                  ((F.coalesce(F.col("tc"), F.lit(0)) + s)
                   * F.lit(tot_r + s * B)).cast("double")
                  / ((F.col("rc") + s)
                     * F.lit(tot_t + s * B)).cast("double")))
                  .cast("long").alias("s_b")))
    scores = (raw.join(F.broadcast(stable), "_b")
              .groupBy(id_col).agg(F.sum("s_b").alias("dsir_score")))
    ranked = (raw_df.join(scores, id_col, "left")
              .withColumn("dsir_score",
                          F.coalesce(F.col("dsir_score"), F.lit(0)))
              .orderBy(F.col("dsir_score").desc(),
                       _hash60(F.col(id_col), salt).asc(),
                       F.col(id_col).asc())
              .limit(n))
    return ranked
