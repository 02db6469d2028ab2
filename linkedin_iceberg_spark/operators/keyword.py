"""Persisted inverted keyword index: the keyword-retrieval analog of the
IVF plane (`similarity.ivf_index_table`).

The hybrid-RRF keyword channel (and any keyword search) scores by
query-term overlap, which as a corpus scan touches EVERY document's
text at query time.  The serving shape is an inverted index: one
posting row per (distinct token, document), persisted as an engine
table PARTITIONED BY a token hash bucket — a query's terms map to a
handful of buckets, so scan planning prunes to those buckets' FILES
through partition metadata (the same file-level pruning contract as the
IVF cells; no posting of an untouched bucket is ever read).

Determinism contract: the bucket uses the house md5 recipe (shared with
the samplers via `sampling.hash_bucket`), and a channel backed by this
index is VALUE-IDENTICAL to the exact corpus scan — scores are distinct
matched-term counts either way — so the exact mode stays the oracle's
replay path (the knn_join / ivf converges-to-exact precedent).

Scale shape: the build is one tokenize + distinct per document (a
(token, doc) hash shuffle, map-side combinable), written partitioned;
queries read |terms| buckets' files, aggregate per doc (pre-grouped by
the posting layout), and pool via TakeOrdered.  Maintenance: appends of
new documents' postings go through the same partitioned write;
`kw.indexed-count` stamps the baseline (the ivf_refresh growth-gate
pattern applies unchanged).

No reference analog (the 0.9-era fork has no retrieval plane);
published basis: the standard inverted-file layout (Zobel & Moffat,
"Inverted Files for Text Search Engines", CSUR'06).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def _postings(docs: DataFrame, id_col: str, text_col: str,
              n_buckets: int, salt: str) -> DataFrame:
    from linkedin_iceberg_spark.operators.sampling import hash_bucket
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")))
        .alias("token"))
        .filter(F.col("token") != ""))
    return toks.select(
        hash_bucket("token", salt, n_buckets).cast("int").alias("bucket"),
        "token", F.col(id_col))


def term_bucket(term: str, n_buckets: int, salt: str = "v1") -> int:
    """Driver-side twin of the posting bucket (same md5 recipe) — maps a
    query term to its partition without touching data."""
    h = hashlib.md5(f"{salt}-{term}".encode()).hexdigest()[:15]
    return int(h, 16) % n_buckets


def keyword_index_table(catalog, name: str, docs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = DEFAULT_BUCKETS,
                        salt: str = "v1"):
    """Build + persist the inverted index as an engine table partitioned
    by token bucket; recipe parameters and the indexed row count are
    stamped as properties so the index is self-describing."""
    post = _postings(docs, id_col, text_col, n_buckets, salt)
    from linkedin_iceberg_spark import PartitionSpec, Schema
    spec = (PartitionSpec.builder_for(Schema.from_spark(post.schema))
            .identity("bucket").build())
    t = catalog.create_table(name, post, spec=spec)
    # cluster postings by token WITHIN each bucket (write.sort-by):
    # file min/max token bounds stay tight, so a query's term list
    # skips a bucket's non-covering FILES too — two-level pruning
    # (partition -> metrics), not just the bucket partitions
    t.update_properties({"kw.n-buckets": str(n_buckets),
                         "kw.salt": salt,
                         "kw.id-col": id_col,
                         "kw.indexed-count": str(docs.count()),
                         "write.sort-by": "token"})
    t.append(post)
    return t


def keyword_index_append(table, docs: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text"):
    """Index new documents incrementally: their postings append into the
    same bucket partitions (no rebuild — the partitioned write routes
    each posting to its bucket's files)."""
    n_buckets = int(table.properties["kw.n-buckets"])
    salt = table.properties["kw.salt"]
    post = _postings(docs, id_col, text_col, n_buckets, salt)
    table.append(post)
    prev = int(table.properties.get("kw.indexed-count", "0"))
    table.update_properties(
        {"kw.indexed-count": str(prev + docs.count())})
    return table


def keyword_topk_from_table(table, query_terms: list, pool: int,
                            id_col: str = "doc_id") -> DataFrame:
    """Top-``pool`` documents by distinct matched-term count, reading
    ONLY the query terms' bucket partitions (file-level pruning via the
    scan planner).  Value-identical to the exact corpus scan channel:
    postings are distinct (token, doc) rows, so the per-doc match count
    IS ``size(array_intersect(distinct doc tokens, terms))``."""
    from linkedin_iceberg_spark.expressions import and_, in_
    n_buckets = int(table.properties["kw.n-buckets"])
    salt = table.properties["kw.salt"]
    terms = sorted({t for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one "
                         "non-empty term")
    buckets = sorted({term_bucket(t, n_buckets, salt) for t in terms})
    # the token predicate goes INTO scan planning too: with postings
    # token-clustered (write.sort-by), file min/max bounds skip a
    # bucket's non-covering files before the row filter runs
    post = table.new_scan().filter(
        and_(in_("bucket", buckets), in_("token", terms))).to_df()
    stored_id = table.properties.get("kw.id-col", "doc_id")
    return (post.filter(F.col("token").isin(terms))
            .groupBy(F.col(stored_id).alias(id_col))
            .agg(F.count(F.lit(1)).cast("int").alias("kw_score"))
            .orderBy(F.col("kw_score").desc(), F.col(id_col))
            .limit(pool))
