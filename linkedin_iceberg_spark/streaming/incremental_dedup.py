"""Incremental corpus deduplication: stream new documents against a
persisted MinHash-LSH signature index.

The batch dedup operators (operators/dedup.py) answer "which documents in
THIS corpus are near-duplicates of each other"; an ingestion pipeline
needs the incremental question — "is this NEW document a near-duplicate
of anything we already accepted" — without rescanning the corpus.  The
banded signatures make that a lookup: persist (doc_id, band, sig) as the
corpus index (B ~20-byte rows per doc) and join each incoming batch
against it on (band, sig).

Decision rule: first-seen wins.  A document is a duplicate iff it shares
at least one band signature with ANY earlier document — earlier batches
via the index, earlier rows of the same batch via a lower-id self-join.
Because rejected documents' signatures also enter the index, the rule is
closed-form (no recursive accept-chain), so the whole multi-batch run is
replayable in plain SQL for verification.

Scale: the per-batch cost is one signature pass over the batch plus one
equi-join on 12-byte (band, sig) keys against the index — at 100 TB the
index lives as an engine table partitioned/bucketed by band so the join
is cell-local and index growth is an append, never a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.dedup import minhash_band_signatures


def dedup_decide(batch_df: DataFrame, index_sigs: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 16, bands: int = 8, shingle_n: int = 3,
                 hash_mode: str = "xxhash64"):
    """Decide accept/duplicate for one batch against the current index.

    Returns (decisions, batch_sigs): decisions = (id, accepted) for every
    batch row; batch_sigs = the batch's banded signatures — append them
    ALL to the index afterwards (first-seen wins needs rejected docs'
    signatures too).
    """
    # the signature pipeline is referenced three times (probe side + the
    # batch's own rows on the earlier side) and the caller appends it to
    # the index — persist so it computes once per batch; the caller may
    # unpersist after the append
    sigs = minhash_band_signatures(batch_df, text_col, id_col, num_hashes,
                                   bands, shingle_n, hash_mode).persist()
    # ONE equi-join on (band, sig) decides everything (r12; was two joins
    # + an index-wide distinct + a union + three distincts — each an
    # extra shuffle stage per micro-batch, and the distinct over the
    # whole index was a full index shuffle at scale): the "earlier" side
    # is the index's signatures (eid NULL — any index doc predates the
    # batch) unioned with the batch's own rows (eid = id); a batch doc is
    # a duplicate iff it matches an earlier row with eid NULL or
    # eid < id.  Same duplicate SET as the r11 shape (multiplicities
    # differ pre-distinct only).
    id_type = sigs.schema[id_col].dataType
    earlier = (index_sigs.select(
                   F.col("band"), F.col("sig"),
                   F.lit(None).cast(id_type).alias("_eid"))
               .unionByName(sigs.select(
                   F.col("band"), F.col("sig"),
                   F.col(id_col).alias("_eid"))))
    s, e = sigs.alias("s"), earlier.alias("e")
    dups = (s.join(e, (F.col("s.band") == F.col("e.band"))
                   & (F.col("s.sig") == F.col("e.sig"))
                   & (F.col("e._eid").isNull()
                      | (F.col("e._eid") < F.col(f"s.{id_col}"))))
            .select(F.col(f"s.{id_col}").alias(id_col)).distinct())
    decisions = (batch_df.select(id_col)
                 .join(dups.withColumn("_dup", F.lit(True)),
                       on=id_col, how="left")
                 .select(id_col,
                         F.coalesce(~F.col("_dup"), F.lit(True))
                          .alias("accepted")))
    return decisions, sigs


def maintain_signature_index(index_table, retain_last: int = 1,
                             target_size_bytes: int = 8 * 1024 * 1024
                             ) -> dict:
    """Periodic maintenance for the persisted (doc_id, band, sig) index.

    The index is append-only — every batch adds one small file (per band
    partition when the table is partitioned by ``identity(band)``, the
    recommended layout) — so without maintenance both file count and
    snapshot metadata grow forever.  This applies the reference's
    discipline for every growing metadata surface (core/.../
    ManifestMergeManager.java merge-on-append; RemoveSnapshots.java:55-148
    reachability-diff expiry): bin-pack the per-batch files with
    rewrite_data_files (per band partition), then expire superseded
    snapshots so storage stays O(live index).

    Compaction preserves rows exactly, so dedup decisions are
    byte-identical before/after — asserted by
    tests/test_incremental_index_maintenance.py.  Run it every N batches
    from the ingestion loop; it commits through the same validated
    optimistic loop as any other writer, so it is safe to race with an
    in-flight append (one of the two retries)."""
    from linkedin_iceberg_spark.catalog.maintenance import (
        expire_snapshots, rewrite_data_files)

    compacted = rewrite_data_files(index_table,
                                   target_size_bytes=target_size_bytes,
                                   min_input_files=2)
    expired = expire_snapshots(index_table, retain_last=retain_last)
    return {**compacted, **expired}


def incremental_dedup_oracle_sql(table: str = "documents",
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 num_hashes: int = 16, bands: int = 8,
                                 shingle_n: int = 3) -> str:
    """SQL replay of the ENTIRE multi-batch run (md5-portable hash mode).

    Valid whenever batches arrive in ascending-id order (the demo/driver
    setup): first-seen-wins then reduces to `duplicate iff some lower-id
    doc shares a band signature`, which one self-join expresses — the
    banded-signature CTEs are the same ones minhash_oracle_sql inlines."""
    from linkedin_iceberg_spark.operators.dedup import minhash_banded_cte_sql

    # the banded-signature CTE chain, shared with minhash_oracle_sql
    # through one composable function (no textual splicing)
    prefix = minhash_banded_cte_sql(table, text_col, id_col, num_hashes,
                                    bands, shingle_n)
    return f"""{prefix}
, dup AS (
  SELECT DISTINCT b.{id_col} FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.{id_col} < b.{id_col}
)
SELECT t.{id_col}, dup.{id_col} IS NULL AS accepted
FROM {table} t LEFT JOIN dup ON t.{id_col} = dup.{id_col}
ORDER BY t.{id_col}"""
