"""sf1 scale probe (r4 verdict #8): catch accidental super-linear plans.

The sf0.1 bench cannot see an O(n^2) that only bites at 10x the data, so
this probe derives a ~sf1 dataset (10x sf0.1) and times the most
expensive headline queries at both scales.  The derived data preserves
each query's semantic shape:

- fact tables are 10 shifted copies (every key domain offset per copy, so
  referential joins stay 1:1 and never cross copies);
- dimension tables (nation, region) are shared, as in TPC-H;
- documents get a per-copy alphabet rotation: token counts, within-copy
  duplicate structure, and shingle statistics are preserved, but shingle
  SETS are disjoint across copies — without this, replicated text makes
  every duplicate group 10x larger and the candidate-pair OUTPUT grows
  ~50x quadratically, which would measure output explosion instead of
  scan scaling.

Usage: python tools/scale_probe.py [--out BENCH_sf1.json]
Writes one JSON with per-query seconds at sf0.1 and sf1 plus the ratio;
a ratio well under 10 on filtered/pruned queries is the sub-linearity
evidence, a ratio well over ~12-13 on any query flags a super-linear
plan.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from linkedin_iceberg_spark import queries as Q
from linkedin_iceberg_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DERIVED = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/liceberg_sf1")
COPIES = 10

# per-copy key shifts: strictly above each domain's sf0.1 maximum
SHIFTS = {
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 500},
}
SHARED = ["nation", "region"]

PROBE_QUERIES = [
    "dedup_minhash_lsh_full",
    "join_multiway",
    "join_inner_equi",
    "join_asof",
    "window_topk_per_group",
    # r4 additions worth a 10x lens: span dedup (one hash shuffle over
    # every token window), sharded packing (per-shard windows), and the
    # full release pipeline (minhash + mixture + split + pack)
    "dedup_spans",
    "text_pack_sharded",
    "pipeline_training_release",
    # r4 late additions: the trigram explode (~len(text) rows/doc with a
    # broadcast frequency join), the shard-shuffle window, the
    # temperature-mix quota join, and the funnel's join-agg chain
    "text_trigram_novelty",
    "sample_shuffle_shards",
    "sample_temperature_mix",
    "events_funnel",
    # maintenance plane under the 10x lens: full table build + DML +
    # pos-delete compaction, and the build + upsert + purge composite
    "table_rewrite_pos_deletes",
    "table_purge_forgotten",
    # r5 (verdict #7): the two operators whose cost rides on
    # PERSISTED-STATE growth — the incremental-dedup signature index
    # (maintained mid-run) and the growth-gated IVF retrain + atomic
    # swap — which the scan-shaped probes above cannot see
    "streaming_incremental_dedup",
    "similarity_ivf_refresh",
    # r5 late: the round's training-heavy additions — PQ (m kmeans loops
    # + ADC scan + rerank), SemDeDup (kmeans + within-cell pairs, the
    # O(sum cell^2) verify), and the KMV overlap sketch (distinct passes
    # + O(k) algebra, expected ~flat)
    "similarity_pq_search",
    "dedup_semdedup",
    "agg_kmv_overlap",
    # r6: the round's new corpus-wide operators — the bigram LM score
    # (two count tables + probability joins, expected ~linear) and RRF
    # hybrid retrieval (two TakeOrdered pools + bounded-pool windows,
    # expected ~flat beyond the channel scans)
    "text_lm_score",
    "similarity_hybrid_rrf",
    # r7: the SQL write surface under the 10x lens — the full-sync
    # MERGE (inner + two anti-joins + whole-table conflict guard, one
    # RowDelta commit) and the CREATE/INSERT/dynamic-OVERWRITE chain
    # (partitioned write path); the SQL count(*) plane is metadata-only
    # and rides on manifest size, not data size — included to prove the
    # driver planning stays flat
    "table_sql_merge_sync",
    "table_sql_insert_overwrite",
    "table_sql_count_meta",
    # r7 late: incremental MV maintenance — refresh cost must ride on
    # CHANGED rows (the DELETE + INSERT ranges are constant across
    # scales), not base size, so the probe expectation is ~flat beyond
    # the base build
    "table_sql_mview",
    # r7 session 2: the classifier (tokenize + tiny centroid broadcast,
    # expected ~linear), the per-group order-statistics quantiles (one
    # window sort per lang), and the composed quality gate (LM score +
    # threshold window + broadcast gate — the LM plan dominates)
    "text_rocchio_classify",
    "stats_exact_quantiles",
    "pipeline_quality_gate",
    # r7 session 2 late: the bucketized interval join (interval
    # replication ∝ total length / width, then a hash join), the
    # inverted-index keyword channel (build + pruned read), and the
    # batch Python DataSource read (planned tasks as partitions,
    # pyarrow workers)
    "join_interval_events",
    "similarity_keyword_index",
    "table_batch_source_read",
    # the DataSource WRITE path at 10x: a file stream of every order
    # row through writeStream.format(...) then the batch-source read —
    # cost should ride on rows written (expect ~linear, not super)
    "streaming_dsv2_roundtrip",
    # r8: runtime-filtered star joins — cost must ride on the PRUNED
    # fact slice (dim keys fixed per sf ratio, fact partitions 10x), so
    # the expectation is well under 10x; the grouped-count SQL is
    # metadata-only and should stay ~flat beyond the table build
    "join_runtime_filtered",
    "table_sql_star_pruned",
    "table_sql_group_count",
    # r8 session 3: the KMV stats plane (per-file bottom-k build +
    # store-served estimate — the analyze scan is ~linear, the answer
    # path metadata-only), dictionary skipping (distinct per file +
    # pruned point lookup, expect well under 10x on the read), and the
    # co-located bucket join (per-bucket merges, NO shuffle — the probe
    # guards the per-bucket memory shape staying linear)
    "meta_kmv_ndv",
    "table_scan_dict_pruned",
    "join_colocated_buckets",
    "join_feature_assembly",
    # r8 session 4: the bloom plane (per-file distinct-hash scan +
    # Arrow bitset build is ~linear; the point lookup reads ~1 file at
    # ANY scale), the co-located GROUP BY (per-bucket partial
    # aggregation, NO shuffle — group count per bucket bounds memory),
    # and the histogram fold (analyze is one scan, the grouped count
    # itself is metadata-only and should stay ~flat beyond the build)
    "table_scan_bloom_pruned",
    "agg_colocated_groupby",
    "meta_histogram_counts",
    # r9: the bloom-tightened runtime filter (store probe cost ∝ files
    # x build hashes with per-file early exit — the worst r8 ratio's
    # fix, expect well under the old 6.18x), the N-way co-located SQL
    # star (per-bucket assemblies, no shuffle), the zero-I/O grouped
    # min/max fold (metadata-only, ~flat beyond the build), and the
    # incremental-through-compaction read (cost ∝ appended slice)
    "join_runtime_bloom",
    "table_sql_multijoin",
    "table_sql_minmax_meta",
    "table_incremental_compacted",
    # r9 late: DSIR importance selection — a bigram explode over the
    # corpus (the trigram-novelty cost class) + a broadcast S-table
    # join + TakeOrdered; expected ~linear
    "sample_dsir_select",
    # r10: exact-substring dedup (all-offset k-token windows — one md5
    # hash shuffle ∝ corpus tokens, islands merge ∝ duplicated volume;
    # expected ~linear like dedup_spans), the chain-spelled co-located
    # star (per-bucket assembly, no shuffle), and the pair-dictionary
    # conjunction prune (analyze is one two-column scan; the pruned
    # lookup reads the surviving file slice)
    "dedup_substrings",
    "table_sql_chain_join",
    "table_scan_pair_pruned",
    # r10 late: the sample plane (analyze is one scan with per-file
    # bottom-k windows; the serve itself is store-only — k rows per
    # file — so the query should grow with the BUILD, never the data
    # volume beyond one pass)
    "stats_store_quantiles",
    "stats_store_quantiles_grouped",
    # r11 (verdict #7: the two unprobed r10 ops): the stats-store GC
    # (both join sides one row per FILE — expect ~flat beyond the
    # build) and the SQL percentile route (store-served, zero data
    # I/O at answer time — growth rides on the ANALYZE scan only);
    # plus the round's new surface: the delete-masked store serve
    # (mask ∝ delete rows, guard aggregates metadata-sized), the
    # grouped SQL percentile spelling, and the two-key grid-cell star
    # (per-cell assembly, no shuffle; dim re-reads bounded by the
    # other axis's modulus)
    "table_vacuum_stats",
    "table_sql_approx_quantile",
    "stats_store_quantiles_deleted",
    "table_sql_approx_quantile_grouped",
    "table_sql_two_key_star",
]

# Probe OVERRIDES: operators whose probe configuration must differ from
# the registered query's.  Empty since r6: dedup_semantic now DERIVES
# its cell count from the corpus by default (max(8, ceil(N/250)) —
# SemDeDup's own recipe), so the registered dedup_semdedup query itself
# scales; the probe measures exactly what ships.
PROBE_OVERRIDES = {}


def _rotated_alphabet(i: int) -> str:
    a = string.ascii_lowercase
    return a[i:] + a[:i]


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(DERIVED, "_SUCCESS_ALL")):
        return
    os.makedirs(DERIVED, exist_ok=True)
    for t in SHARED:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{DERIVED}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for col, step in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents" and i > 0:
                rot = _rotated_alphabet(i)
                c = c.withColumn(
                    "text", F.translate("text", string.ascii_lowercase, rot))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DERIVED}/{t}.parquet")
    open(os.path.join(DERIVED, "_SUCCESS_ALL"), "w").write("ok")


def _run(spark, name: str, sf_dir: str) -> tuple:
    fn = PROBE_OVERRIDES.get(name) or Q._REGISTRY[name][0]
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    return time.time() - t0, n


def main() -> int:
    out_path = "BENCH_sf1.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("scale_probe")
    t0 = time.time()
    build_sf1(spark)
    gen_s = round(time.time() - t0, 1)

    result = {"sf0.1": {}, "sf1": {}, "ratio": {}, "rows_sf1": {},
              "data_ratio": float(COPIES), "gen_sec": gen_s}
    for name in PROBE_QUERIES:
        _run(spark, name, "/root/testdata/sf0.01")      # warm (JIT/codegen)
        s01, _ = _run(spark, name, SRC)
        s1, n1 = _run(spark, name, DERIVED)
        result["sf0.1"][name] = round(s01, 3)
        result["sf1"][name] = round(s1, 3)
        result["rows_sf1"][name] = n1
        ratio = round(s1 / max(s01, 1e-3), 2)  # epsilon: never div-by-zero
        result["ratio"][name] = ratio
        print(f"# {name}: sf0.1 {s01:.2f}s -> sf1 {s1:.2f}s "
              f"(x{ratio:.1f}, {n1} rows)", flush=True)

    worst = max(result["ratio"].values())
    result["worst_ratio"] = worst
    result["verdict"] = ("ok: every query scales at or below data growth"
                        if worst <= 13.0 else
                        "SUPER-LINEAR suspect: see worst_ratio")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"metric": "sf1_worst_ratio", "value": worst,
                      "unit": "x", "queries": result["ratio"], "sf": 1.0}))
    return 0 if worst <= 13.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
