"""Physical-plan audit: prove the scale-critical plan properties hold.

Runs a representative set of headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.01), captures `explain(formatted)`, and checks each query's
declared plan contract: filters pushed to the parquet scan, pruned read
schemas, broadcast joins on dim tables, no Cartesian products outside the
declared-cross queries, whole-stage codegen spans present.

Usage: python tools/explain_audit.py [--write-md PLANS.md]
Exit code != 0 if any contract fails — wire into CI/pre-commit as a plan
regression gate.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkedin_iceberg_spark import queries as Q
from linkedin_iceberg_spark.session import get_spark

# query -> (must-contain fragments, must-NOT-contain fragments)
CONTRACTS = {
    "agg_pricing_summary": (
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate",
         "codegen id"],
        ["CartesianProduct"]),
    "join_broadcast_dims": (
        ["BroadcastHashJoin", "codegen id"],
        ["CartesianProduct", "SortMergeJoin"]),
    "join_multiway": (
        ["BroadcastHashJoin"],
        ["CartesianProduct"]),
    "join_inner_equi": (
        ["PushedFilters", "codegen id"],
        ["CartesianProduct"]),
    "window_topk_per_group": (
        ["Window", "codegen id"],
        ["CartesianProduct"]),
    "sort_global_topk": (
        ["TakeOrderedAndProject"],
        ["CartesianProduct"]),
    "similarity_topk": (
        ["TakeOrderedAndProject"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "dedup_exact": (
        # partial_min = map-side combine: shuffle carries one row per
        # distinct key per mapper, the property that matters at 100 TB
        ["HashAggregate", "partial_min"],
        ["CartesianProduct", "BatchEvalPython"]),
    "dedup_minhash_lsh_full": (
        ["HashAggregate"],
        ["CartesianProduct", "BatchEvalPython"]),
    "text_quality_score": (
        ["codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_asof": (
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython"]),
    "similarity_ivf_topk": (
        ["TakeOrderedAndProject"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_scan_pruned": (
        # engine scan: pruned file list + residual-free read; Catalyst
        # still shows the parquet scan with a pruned ReadSchema
        ["Scan parquet", "codegen id"],
        ["CartesianProduct"]),
    "table_scan_planned_tasks": (
        # our CombinedScanTasks drive the read: one Arrow-batched
        # MapInPandas over the task descriptors, never a per-row Python UDF
        ["MapInPandas"],
        ["CartesianProduct", "BatchEvalPython"]),
    "pipeline_training_release": (
        # the end-to-end release: banded-signature aggregation with
        # map-side partials, anti-join survivors, per-source mixture/
        # split/pack windows on hashpartitioning — no single-partition
        # funnel anywhere, no Python
        ["HashAggregate", "Window", "hashpartitioning"],
        ["SinglePartition", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "agg_hll_mergeable": (
        # per-source sketches build with map-side partials; the global
        # estimate comes from MERGING sketches, not rescanning rows
        ["HashAggregate", "partial_hll_sketch_agg"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "text_token_entropy": (
        # two hash aggregations, both map-side combinable; the totals
        # join is an equi-join on doc_id
        ["HashAggregate", "partial_count", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "similarity_matryoshka": (
        # prefix slice + cosine stay JVM-side; top-k is per-partition
        # heaps, never a global sort
        ["TakeOrderedAndProject", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "dedup_text_clustered": (
        # final labeling join is an equi-join on ids; the CC stage is
        # iterative and audited by its own tests
        ["Join", "codegen id"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "dedup_spans": (
        # spans shuffle once on the md5 hash (HashAggregate with map-side
        # partial min over the order-encoded long); reassembly is a
        # per-doc aggregate — no window over the corpus, no Python
        ["HashAggregate", "partial_min", "Join"],
        ["CartesianProduct", "Window", "BatchEvalPython",
         "ArrowEvalPython"]),
    "dedup_simhash": (
        # bit votes are JVM-side aggregates with map-side combine; the
        # pigeonhole join is an EQUI-join on (segment, value) — any hash/
        # merge strategy is fine, a nested-loop/cartesian product is not
        ["HashAggregate", "partial_sum", "Join"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "agg_approx_distinct": (
        # HLL++ sketch merges partially map-side — constant memory/group
        ["HashAggregate", "partial_approx_count_distinct"],
        ["CartesianProduct", "BatchEvalPython"]),
    "agg_approx_percentile": (
        # GK sketch + exact percentile both merge partially map-side
        ["HashAggregate", "partial_approx_percentile"],
        ["CartesianProduct", "BatchEvalPython"]),
    "dedup_embedding": (
        # LSH candidates + cosine verify: equi-joins only, all arithmetic
        # JVM-side; the CC stage is iterative and audited by its own tests
        ["Join", "codegen id"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "text_chunk": (
        # window starts explode JVM-side; tokens never leave the row until
        # the final explode — no shuffle before the orderBy
        ["Generate", "codegen id"],
        ["hashpartitioning", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "text_pack": (
        # one global-sort window pass (the packing order), nothing else
        ["Window", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "text_pack_sharded": (
        # the 100 TB mode: the cumulative-sum window partitions on the
        # shard key (hashpartitioning), NEVER a single-partition Exchange
        # — each shard's stream packs in its own task
        ["Window", "hashpartitioning", "codegen id"],
        ["SinglePartition", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "similarity_knn_join": (
        # query side broadcast (vectors travel once), per-query window
        # top-k; the window shuffle carries scored triples, not vectors
        ["BroadcastNestedLoopJoin", "Window", "codegen id"],
        ["SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"]),
    "sample_stratified": (
        # one hash + CASE per row, filter pushed into the scan stage; the
        # only Exchange is the final orderBy's rangepartitioning
        ["Filter", "codegen id"],
        ["hashpartitioning", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "sample_cap_per_source": (
        # per-group cap: ONE window partitioned on the group key
        # (hashpartitioning), never a single-partition funnel
        ["Window", "hashpartitioning", "codegen id"],
        ["SinglePartition", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "sample_token_budget_mix": (
        # per-group ROWS-frame cumulative sum: same shape as the cap
        ["Window", "hashpartitioning", "codegen id"],
        ["SinglePartition", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "legacy_hive_scan": (
        # partition dirs pruned BEFORE Spark sees the paths; only the
        # residual (non-partition) predicate remains as a row filter,
        # pushed to the parquet scan
        ["PushedFilters: [IsNotNull(o_totalprice)", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "text_repetition": (
        # bigram pass: posexplode+lead+groupBy — generate/window/agg all
        # JVM-side with map-side partial counts; line stats pure array fns
        ["posexplode", "Window", "HashAggregate", "partial_count"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "text_pii_scrub": (
        # single projection of regex built-ins — the only Exchange is the
        # final orderBy's rangepartitioning (oracle determinism), never a
        # hash shuffle of the data
        ["Project", "codegen id"],
        ["hashpartitioning", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "sample_temperature_mix": (
        # quota map (one row per group) joins back by BROADCAST; the rank
        # window partitions on the group key.  The only SinglePartition
        # exchange is the metadata-sized total-weight aggregate (20 rows),
        # so it is not forbidden here — the corpus itself never funnels.
        ["Window", "hashpartitioning", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "sample_shuffle_shards": (
        # one hash-partition exchange on the shard key + per-shard
        # row_number — the global shuffle without a global sort
        ["Window", "hashpartitioning", "codegen id"],
        ["SinglePartition", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"]),
    "text_trigram_novelty": (
        # the corpus trigram-frequency table (bounded by |charset|^3) is
        # BROADCAST back onto the exploded rows — the explode output is
        # never shuffled for the lookup; per-doc re-agg combines map-side
        ["Generate", "BroadcastHashJoin", "HashAggregate", "partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "events_funnel": (
        # each step: filter to one event type -> per-user min with map-side
        # partials -> equi-join the previous step's anchor; never a global
        # sort/window over the stream, never a cross product
        ["HashAggregate", "partial_min", "Join"],
        ["CartesianProduct", "Window", "BatchEvalPython",
         "ArrowEvalPython"]),
    "events_retention": (
        # per-user min cohort map joined back EQUI-KEYED, then distinct +
        # count — all map-side combinable.  The join strategy is
        # AQE-decided: the cohort map is ONE ROW PER USER, so the
        # contract must NOT require a BroadcastHashJoin (at 100 TB the
        # shuffled equi-join is the correct plan) and must not forbid
        # SortMergeJoin either
        ["HashAggregate", "partial_min"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Window",
         "BatchEvalPython", "ArrowEvalPython"]),
    "events_transitions": (
        # ONE per-user window (hashpartitioning) + count aggregate
        ["Window", "hashpartitioning", "HashAggregate", "partial_count"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "dedup_edit_distance": (
        # banded candidates -> two equi-joins carry texts to the verify
        # step -> levenshtein filter; never an all-pairs shape
        ["HashAggregate", "Join", "levenshtein"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "text_decontaminate": (
        # shingle-hash anti-join: benchmark side broadcast, corpus side
        # never re-shuffled into an all-pairs shape
        ["BroadcastHashJoin", "LeftAnti", "codegen id"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "agg_kmv_overlap": (
        # one distinct per corpus then bottom-k via TakeOrdered; all
        # sketch algebra runs on <= k rows, JVM-side end to end
        ["TakeOrderedAndProject", "HashAggregate", "xxhash64"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_snapshot_diff": (
        # exceptAll multiset diff over the CHANGED-file candidates only;
        # equi-shaped aggregates, never an all-pairs comparison
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"]),
    "table_key_index_lookup": (
        # the planned read carries the key predicate INTO the parquet
        # scan of the few matching files (row-group skipping on top of
        # index-level file pruning)
        ["PushedFilters", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_tpch_q3": (
        # both date predicates and the segment filter reach the scans;
        # top-10 is TakeOrdered, never a global sort
        ["PushedFilters", "TakeOrderedAndProject", "HashAggregate"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_tpch_q10": (
        # quarter + returnflag predicates pushed; nation broadcast;
        # fact-side strategy AQE-decided
        ["PushedFilters", "TakeOrderedAndProject", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "similarity_pq_search": (
        # the returned frame is the exact rerank: codes-only ADC scan
        # feeds a semi-join shortlist; top-k via TakeOrdered
        ["TakeOrderedAndProject"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_sql_pruned": (
        # the SQL-path pushdown (r6): the registered view is a PRUNED
        # engine scan, so Spark's plan reads a filtered parquet file
        # list — fewer-files evidence lives in tests/test_catalog_sql.py
        # (inputFiles < live); here: a real parquet scan, codegen, and
        # no Python anywhere
        ["Scan parquet", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_write_ordered": (
        # the range scan over a write-ordered table reads the planned
        # (metrics-pruned) file subset — fewer-files evidence is the
        # inline assert + tests/test_write_order_r7.py; here: a real
        # parquet scan in codegen, no Python
        ["Scan parquet", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_sql_insert_overwrite": (
        # the final state is a plain engine-table read: parquet scan in
        # codegen, no Python; the dynamic-overwrite routing itself is
        # asserted in the query (snapshot operation + summary) and
        # tests/test_sql_write_surface_r7.py
        ["Scan parquet", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_sql_count_meta": (
        # the SQL count(*) is answered from manifest record counts: the
        # result frame is a driver-local row — NO parquet scan anywhere
        # in the plan (the poison assert in the query body additionally
        # proves the fast path never touched a data file)
        ["Scan ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "BatchEvalPython"]),
    "text_lm_score": (
        # count tables are map-side-combinable hash aggregations; the
        # bigram window shuffles once on doc_id; integer DIV math stays
        # in codegen — no Python, no cartesian
        ["HashAggregate", "Window", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "text_rocchio_classify": (
        # feature counts and centroid sums are map-side-combinable hash
        # aggregations; the centroid table (labels x 64) broadcasts into
        # the cross-term join; decimal(38,0) distance math stays JVM-side
        # and the argmin window partitions per doc over |labels| rows
        ["HashAggregate", "BroadcastHashJoin", "Window"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "streaming_dsv2_roundtrip": (
        # after the epoch-stamped stream write, the read-back is the
        # same Python BatchScan shape as table_batch_source_read
        ["BatchScan linkedin_iceberg", "Filter"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "table_batch_source_read": (
        # the Python DataSource scan node with Spark's row-level
        # re-application of the (also plan-time-pushed) filter; no
        # Python expression evaluation in the query plan itself
        ["BatchScan linkedin_iceberg", "Filter"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_runtime_filtered": (
        # the query itself ASSERTS manifest-level file pruning (the
        # in-query plan_files() comparison — runtime filtering happens
        # BEFORE Spark planning, so the physical plan's contribution is
        # the ordinary pruned-scan equi-join shape); no Python eval
        ["Join", "PushedFilters"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "BroadcastNestedLoopJoin"]),
    "table_sql_star_pruned": (
        # the SQL route's auto runtime filter: pruning is pinned by the
        # in-query inputFiles assertion; the plan itself is the plain
        # pruned-scan equi-join with no Python eval
        ["Join"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "BroadcastNestedLoopJoin"]),
    "join_interval_events": (
        # the whole point: an EQUI join on manufactured bucket keys
        # (broadcast at this sf; sort-merge at scale) with the range
        # predicate residual — never a nested loop
        ["Join", "HashAggregate"],
        ["BroadcastNestedLoopJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"]),
    "stats_sampled_quantiles": (
        # per-group bottom-k windows (groups parallel), then ranks over
        # <= k rows per group and the tiny target join — the corpus is
        # never fully sorted
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "stats_global_quantiles": (
        # the global path's signature: a RANGE repartition on the value
        # order with a per-partition-id window — never a partition-less
        # window moving the corpus to one task
        ["rangepartitioning", "Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "similarity_keyword_index": (
        # postings read off the persisted index's parquet (bucket
        # pruning itself is pinned by plan_files counts in
        # tests/test_keyword_index.py), match-count aggregation, and a
        # TakeOrdered pool — no global sort, no Python
        ["Scan parquet", "HashAggregate", "TakeOrderedAndProject"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "pipeline_quality_gate": (
        # LM scoring's map-side-combinable aggs + per-doc window, one
        # per-lang threshold window, and a |langs|-row broadcast gate
        # join; integer math stays in codegen
        ["HashAggregate", "Window", "BroadcastHashJoin", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "stats_exact_quantiles": (
        # grouped rank via per-group window sort (groups are the
        # parallel unit); the |groups| x |pcts| target table broadcasts
        # into the rank equi-join; no partition-less window, no Python
        ["Window", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "similarity_hybrid_rrf": (
        # each channel pools via TakeOrdered (per-partition heaps);
        # the rank windows run over the bounded pool only.  r7: the
        # embedding channel can run off the persisted IVF index — the
        # probed-cells-only file read (partition pruning) is asserted
        # by plan_files counts in tests/test_hybrid_ivf_r7.py, the
        # same evidence split as table_sql_pruned
        ["TakeOrderedAndProject", "Window"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_feature_assembly": (
        # N-way assembly inside per-bucket tasks: no exchange-bearing
        # join stage, no Spark join operator anywhere
        ["MapInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "CartesianProduct"]),
    "join_colocated_buckets": (
        # the join happens INSIDE the per-bucket MapInPandas task: the
        # final sort is the only exchange-bearing stage; no Spark join
        # operator may appear anywhere
        ["MapInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "CartesianProduct"]),
    "agg_colocated_groupby": (
        # the aggregation happens INSIDE the per-bucket MapInPandas
        # task (groups are bucket-confined, so per-bucket results are
        # final): the output sort is the only exchange-bearing stage;
        # no Spark aggregate operator may appear anywhere
        ["MapInPandas"],
        ["HashAggregate", "SortAggregate", "ObjectHashAggregate",
         "CartesianProduct"]),
    "table_scan_dict_pruned": (
        # dictionary skipping already dropped the non-matching files at
        # PLAN time (asserted inside the query: planned < live), so the
        # parquet scan reads the surviving subset with the residual
        # filter pushed; no Python anywhere
        ["Scan parquet", "PushedFilters", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "meta_histogram_counts": (
        # the GROUP BY count folded entirely from the histogram store:
        # the plan's only source is the driver-materialized result rows
        # (Scan ExistingRDD) — NO parquet data scan anywhere
        ["Scan ExistingRDD"],
        ["Scan parquet", "HashAggregate", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"]),
    "meta_topk_bounded": (
        # approx_top_k merged the per-file stores driver-side; the
        # returned frame is the bounded result rows only — no data
        # scan, no aggregate operator in this plan
        ["Scan ExistingRDD"],
        ["Scan parquet", "HashAggregate", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"]),
    "table_scan_bloom_pruned": (
        # bloom skipping dropped the non-matching files at PLAN time
        # (asserted inside the query: planned < bounds-only count for a
        # MID-domain key), so the scan reads the surviving ~1 file with
        # the eq filter pushed; the probe itself runs over the store at
        # plan time, never in this data plan — no Python anywhere
        ["Scan parquet", "PushedFilters", "codegen id"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    # ---- r9 additions ----------------------------------------------------
    "table_sql_multijoin": (
        # N-way star SQL over co-bucketed tables: the assembly happens
        # INSIDE per-bucket MapInPandas tasks — NO Spark join operator
        # anywhere (the final ORDER BY may range-exchange)
        ["MapInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "CartesianProduct"]),
    "table_sql_chain_join": (
        # r10: the chain spelling of the same star (second ON anchors
        # the first feature's key) — transitivity routes it to the same
        # per-bucket assembly, same no-join-operator contract
        ["MapInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "CartesianProduct"]),
    "table_sql_two_key_star": (
        # r11: TWO-KEY star — dims anchor different base keys, the
        # base's spec buckets both, and the statement executes as
        # grid-cell assembly: same no-join-operator contract as the
        # single-key star (ORDER BY may range-exchange)
        ["MapInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "CartesianProduct"]),
    "table_sql_approx_quantile_grouped": (
        # r11: grouped SQL percentile served from the grouped sample
        # store — the route evaluates eagerly and returns driver-built
        # rows: no data scan, no aggregate, no Python in the plan
        ["Scan ExistingRDD"],
        ["Scan parquet", "HashAggregate", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"]),
    "table_sql_minmax_meta": (
        # grouped string min/max + float min folded ENTIRELY from
        # manifest bounds (the query poisons the read path to prove
        # it): the plan's only source is the driver-built result rows
        ["Scan ExistingRDD"],
        ["Scan parquet", "HashAggregate", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"]),
    "table_incremental_compacted": (
        # append-only incremental read after in-range compaction: a
        # plain pruned parquet scan of the appended files' own
        # manifests — no aggregation, no Python
        ["Scan parquet"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
    "join_runtime_bloom": (
        # envelope+bloom runtime filter: pruning happened at PLAN time
        # (store probe), the data plan is the ordinary equi-join with
        # no Python and no nested loop
        ["Join"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "BroadcastNestedLoopJoin"]),
}


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain_audit")
    # AQE hides WholeStageCodegen subgraphs behind AdaptiveSparkPlan until
    # runtime; disable it HERE ONLY so formatted explain shows the codegen
    # spans (production sessions keep AQE on — it adds runtime re-planning
    # on top of the same static shapes this audit checks)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    write_md = None
    if "--write-md" in sys.argv:
        write_md = sys.argv[sys.argv.index("--write-md") + 1]

    registry = Q._REGISTRY
    failures = []
    sections = []
    for name, (need, forbid) in CONTRACTS.items():
        fn, _sql = registry[name]
        df = fn(spark, sf_dir)
        plan = explain_str(df)
        missing = [frag for frag in need if frag not in plan]
        present = [frag for frag in forbid if frag in plan]
        status = "OK" if not missing and not present else "FAIL"
        if status == "FAIL":
            failures.append((name, missing, present))
        print(f"{status:4s} {name}: need-missing={missing} "
              f"forbidden-present={present}", file=sys.stderr)
        sections.append((name, status, need, forbid, plan))

    if write_md:
        with open(write_md, "w") as f:
            f.write(
                "# Physical-plan audit\n\n"
                "Generated by `tools/explain_audit.py` at sf_dir="
                f"`{sf_dir}`.  Each query declares a plan contract — "
                "fragments that MUST appear (pushdown reached the scan, "
                "broadcast chosen, codegen active) and fragments that must "
                "NOT (Cartesian products, row-at-a-time Python in the hot "
                "path).  This file is evidence that the declarative plans "
                "compile to the physical shapes the 100 TB design calls "
                "for; re-run the tool to regenerate after plan changes.\n")
            for name, status, need, forbid, plan in sections:
                f.write(f"\n## {name} — {status}\n\n")
                f.write(f"- must contain: `{'`, `'.join(need)}`\n")
                f.write(f"- must not contain: `{'`, `'.join(forbid)}`\n\n")
                # keep the artifact reviewable: first 60 lines of the plan
                lines = plan.strip().splitlines()
                f.write("```\n" + "\n".join(lines[:60]))
                if len(lines) > 60:
                    f.write(f"\n... ({len(lines) - 60} more lines)")
                f.write("\n```\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
