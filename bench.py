"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Headline set: one representative per operator family (agg, join, window,
sort, set, scalar, dedup, similarity, text, events window, table-format
scan with hidden-partition pruning).  Each query is executed with a
``count()``-style full materialization (``write.format("noop")`` is not
available in local Spark by default, so we drain via ``toLocalIterator``-free
``count`` of a cached plan -- cheap and shuffle-complete).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkedin_iceberg_spark import queries as Q
from linkedin_iceberg_spark.session import get_spark

HEADLINE = [
    "agg_pricing_summary",
    "agg_count_distinct",
    "join_inner_equi",
    "join_multiway",
    "join_broadcast_dims",
    "window_topk_per_group",
    "join_asof",
    "sort_global_topk",
    "set_dedup_rows",
    "scalar_string_funcs",
    "dedup_exact",
    "dedup_minhash_lsh_full",
    "similarity_topk",
    "text_quality_score",
    "events_tumbling_window",
    "table_scan_pruned",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    registry = Q._REGISTRY
    names = [n for n in HEADLINE if n in registry]

    # warmup pass (untimed): JIT + whole-stage-codegen compilation, parquet
    # footer caches, broadcast infra — the same reason the reference's JMH
    # harness runs 3 warmup iterations before measuring
    # (BASELINE.md: IcebergSourceBenchmark.java:49-53)
    warm_sf = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR",
                             "/root/testdata/sf0.001")
    for name in names:
        fn, _sql = registry[name]
        try:
            fn(spark, warm_sf).count()
        except Exception:
            pass

    # five timed passes at the target SF, report the min — page cache,
    # shuffle file reuse, and scheduler jitter make single-shot numbers
    # noisy on a shared machine (JMH reports per-iteration stats for the
    # same reason); observed pass-to-pass spread here is ~10%.  r6: was
    # three — two consecutive rounds of unexplained +6-9% drift on
    # unchanged code made the trend line unfalsifiable, so the harness
    # now records more samples plus the machine's load average, and a
    # quiet-machine reference run is committed each round
    # (BENCH_quiet_r{N}.json) for the driver's number to be read against
    load_start = os.getloadavg()[0]
    times: dict[str, float] = {}
    for _pass in range(5):
        for name in names:
            fn, _sql = registry[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            el = round(time.perf_counter() - t0, 3)
            if name not in times or el < times[name]:
                times[name] = el
            print(f"# {name}: {n} rows in {el:.2f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "passes": 5,
        # scaling legibility (r12): prove which core count took effect —
        # $SPARK_GRAFT_CPUS is honored via session.py's master string, but
        # without these fields an ~1 scaling ratio (structural at sf0.1:
        # single-row-group inputs decode in one task) is indistinguishable
        # from an ignored knob.  Additions only; contract unchanged.
        "cpus": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
        "load_avg_1m_start": round(load_start, 2),
        "load_avg_1m_end": round(os.getloadavg()[0], 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
