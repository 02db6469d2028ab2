"""Metadata-scale planning probe (r4 verdict #8): plan a synthetic
1M-entry manifest set from a single node and assert wall-time and
driver-RSS bounds.

1M data files x 128 MB target size ~= 128 TB of table — the scale behind
the reference's "multi-petabyte table planned from a single node" claim
(site/docs/performance.md).  Planning there is O(metadata): manifest-list
pruning, then per-entry partition + metrics filtering.  Our vectorized
path (catalog/plan_vectorized.py) does the per-entry stage columnar; this
probe puts a committed number on it.

The manifests are REAL manifest parquet files (written once under /tmp,
reused across runs), with the same stat shapes the engine writes:
partition tuples, per-column bounds, null/nan counts, stat-less files,
delete files.  Three filters are timed: a partition point lookup, a
partition+metrics range, and the no-filter full plan.

Usage: python tools/plan_scale_probe.py [--out BENCH_planning.json]
Exit != 0 if any bound is violated.
"""

from __future__ import annotations

import json
import os
import random
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.catalog import plan_vectorized as PV
from linkedin_iceberg_spark.expressions import (
    Evaluator,
    and_,
    bind,
    eq,
    gt_eq,
    inclusive_projection,
    lt,
)
from linkedin_iceberg_spark.schema import NestedField

TOTAL_ENTRIES = 1_000_000
ENTRIES_PER_MANIFEST = 10_000  # the engine's own manifest target size
CACHE = os.environ.get("SPARK_GRAFT_PLAN_PROBE_DIR",
                       "/tmp/liceberg_plan_probe")

# committed bounds: FILTERED planning over 1M entries must stay
# interactive on one node (pruned rows never pay Python materialization);
# the no-filter full plan materializes all ~1M surviving entries as
# driver objects and gets a looser bound — at 100 TB a full-table scan
# plan is a batch operation, not an interactive one
PLAN_SEC_MAX = 15.0
FULL_PLAN_SEC_MAX = 90.0
RSS_MB_MAX = 6144.0

SCHEMA = Schema([
    NestedField(1, "id", "long"),
    NestedField(2, "cat", "string"),
    NestedField(3, "val", "double"),
])
TYPES = {1: "long", 2: "string", 3: "double"}
PTYPES = {"cat": "string"}
CATS = ["alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa"]


def _mk_entries(n: int, seed: int) -> list:
    """Entries mirroring what the write path records: partition-clustered
    within a manifest, varied bounds, occasional stat-less/zero-row/delete
    files."""
    rng = random.Random(seed)
    cat = CATS[seed % len(CATS)]  # manifests are partition-clustered
    out = []
    for i in range(n):
        lo = rng.randint(0, 10_000_000)
        hi = lo + rng.randint(0, 50_000)
        rc = rng.choice([0, 1_000, 100_000, 1_000_000])
        stats = rng.random() < 0.9
        df = M.DataFile(
            file_path=f"/data/{cat}/f{seed}_{i}.parquet",
            partition={"cat": cat},
            record_count=rc,
            file_size_in_bytes=128 * 1024 * 1024,
            value_counts={1: rc, 2: rc, 3: rc} if stats else {},
            null_value_counts={1: 0, 2: rng.choice([0, 3]), 3: 0}
            if stats else {},
            nan_value_counts={3: rng.choice([0, 2])} if stats else {},
            lower_bounds={1: lo, 2: "a", 3: float(lo)} if stats else {},
            upper_bounds={1: hi, 2: "zz", 3: float(hi)} if stats else {},
            content=(M.CONTENT_POSITION_DELETES if rng.random() < 0.01
                     else M.CONTENT_DATA),
            spec_id=0,
        )
        out.append(M.ManifestEntry(M.STATUS_ADDED, 1, i % 17, df))
    return out


def build_manifests() -> list:
    n_manifests = TOTAL_ENTRIES // ENTRIES_PER_MANIFEST
    marker = os.path.join(CACHE, "_OK")
    paths = [os.path.join(CACHE, f"m{i}.parquet")
             for i in range(n_manifests)]
    if not os.path.exists(marker):
        os.makedirs(CACHE, exist_ok=True)
        for i, p in enumerate(paths):
            M.write_manifest(p, _mk_entries(ENTRIES_PER_MANIFEST, i),
                             TYPES, PTYPES)
        open(marker, "w").write("ok")
    return paths


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    out_path = "BENCH_planning.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    t0 = time.time()
    paths = build_manifests()
    gen_s = round(time.time() - t0, 1)

    spec = PartitionSpec.builder_for(SCHEMA).identity("cat").build() \
        .bind(SCHEMA)

    filters = {
        "partition_point": eq("cat", "alpha"),
        "partition_and_range": and_(eq("cat", "beta"),
                                    and_(gt_eq("id", 4_000_000),
                                         lt("id", 4_100_000))),
        "full_plan": None,
    }

    result = {"entries": TOTAL_ENTRIES, "manifests": len(paths),
              "gen_sec": gen_s, "plan": {}, "kept": {}}
    ok = True
    for name, expr in filters.items():
        t0 = time.time()
        # the real planning loop: read manifest columns, filter
        # vectorized, materialize survivors only
        if expr is None:
            tables = [M.read_manifest_table(p) for p in paths]
            data = [e for t in tables
                    for e in M.entries_from_table(t, TYPES, PTYPES)
                    if e.status != M.STATUS_DELETED
                    and e.data_file.content == M.CONTENT_DATA]
        else:
            bound = bind(SCHEMA, expr)
            part_eval = Evaluator(inclusive_projection(spec, bound))
            tables = [M.read_manifest_table(p) for p in paths]
            data, _dels = PV.filter_entries(
                tables, bound, {0: part_eval}, part_eval, TYPES, PTYPES)
        dt = time.time() - t0
        bound = FULL_PLAN_SEC_MAX if name == "full_plan" else PLAN_SEC_MAX
        ok = ok and dt <= bound
        result["plan"][name] = round(dt, 2)
        result["kept"][name] = len(data)
        print(f"# {name}: {dt:.2f}s (bound {bound:.0f}s), "
              f"kept {len(data)}/{TOTAL_ENTRIES}", flush=True)

    rss = round(_rss_mb(), 1)
    result["peak_rss_mb"] = rss
    result["entries_per_sec_full"] = int(
        TOTAL_ENTRIES / max(result["plan"]["full_plan"], 1e-3))
    result["bounds"] = {"plan_sec_max": PLAN_SEC_MAX,
                        "full_plan_sec_max": FULL_PLAN_SEC_MAX,
                        "rss_mb_max": RSS_MB_MAX}
    ok = ok and rss <= RSS_MB_MAX
    result["ok"] = ok
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    worst_filtered = max(v for k, v in result["plan"].items()
                         if k != "full_plan")
    print(json.dumps({"metric": "plan_1m_entries_filtered_worst_sec",
                      "value": worst_filtered, "unit": "sec",
                      "queries": result["plan"], "sf": None}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
