"""DML/compaction must treat v2 delete files as metadata, not data.

Regressions covered:
  - delete_where CoW rewrite of a file with pending equality deletes must
    not resurrect the deleted rows (rewrite reads LIVE rows).
  - rewrite_data_files must not select delete files as compaction input,
    must carry them through the swap, and must apply pending deletes.
  - cherry_pick with a divergent base must re-apply the staged append on
    the CURRENT base instead of fast-forwarding to the staged snapshot's
    stale manifest list (ref: core/.../SnapshotManager.java:65-171).
"""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.expressions import gt_eq


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _eq_delete(spark, t, lo, hi):
    keys = spark.createDataFrame([(k,) for k in range(lo, hi)],
                                 "o_orderkey bigint")
    t.row_delta(equality_delete_keys=keys, key_cols=["o_orderkey"])


def test_delete_where_does_not_resurrect_eq_deleted_rows(
        catalog, orders_df, spark):
    t = catalog.create_table("db.dw_safety", orders_df)
    t.append(orders_df)
    n = orders_df.count()
    n_lt50 = orders_df.filter(F.col("o_orderkey") < 50).count()
    _eq_delete(spark, t, 0, 50)
    assert t.to_df().count() == n - n_lt50

    # partial-file delete forces a CoW rewrite of files that ALSO carry the
    # pending equality delete; the rewrite must read live rows only
    hi_cut = 90000
    n_hi = t.to_df().filter(F.col("o_totalprice") >= hi_cut).count()
    t.delete_where(gt_eq("o_totalprice", float(hi_cut)))
    out = t.to_df()
    assert out.count() == n - n_lt50 - n_hi
    assert out.filter(F.col("o_orderkey") < 50).count() == 0  # stayed dead
    assert out.filter(F.col("o_totalprice") >= hi_cut).count() == 0


def test_delete_where_keeps_delete_files_live(catalog, orders_df, spark):
    t = catalog.create_table("db.dw_keep", orders_df)
    t.append(orders_df)
    _eq_delete(spark, t, 0, 50)
    t.delete_where(gt_eq("o_totalprice", 90000.0))
    # the equality delete file must still be present (not dropped/rewritten)
    contents = {e.data_file.content for e in t._live_entries()}
    assert M.CONTENT_EQUALITY_DELETES in contents
    # and still scope correctly: a later re-append of the keys survives
    t.append(orders_df.filter((F.col("o_orderkey") < 50)
                              & (F.col("o_totalprice") < 90000)))
    back = t.to_df().filter(F.col("o_orderkey") < 50).count()
    assert back == orders_df.filter((F.col("o_orderkey") < 50)
                                    & (F.col("o_totalprice") < 90000)).count()


def test_compaction_applies_pending_deletes(catalog, orders_df, spark):
    t = catalog.create_table("db.cp_safety", orders_df)
    for i in range(4):
        t.append(orders_df.filter(F.col("o_orderkey") % 4 == i))
    n = orders_df.count()
    n_lt50 = orders_df.filter(F.col("o_orderkey") < 50).count()
    _eq_delete(spark, t, 0, 50)
    assert t.to_df().count() == n - n_lt50

    stats = t.rewrite_data_files(min_input_files=2)
    assert stats["rewritten_files"] > 0
    # counts unchanged by compaction; deleted rows still gone
    out = t.to_df()
    assert out.count() == n - n_lt50
    assert out.filter(F.col("o_orderkey") < 50).count() == 0
    # no all-null garbage rows from misread delete files
    assert out.filter(F.col("o_orderkey").isNull()).count() == 0


def test_cherry_pick_divergent_base_keeps_later_commits(catalog, orders_df):
    a = orders_df.filter(F.col("o_orderkey") % 3 == 0)
    b = orders_df.filter(F.col("o_orderkey") % 3 == 1)
    c = orders_df.filter(F.col("o_orderkey") % 3 == 2)
    t = catalog.create_table("db.cp_div", orders_df)
    t.append(a)
    t.append(b, wap_id="wap-b")        # staged, current still = A
    staged_id = t.metadata.staged_wap["wap-b"]
    t.append(c)                        # current = A + C (divergent from stage)
    t.cherry_pick(staged_id)
    # all three batches must be present — fast-forwarding to the staged
    # snapshot would have dropped C
    assert t.to_df().count() == a.count() + b.count() + c.count()
    # published WAP id is detected: picking it again must fail
    with pytest.raises(ValueError, match="duplicate"):
        t.cherry_pick(staged_id)


def test_eq_delete_skips_disjoint_data_files(catalog, spark, sf_dir):
    """r4: equality-delete files carry key bounds; a data file whose key
    range is disjoint never pays the anti-join (DeleteFileIndex metrics
    parity) — and with no overlapping file at all, the scan plans zero
    delete-laden tasks and metadata-only counting still works."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.catalog.row_delta import row_delta

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy("o_orderkey")
    t = catalog.create_table("db.eqskip", o)
    t.append(o.filter(F.col("o_orderkey") <= 500))
    t.append(o.filter((F.col("o_orderkey") > 500)
                      & (F.col("o_orderkey") <= 1000)))
    n = t.to_df().count()
    # delete keys that EXIST but sit outside every file's range
    row_delta(t, equality_delete_keys=o.filter(F.col("o_orderkey") > 1200)
              .select("o_orderkey"), key_cols=["o_orderkey"])
    t.refresh()
    _data2, dels2 = t._live_data_and_deletes()
    assert len(dels2) == 1  # the delete file is real and live
    tasks = t.new_scan().plan_files()
    assert all(not task.deletes for task in tasks)
    assert t.to_df().count() == n
    # count stays metadata-only despite the live delete file
    scan = t.new_scan()

    def no_read(tasks=None):  # pragma: no cover
        raise AssertionError("disjoint eq-delete forced a data read")
    scan._to_df_default = no_read
    assert scan.count_rows() == n

    # overlapping keys DO attach (and delete)
    row_delta(t, equality_delete_keys=o.filter(F.col("o_orderkey") <= 5)
              .select("o_orderkey"), key_cols=["o_orderkey"])
    t.refresh()
    laden = [task for task in t.new_scan().plan_files() if task.deletes]
    assert len(laden) == 1  # only the low-key file overlaps
    dropped = o.filter(F.col("o_orderkey") <= 5).count()
    assert t.to_df().count() == n - dropped


def test_pos_delete_skips_unreferenced_files(catalog, spark, sf_dir):
    """r4: position-delete entries carry their referenced-path range;
    data files outside it never pay the anti-join."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.catalog.row_delta import row_delta

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy("o_orderkey")
    t = catalog.create_table("db.posskip", o)
    t.append(o.filter(F.col("o_orderkey") <= 500))
    t.append(o.filter((F.col("o_orderkey") > 500)
                      & (F.col("o_orderkey") <= 1000)))
    t.refresh()
    entries, _ = t._live_data_and_deletes()
    assert len(entries) == 2
    target = sorted(e.data_file.file_path for e in entries)[0]
    # delete rows 0..4 of ONE specific file by position
    pos = spark.createDataFrame([(target, i) for i in range(5)],
                                "file_path string, pos long")
    row_delta(t, position_deletes=pos)
    t.refresh()
    laden = [task for task in t.new_scan().plan_files() if task.deletes]
    assert len(laden) == 1
    assert laden[0].file.file_path == target
    n_all = o.filter(F.col("o_orderkey") <= 1000).count()
    assert t.to_df().count() == n_all - 5


def test_delete_bounds_survive_manifest_rewrite(catalog, spark, sf_dir):
    """The pruning bounds (eq-delete key ranges, pos-delete path ranges)
    must round-trip through manifest rewrite serde."""
    from pyspark.sql import functions as F

    from linkedin_iceberg_spark.catalog import manifests as M
    from linkedin_iceberg_spark.catalog.row_delta import row_delta

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy("o_orderkey")
    t = catalog.create_table("db.serde_b", o)
    t.append(o.filter(F.col("o_orderkey") <= 500))
    row_delta(t, equality_delete_keys=o.filter(F.col("o_orderkey") > 1200)
              .select("o_orderkey"), key_cols=["o_orderkey"])
    t.refresh()
    _d0, dels0 = t._live_data_and_deletes()
    assert len(dels0) == 1  # premise: the delete file exists
    t.rewrite_manifests()
    t.refresh()
    _data, dels = t._live_data_and_deletes()
    fid = t.schema.id_for_name("o_orderkey")
    assert dels and dels[0].data_file.lower_bounds.get(fid) is not None
    # pruning still disjoint after the rewrite
    assert all(not task.deletes for task in t.new_scan().plan_files())


def test_delete_pruning_randomized_model(catalog, spark):
    """r4: randomized eq/pos-delete workloads (NULL keys included) vs a
    pure-Python model — pruning may only SKIP work, never change rows."""
    import random

    from pyspark.sql import Row

    from linkedin_iceberg_spark.catalog.row_delta import row_delta

    for seed in (3, 17):
        rng = random.Random(seed)
        t = catalog.create_table(
            f"db.prune{seed}",
            spark.createDataFrame([], "k long, v long"))
        live = {}  # rowid -> (k, v); model of surviving rows
        rowid = 0
        batches = []
        for b in range(4):
            rows = []
            base = rng.randint(0, 500)
            for i in range(rng.randint(5, 15)):
                k = None if rng.random() < 0.15 else base + i
                rows.append((rowid, k, rng.randint(0, 9)))
                rowid += 1
            batches.append(rows)
            t.append(spark.createDataFrame(
                [Row(k=k, v=v) for (_rid, k, v) in rows], "k long, v long"))
            for rid, k, v in rows:
                live[rid] = (k, v)
            # random eq-delete set: nulls, present keys, absent keys
            if rng.random() < 0.8:
                keys = set()
                if rng.random() < 0.5:
                    keys.add(None)
                for _ in range(rng.randint(1, 5)):
                    keys.add(rng.choice([base + rng.randint(0, 14),
                                         rng.randint(2000, 3000)]))
                row_delta(t, equality_delete_keys=spark.createDataFrame(
                    [Row(k=k) for k in keys], "k long"), key_cols=["k"])
                t.refresh()
                # model: eq-deletes hit STRICTLY older rows, null-safe
                live = {rid: (k, v) for rid, (k, v) in live.items()
                        if k not in keys}
        key = lambda kv: (kv[0] is None, kv[0] if kv[0] is not None else 0,
                          kv[1])
        got = sorted(((r["k"], r["v"]) for r in t.to_df().collect()),
                     key=key)
        want = sorted(((k, v) for (k, v) in live.values()), key=key)
        assert got == want, f"seed {seed} diverged"
