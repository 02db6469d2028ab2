"""merge_branch fuzz: random disjoint DML series on main and a branch
must merge to exactly the serial-replay state; random overlapping series
must raise BEFORE anything lands (atomicity)."""

import random

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.metadata import ValidationException
from linkedin_iceberg_spark.expressions import and_, gt_eq, lt

# branch works keys [0, 500); main works keys [1000, 1500) — provably
# disjoint FILES because every append below is coalesce(1) per range
BRANCH_LO, BRANCH_HI = 0, 500
MAIN_LO, MAIN_HI = 1000, 1500


def _run(handle, op, spark):
    kind, lo, hi, shift = op
    if kind == "append":
        handle.append(spark.createDataFrame(
            [(k + shift, float(k)) for k in range(lo, hi)],
            "k bigint, v double").coalesce(1))
    else:
        handle.delete_where(and_(gt_eq("k", lo), lt("k", hi)))


def _model(sim: dict, op):
    kind, lo, hi, shift = op
    if kind == "append":
        for k in range(lo, hi):
            kk = k + shift
            sim[kk] = sim.get(kk, 0) + 1
    else:
        for k in list(sim):
            if lo <= k < hi:
                del sim[k]


def _ops(rng, lo, hi, shift_base):
    out = []
    for i in range(rng.randint(1, 3)):
        a = rng.randrange(lo, hi - 60)
        if rng.random() < 0.5:
            out.append(("append", a, a + rng.randint(10, 50),
                        shift_base + (i + 1) * 1_000_000))
        else:
            out.append(("delete", a, a + rng.randint(10, 50), 0))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_merge_fuzz_disjoint_series(catalog, spark, seed):
    rng = random.Random(seed)
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(BRANCH_LO, BRANCH_HI)]
        + [(k, float(k)) for k in range(MAIN_LO, MAIN_HI)],
        "k bigint, v double")
    t = catalog.create_table(f"db.mfz_{seed}", base)
    t.append(base.filter(F.col("k") < BRANCH_HI).coalesce(1))
    t.append(base.filter(F.col("k") >= MAIN_LO).coalesce(1))

    t.create_branch("dev")
    dev = t.branch("dev")
    branch_ops = _ops(rng, BRANCH_LO, BRANCH_HI, 0)
    main_ops = _ops(rng, MAIN_LO, MAIN_HI, 10_000_000)
    for op in branch_ops:
        _run(dev, op, spark)
    for op in main_ops:
        _run(t, op, spark)

    # serial-replay model: base state, then main's series, then the
    # branch's series — exactly the order merge re-applies commits
    sim = {k: 1 for k in range(BRANCH_LO, BRANCH_HI)}
    sim.update({k: 1 for k in range(MAIN_LO, MAIN_HI)})
    for op in main_ops:
        _model(sim, op)
    for op in branch_ops:
        _model(sim, op)

    t.merge_branch("dev")
    got = {}
    for r in t.to_df().select("k").collect():
        got[r["k"]] = got.get(r["k"], 0) + 1
    assert got == sim, (seed, sorted(set(got) ^ set(sim))[:10])


@pytest.mark.parametrize("seed", range(3))
def test_merge_fuzz_overlap_raises_atomically(catalog, spark, seed):
    rng = random.Random(1000 + seed)
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(0, 600)], "k bigint, v double")
    t = catalog.create_table(f"db.mfo_{seed}", base)
    t.append(base.coalesce(1))
    t.create_branch("clash")
    dev = t.branch("clash")
    a = rng.randrange(0, 300)
    dev.delete_where(and_(gt_eq("k", a), lt("k", a + 100)))
    b = rng.randrange(200, 500)
    t.delete_where(and_(gt_eq("k", b), lt("k", b + 100)))  # same file!

    head = t.metadata.current_snapshot_id
    n_before = t.to_df().count()
    with pytest.raises(ValidationException):
        t.merge_branch("clash")
    t.refresh()
    assert t.metadata.current_snapshot_id == head
    assert t.to_df().count() == n_before
