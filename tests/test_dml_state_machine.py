"""Randomized DML state machine: a seeded sequence of table operations
checked after every step against a pandas model.

The single-operator tests prove each op alone; this catches cross-operator
interactions (delete after upsert after compact after expire...) — the
class of bug that survives unit suites.  Seeds are fixed: failures
reproduce exactly.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import gt_eq, lt


def _mk_rows(rng, n, start_id):
    return [(start_id + i, rng.randint(0, 9), round(rng.uniform(0, 100), 2))
            for i in range(n)]


SCHEMA = "id long, grp long, val double"
COLS = ["id", "grp", "val"]


def _check(t, model: pd.DataFrame, step: str):
    got = (t.to_df().toPandas()[COLS]
           .sort_values("id").reset_index(drop=True))
    exp = model[COLS].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  obj=f"after {step}")


@pytest.mark.parametrize("seed", [7, 23])
def test_random_dml_sequence(catalog, spark, seed):
    rng = random.Random(seed)
    rows = _mk_rows(rng, 50, 0)
    df0 = spark.createDataFrame(rows, SCHEMA)
    t = catalog.create_table(f"db.sm{seed}", df0)
    t.append(df0)
    model = pd.DataFrame(rows, columns=COLS)
    next_id = 50

    ops = ["append", "delete_lo", "delete_hi", "upsert", "compact",
           "expire", "append", "delete_lo", "upsert", "compact",
           "update_where", "merge", "update_where", "merge"]
    rng.shuffle(ops)
    for step, op in enumerate(ops):
        label = f"step{step}:{op}(seed{seed})"
        if op == "append":
            rows = _mk_rows(rng, rng.randint(5, 25), next_id)
            next_id += len(rows)
            t.append(spark.createDataFrame(rows, SCHEMA))
            model = pd.concat([model, pd.DataFrame(rows, columns=COLS)],
                              ignore_index=True)
        elif op == "delete_lo":
            cut = rng.randint(0, next_id)
            t.delete_where(lt("id", cut))
            model = model[~(model["id"] < cut)]
        elif op == "delete_hi":
            cut = rng.randint(0, next_id)
            t.delete_where(gt_eq("id", cut))
            model = model[~(model["id"] >= cut)]
        elif op == "upsert":
            # update half the surviving ids + insert some fresh ones
            ids = sorted(model["id"].tolist())
            upd = [i for i in ids if i % 2 == 0][:10]
            fresh = _mk_rows(rng, 3, next_id)
            next_id += 3
            urows = [(i, 99, 1.0) for i in upd] + fresh
            if not urows:
                continue
            t.upsert(spark.createDataFrame(urows, SCHEMA), ["id"])
            model = model[~model["id"].isin([r[0] for r in urows])]
            model = pd.concat(
                [model, pd.DataFrame(urows, columns=COLS)],
                ignore_index=True)
        elif op == "update_where":
            g = rng.randint(0, 9)
            t.update_where(gt_eq("grp", g), {"val": F.col("val") + 1000.0})
            mask = model["grp"] >= g
            model = model.copy()
            model.loc[mask, "val"] = model.loc[mask, "val"] + 1000.0
        elif op == "merge":
            # touch a random id band: delete ids % 3 == 0, bump val on
            # % 3 == 1, insert unseen ids from the band
            lo = rng.randint(0, max(next_id - 1, 1))
            hi = lo + rng.randint(5, 20)
            src = [(i, 5, 7.0) for i in range(lo, hi)]
            t.merge(spark.createDataFrame(src, SCHEMA), key_cols=["id"],
                    matched_delete_cond=F.col("s.id") % 3 == 0,
                    matched_update={"val": F.col("t.val") + 0.5},
                    matched_update_cond=F.col("s.id") % 3 == 1,
                    insert_cond=F.col("id") % 3 == 2)
            next_id = max(next_id, hi)
            existing = set(model["id"].tolist())
            model = model[~(model["id"].isin(
                {i for i in range(lo, hi) if i % 3 == 0}))]
            model = model.copy()
            upd = model["id"].isin(
                {i for i in range(lo, hi) if i % 3 == 1})
            model.loc[upd, "val"] = model.loc[upd, "val"] + 0.5
            ins = [(i, 5, 7.0) for i in range(lo, hi)
                   if i % 3 == 2 and i not in existing]
            if ins:
                model = pd.concat(
                    [model, pd.DataFrame(ins, columns=COLS)],
                    ignore_index=True)
        elif op == "compact":
            t.rewrite_data_files(min_input_files=2)
            t.refresh()
        elif op == "expire":
            t.expire_snapshots(retain_last=2)
            t.refresh()
        _check(t.refresh(), model, label)


@pytest.mark.parametrize("seed", [11])
def test_random_dml_across_spec_evolution(catalog, spark, seed):
    """r4: the same model-checked sequence, but with partition-spec
    evolution in the middle and dynamic partition overwrites AFTER it —
    the copy-on-write fallback must keep old-spec files honest."""
    rng = random.Random(seed)
    rows = _mk_rows(rng, 60, 0)
    df0 = spark.createDataFrame(rows, SCHEMA)
    t = catalog.create_table(f"db.sme{seed}", df0)     # spec 0: ({})
    t.append(df0)
    model = pd.DataFrame(rows, columns=COLS)
    next_id = 60

    t.update_spec(lambda b: b.identity("grp"))          # spec 1
    ops = ["append", "dyn_overwrite", "delete_lo", "dyn_overwrite",
           "compact", "merge", "dyn_overwrite", "expire"]
    for step, op in enumerate(ops):
        label = f"step{step}:{op}(seed{seed})"
        if op == "append":
            rows = _mk_rows(rng, rng.randint(10, 20), next_id)
            next_id += len(rows)
            t.append(spark.createDataFrame(rows, SCHEMA))
            model = pd.concat([model, pd.DataFrame(rows, columns=COLS)],
                              ignore_index=True)
        elif op == "dyn_overwrite":
            # replace 1-2 whole grp partitions with fresh rows
            grps = sorted(set(model["grp"].tolist()))
            if not grps:
                continue
            touched = rng.sample(grps, min(len(grps), rng.randint(1, 2)))
            fresh = [(next_id + i, rng.choice(touched), -1.0)
                     for i in range(8)]
            next_id += 8
            t.overwrite_partitions(spark.createDataFrame(fresh, SCHEMA))
            model = model[~model["grp"].isin(touched)]
            model = pd.concat([model, pd.DataFrame(fresh, columns=COLS)],
                              ignore_index=True)
        elif op == "delete_lo":
            cut = rng.randint(0, next_id)
            t.delete_where(lt("id", cut))
            model = model[~(model["id"] < cut)]
        elif op == "merge":
            lo = rng.randint(0, max(next_id - 1, 1))
            hi = lo + 12
            src = [(i, 5, 7.0) for i in range(lo, hi)]
            t.merge(spark.createDataFrame(src, SCHEMA), key_cols=["id"],
                    matched_update={"val": F.col("t.val") + 0.5})
            next_id = max(next_id, hi)
            model = model.copy()
            upd = model["id"].isin(set(range(lo, hi)))
            model.loc[upd, "val"] = model.loc[upd, "val"] + 0.5
            existing = set(model["id"].tolist())
            ins = [(i, 5, 7.0) for i in range(lo, hi) if i not in existing]
            if ins:
                model = pd.concat(
                    [model, pd.DataFrame(ins, columns=COLS)],
                    ignore_index=True)
        elif op == "compact":
            t.rewrite_data_files(min_input_files=2)
            t.refresh()
        elif op == "expire":
            t.expire_snapshots(retain_last=2)
            t.refresh()
        _check(t.refresh(), model, label)
