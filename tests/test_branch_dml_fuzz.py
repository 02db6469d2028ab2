"""Randomized DML on a BRANCH handle, model-checked like the main-lineage
state machine: every operator must behave identically on a branch, main
must stay frozen throughout, and the final fast-forward must publish
exactly the model state."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import gt_eq, lt

SCHEMA = "id long, grp long, val double"
COLS = ["id", "grp", "val"]


def _mk_rows(rng, n, start_id):
    return [(start_id + i, rng.randint(0, 9), round(rng.uniform(0, 100), 2))
            for i in range(n)]


def _frame(handle):
    return (handle.to_df().toPandas()[COLS]
            .sort_values("id").reset_index(drop=True))


@pytest.mark.parametrize("seed", [13])
def test_branch_dml_matches_model_and_main_frozen(catalog, spark, seed):
    rng = random.Random(seed)
    rows = _mk_rows(rng, 50, 0)
    df0 = spark.createDataFrame(rows, SCHEMA)
    t = catalog.create_table(f"db.brfz{seed}", df0)
    t.append(df0)
    main_model = pd.DataFrame(rows, columns=COLS)
    t.create_branch("work")
    b = t.branch("work")
    model = main_model.copy()
    next_id = 50

    ops = ["append", "delete_lo", "upsert", "compact", "update_where",
           "merge", "append", "delete_hi", "upsert"]
    rng.shuffle(ops)
    for step, op in enumerate(ops):
        if op == "append":
            rows = _mk_rows(rng, rng.randint(5, 20), next_id)
            next_id += len(rows)
            b.append(spark.createDataFrame(rows, SCHEMA))
            model = pd.concat([model, pd.DataFrame(rows, columns=COLS)],
                              ignore_index=True)
        elif op == "delete_lo":
            cut = rng.randint(0, next_id)
            b.delete_where(lt("id", cut))
            model = model[~(model["id"] < cut)]
        elif op == "delete_hi":
            cut = rng.randint(0, next_id)
            b.delete_where(gt_eq("id", cut))
            model = model[~(model["id"] >= cut)]
        elif op == "upsert":
            ids = sorted(model["id"].tolist())
            upd = [i for i in ids if i % 2 == 0][:8]
            fresh = _mk_rows(rng, 2, next_id)
            next_id += 2
            urows = [(i, 99, 1.0) for i in upd] + fresh
            b.upsert(spark.createDataFrame(urows, SCHEMA), ["id"])
            model = model[~model["id"].isin([r[0] for r in urows])]
            model = pd.concat([model, pd.DataFrame(urows, columns=COLS)],
                              ignore_index=True)
        elif op == "update_where":
            g = rng.randint(0, 9)
            b.update_where(gt_eq("grp", g),
                           {"val": F.col("val") + 1000.0})
            mask = model["grp"] >= g
            model = model.copy()
            model.loc[mask, "val"] = model.loc[mask, "val"] + 1000.0
        elif op == "merge":
            lo = rng.randint(0, max(next_id - 1, 1))
            hi = lo + rng.randint(5, 15)
            src = [(i, 5, 7.0) for i in range(lo, hi)]
            b.merge(spark.createDataFrame(src, SCHEMA), key_cols=["id"],
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
            b.rewrite_data_files(min_input_files=2)
            b.refresh()
        b.refresh()
        pd.testing.assert_frame_equal(
            _frame(b), model[COLS].sort_values("id")
            .reset_index(drop=True), check_dtype=False,
            obj=f"branch after step{step}:{op}")

    # main stayed frozen through the whole sequence
    t.refresh()
    pd.testing.assert_frame_equal(
        _frame(t), main_model[COLS].sort_values("id")
        .reset_index(drop=True), check_dtype=False, obj="main frozen")

    # publishing the branch gives exactly the model state
    t.fast_forward("work")
    pd.testing.assert_frame_equal(
        _frame(t), model[COLS].sort_values("id").reset_index(drop=True),
        check_dtype=False, obj="main after fast_forward")
