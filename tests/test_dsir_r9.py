"""r9: DSIR-style hashed-bigram importance selection
(operators/sampling.py dsir_select — Xie et al. 2023, deterministic
top-n flavor): target-like documents must outrank target-unlike ones,
scores are integers (SQL-replayable), and the plan stays bounded."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.sampling import dsir_select


@pytest.fixture()
def corpus(spark):
    # 40 docs about cooking (target-like), 160 about networking
    cook = [(i, "chop the onions then simmer the broth and season "
                "the stew with fresh herbs") for i in range(40)]
    net = [(100 + i, "configure the router then restart the switch and "
                     "monitor the packets with care") for i in range(160)]
    raw = spark.createDataFrame(cook + net, "doc_id bigint, text string")
    target = spark.createDataFrame(
        [(9000 + i, "simmer the broth season the stew chop fresh onions")
         for i in range(10)], "doc_id bigint, text string")
    return raw, target


def test_target_like_docs_rank_first(corpus):
    raw, target = corpus
    top = dsir_select(raw, target, "text", "doc_id", 40)
    ids = {r["doc_id"] for r in top.collect()}
    assert ids == set(range(40))  # exactly the cooking docs
    scores = {r["doc_id"]: r["dsir_score"] for r in top.collect()}
    assert all(isinstance(v, int) for v in scores.values())


def test_short_docs_score_zero_and_survive(spark):
    raw = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "alpha beta alpha beta")],
        "doc_id bigint, text string")
    # enough target mass that add-1 smoothing over the buckets doesn't
    # wash the signal out (ill-conditioned tiny corpora score ~flat)
    target = spark.createDataFrame([(9, "alpha beta " * 10)],
                                   "doc_id bigint, text string")
    out = {r["doc_id"]: r["dsir_score"]
           for r in dsir_select(raw, target, "text", "doc_id", 3,
                                buckets=64).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == 0 and out[2] == 0
    assert out[3] > 0  # 'alpha beta' dominates the target


def test_determinism_and_validation(corpus):
    raw, target = corpus
    a = [tuple(r) for r in
         dsir_select(raw, target, "text", "doc_id", 25).collect()]
    b = [tuple(r) for r in
         dsir_select(raw, target, "text", "doc_id", 25).collect()]
    assert a == b
    with pytest.raises(ValueError):
        dsir_select(raw, target, "text", "doc_id", 0)


def test_plan_is_bounded(corpus):
    raw, target = corpus
    out = dsir_select(raw, target, "text", "doc_id", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-n, never a global sort
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
