"""Model-based randomized checks: funnel, sample_temperature_mix and
shuffle_shards vs pure-Python reference models over seeded random inputs
(the model is the slow-but-obviously-right implementation)."""

import datetime
import hashlib
import math
import random

from pyspark.sql import Row

from linkedin_iceberg_spark.operators.events import funnel
from linkedin_iceberg_spark.operators.sampling import (
    sample_temperature_mix,
    shuffle_shards,
)


# ------------------------------------------------------------------ funnel

def _model_funnel(rows, steps, within=None):
    """rows: (user, ts, type).  Greedy-earliest anchoring."""
    out = {}
    by_user = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    for u, evs in by_user.items():
        t = [None] * len(steps)
        firsts = [ts for ts, ty in evs if ty == steps[0]]
        if not firsts:
            continue
        t[0] = min(firsts)
        for i in range(1, len(steps)):
            prev = t[i - 1]
            if prev is None:
                break
            cands = [ts for ts, ty in evs if ty == steps[i] and ts > prev
                     and (within is None
                          or ts <= prev + datetime.timedelta(seconds=within))]
            t[i] = min(cands) if cands else None
        out[u] = tuple(t)
    return out


def test_funnel_matches_model(spark):
    rng = random.Random(11)
    types = ["a", "b", "c", "x"]
    rows = []
    for _ in range(800):
        u = rng.randint(0, 40)
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=rng.randint(0, 7200))
        rows.append((u, ts, rng.choice(types)))
    # dedupe (user, ts) collisions: equal timestamps with different types
    # are resolved by min() identically in model and engine, keep as-is
    df = spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_type=ty) for u, ts, ty in rows])
    for within in (None, 600):
        want = _model_funnel(rows, ["a", "b", "c"], within)
        got = {r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
               for r in funnel(df, ["a", "b", "c"],
                               within_seconds=within).collect()}
        assert got == want, (within, set(got) ^ set(want))


# ------------------------------------------------- temperature mix + shards

def _bucket(salt, key, buckets):
    h = hashlib.md5(f"{salt}-{key}".encode()).hexdigest()[:15]
    return int(h, 16) % buckets


def _model_temperature(rows, total, salt="v1"):
    """rows: (id, group).  Returns kept id set."""
    groups = {}
    for i, g in rows:
        groups.setdefault(g, []).append(i)
    w = {g: math.isqrt(len(ids)) for g, ids in groups.items()}
    tw = sum(w.values())
    kept = set()
    for g, ids in groups.items():
        quota = (total * w[g]) // tw
        order = sorted(ids, key=lambda i: (_bucket(salt, i, 1_000_000), i))
        kept.update(order[:quota])
    return kept


def test_temperature_mix_matches_model(spark):
    rng = random.Random(5)
    rows = [(i, f"g{rng.randint(0, 6)}") for i in range(700)]
    df = spark.createDataFrame([Row(id=i, grp=g) for i, g in rows])
    for total in (0, 50, 400, 700):
        want = _model_temperature(rows, total)
        got = {r["id"] for r in
               sample_temperature_mix(df, "grp", "id", total).collect()}
        assert got == want, total


def test_shuffle_shards_matches_model(spark):
    rng = random.Random(3)
    ids = rng.sample(range(100_000), 500)
    df = spark.createDataFrame([Row(id=i) for i in ids])
    got = {r["id"]: (r["shard"], r["pos"])
           for r in shuffle_shards(df, "id", 8, salt="s9").collect()}
    by_shard = {}
    for i in ids:
        by_shard.setdefault(_bucket("s9", i, 8), []).append(i)
    want = {}
    for sh, members in by_shard.items():
        order = sorted(members,
                       key=lambda i: (_bucket("s9-ord", i, 1_000_000), i))
        for pos, i in enumerate(order, start=1):
            want[i] = (sh, pos)
    assert got == want
