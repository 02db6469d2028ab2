"""Sample-plane equivalence fuzz: on random tables (random types,
NULL rates, file counts, k, grouped/ungrouped) the store-served
quantiles must equal the live-recipe quantiles BYTE-FOR-BYTE — the KMV
merge property is an identity, not an approximation, so any mismatch
is a real bug (hash drift, pos drift, NULL-group loss, marker
miscoverage)."""

import random

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.analyze import (
    analyze_sample,
    sampled_quantiles_from_store,
)


def _mk_table(catalog, spark, seed):
    rng = random.Random(seed)
    vtype = rng.choice(["long", "string"])
    n = rng.randrange(30, 400)
    null_rate = rng.choice([0.0, 0.1, 0.5, 1.0])
    rows = []
    for i in range(n):
        if rng.random() < null_rate:
            v = None
        elif vtype == "long":
            v = rng.randrange(-50, 50)
        else:
            v = rng.choice(["aa", "b", "cc c", "", "Z"])
        grp = rng.choice(["g0", "g1", None])
        rows.append((i, v, grp))
    df = spark.createDataFrame(
        rows, f"id bigint, v {'bigint' if vtype == 'long' else 'string'}"
              f", s string")
    t = catalog.create_table(f"db.sfz_{seed}", df)
    n_files = rng.randrange(1, 5)
    for j in range(n_files):
        part = df.filter(F.col("id") % n_files == j)
        t.append(part.repartition(rng.randrange(1, 3)))
    return t.refresh(), rng


@pytest.mark.parametrize("seed", [111, 222, 333, 444])
def test_store_equals_live_with_random_pos_deletes(catalog, spark, seed):
    """r11: after random position deletes (stored and unstored rows
    alike) the serve — store-masked or guard-forced live — must still
    equal the live replay byte-for-byte."""
    import os
    import shutil

    t, rng = _mk_table(catalog, spark, seed)
    k = rng.choice([2, 16, 4096])
    grouped = rng.random() < 0.5
    gkw = {"group_col": "s"} if grouped else {}
    analyze_sample(t, "v", k=k, **gkw)
    # random (file, pos) deletes: positions may or may not exist/be
    # stored — both are legal delete-file contents
    files = [e.data_file.file_path
             for e in t._live_data_and_deletes()[0]]
    pairs = sorted({(rng.choice(files), rng.randrange(0, 120))
                    for _ in range(rng.randrange(1, 25))})
    pos = spark.createDataFrame(pairs, "file_path string, pos bigint")
    t.row_delta(position_deletes=pos)
    t = t.refresh()
    pcts = sorted(rng.sample(range(1, 101), 2))
    served = sampled_quantiles_from_store(t, "v", pcts=pcts, k=k,
                                          **gkw).collect()
    d = os.path.join(t.location, "stats_sample")
    shutil.move(d, d + ".hide")
    try:
        live = sampled_quantiles_from_store(t, "v", pcts=pcts, k=k,
                                            **gkw).collect()
    finally:
        shutil.move(d + ".hide", d)
    assert [tuple(r) for r in served] == [tuple(r) for r in live], \
        (seed, k, pcts, grouped, pairs)


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66])
def test_store_equals_live_randomized(catalog, spark, seed):
    t, rng = _mk_table(catalog, spark, seed)
    k = rng.choice([1, 7, 64, 4096])
    pcts = sorted(rng.sample(range(1, 101), rng.randrange(1, 4)))
    grouped = rng.random() < 0.5
    gkw = {"group_col": "s"} if grouped else {}
    live = sampled_quantiles_from_store(t, "v", pcts=pcts, k=k,
                                        **gkw).collect()
    analyze_sample(t, "v", k=k, **gkw)
    served = sampled_quantiles_from_store(t, "v", pcts=pcts, k=k,
                                          **gkw).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in live], \
        (seed, k, pcts, grouped)
    # idempotent coverage
    assert analyze_sample(t, "v", k=k, **gkw) == 0
