"""sample_temperature_mix / shuffle_shards / trigram_novelty semantics."""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.sampling import (
    sample_temperature_mix,
    shuffle_shards,
)
from linkedin_iceberg_spark.operators.text import trigram_novelty


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- mixing

def test_temperature_quotas_flatten_the_head(spark, docs):
    """sqrt-temperature: quota_g = floor(T * isqrt(n_g) / sum isqrt) —
    the dominant group's share shrinks vs its proportional share."""
    import math
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    w = {g: math.isqrt(n) for g, n in counts.items()}
    total = 300
    expect = {g: (total * wg) // sum(w.values()) for g, wg in w.items()}
    out = sample_temperature_mix(docs, "lang", "doc_id", total=total)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == expect
    # the head group ends BELOW its proportional share, the tail above
    n_all = sum(counts.values())
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)
    assert got[head] < total * counts[head] / n_all
    assert got[tail] > total * counts[tail] / n_all * 0.99


def test_temperature_mix_is_deterministic_and_salted(spark, docs):
    a = sorted(r["doc_id"] for r in
               sample_temperature_mix(docs, "lang", "doc_id", 100).collect())
    b = sorted(r["doc_id"] for r in
               sample_temperature_mix(docs, "lang", "doc_id", 100).collect())
    assert a == b
    c = sorted(r["doc_id"] for r in
               sample_temperature_mix(docs, "lang", "doc_id", 100,
                                      salt="other").collect())
    assert a != c and len(c) == len(a)


def test_temperature_mix_total_zero_and_validation(spark, docs):
    assert sample_temperature_mix(docs, "lang", "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        sample_temperature_mix(docs, "lang", "doc_id", -1)


# ---------------------------------------------------------------- shards

def test_shuffle_shards_positions_are_dense_per_shard(spark, docs):
    out = shuffle_shards(docs, "doc_id", n_shards=8).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))  # 500 docs cover all 8 shards
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shards_order_decorrelated_from_id(spark, docs):
    """Within a shard, hash order must not equal id order (the whole
    point vs a sorted write)."""
    out = shuffle_shards(docs, "doc_id", n_shards=4).collect()
    shard0 = sorted((r["pos"], r["doc_id"]) for r in out if r["shard"] == 0)
    ids_in_pos_order = [d for _, d in shard0]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_shuffle_shards_null_ids_dropped(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "id: long")
    out = shuffle_shards(df, "id", n_shards=2).collect()
    assert sorted(r["id"] for r in out) == [1, 2]
    with pytest.raises(ValueError):
        shuffle_shards(df, "id", n_shards=0)


# --------------------------------------------------------------- novelty

def test_trigram_novelty_hand_corpus(spark):
    """'aaaa' x2 shares trigram 'aaa' (4 occurrences, common at
    rare_max=2); 'xyzw' has unique trigrams (rare)."""
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa"), (3, "xyzw"), (4, "ab")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in trigram_novelty(df).collect()}
    assert 4 not in rows  # too short: no trigrams
    assert rows[1]["n_tri"] == 2 and rows[1]["n_rare"] == 0
    assert rows[1]["rare_ratio"] == 0.0
    assert rows[3]["n_tri"] == 2 and rows[3]["n_rare"] == 2
    assert rows[3]["rare_ratio"] == 1.0


def test_trigram_novelty_counts_occurrences_not_distinct(spark):
    # 'aaaaa' alone: trigram 'aaa' occurs 3 times -> common to itself
    df = spark.createDataFrame([(1, "aaaaa")], "doc_id: long, text: string")
    r = trigram_novelty(df, rare_max=2).collect()[0]
    assert r["n_tri"] == 3 and r["n_rare"] == 0
    r2 = trigram_novelty(df, rare_max=3).collect()[0]
    assert r2["n_rare"] == 3
    with pytest.raises(ValueError):
        trigram_novelty(df, rare_max=0)


# --------------------------------------------------------- edit distance

def test_edit_distance_dedup_order_sensitive(spark):
    """Same shingle SET, different order: Jaccard sees duplicates, the
    edit-distance verdict correctly separates near-identical text from
    heavy reordering."""
    from linkedin_iceberg_spark.operators.dedup import dedup_edit_distance
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    reordered = " ".join(reversed(base.split()))
    df = spark.createDataFrame(
        [(1, base), (2, base + "tail"), (3, reordered)],
        "doc_id: long, text: string")
    out = {(r["d1"], r["d2"]): r["edits"]
           for r in dedup_edit_distance(df, max_edits=10,
                                        shingle_n=1).collect()}
    assert (1, 2) in out and out[(1, 2)] == 4  # 'tail' appended
    assert (1, 3) not in out and (2, 3) not in out  # reordering != dup
