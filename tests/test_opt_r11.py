"""r11 optimization-round focused tests: the row-local minhash signature
fold, the ld() base-relation memo, and the current-schema alignment skip
must be invisible — bit-identical values, same schemas — vs the
pre-optimization recipes."""

import os

import pytest
from pyspark.sql import Row, functions as F

from linkedin_iceberg_spark import queries as Q
from linkedin_iceberg_spark.operators.dedup import (
    _ensure_parallelism, minhash_band_signatures)

TRICKY = [
    Row(doc_id=1, text="a b c d e f g h"),
    Row(doc_id=2, text="a b c d e f g h"),          # exact dup
    Row(doc_id=3, text="x"),                        # shorter than shingle
    Row(doc_id=4, text=""),                         # empty -> excluded
    Row(doc_id=5, text="a a a a a a"),              # all-dup shingles
    Row(doc_id=6, text="ü ö ä ß ü ö ä ß"),          # non-ascii
    Row(doc_id=7, text="b c d e f g h a"),          # rotation of 1
]


def _reference_band_signatures(df, text_col, id_col, num_hashes, bands,
                               shingle_n, hash_mode):
    """The pre-r11 explode+groupBy recipe, kept verbatim as the oracle for
    the row-local fold (min over a doc's exploded shingle hashes)."""
    rows_per_band = num_hashes // bands
    toked = _ensure_parallelism(df).select(
        id_col, F.split(F.col(text_col), r"\s+").alias("_toks"))
    if hash_mode == "md5":
        sh_arr = F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {shingle_n}, 0)),"
            f" i -> concat_ws(' ', slice(_toks, i + 1, {shingle_n})))")
        token_hash = F.conv(F.substring(F.md5(F.col("_sh")), 1, 15),
                            16, 10).cast("long")
        sh = (toked.select(id_col,
                           F.explode(F.array_distinct(sh_arr)).alias("_sh"))
              .filter(F.length("_sh") > 0)
              .select(id_col, token_hash.alias("_h")))
        seeded = [F.conv(F.substring(
            F.md5(F.concat_ws("-", F.col("_h").cast("string"),
                              F.lit(str(k)))), 1, 15), 16, 10)
            .cast("long") for k in range(num_hashes)]
        minhash_cols = [F.min(seeded[k]).alias(f"mh{k}")
                        for k in range(num_hashes)]
    else:
        els = ", ".join(f"try_element_at(_toks, i + {j + 1})"
                        for j in range(shingle_n))
        sh_arr = F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {shingle_n}, 0)),"
            f" i -> xxhash64({els}))")
        sh = (toked
              .filter("size(_toks) > 0 and "
                      "not (size(_toks) = 1 and _toks[0] = '')")
              .select(id_col,
                      F.explode(F.array_distinct(sh_arr)).alias("_h")))
        minhash_cols = [
            F.min(F.xxhash64(F.col("_h"), F.lit(k))).alias(f"mh{k}")
            for k in range(num_hashes)]
    sigs = sh.groupBy(id_col).agg(*minhash_cols)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        if hash_mode == "md5":
            sig = F.conv(F.substring(
                F.md5(F.concat_ws("-", *[c.cast("string") for c in cols])),
                1, 15), 16, 10).cast("long")
        else:
            sig = F.xxhash64(*cols)
        band_rows.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    return (sigs.select(id_col, F.explode(F.array(*band_rows)).alias("b"))
            .select(id_col, F.col("b.band").alias("band"),
                    F.col("b.sig").alias("sig")))


@pytest.mark.parametrize("hash_mode", ["xxhash64", "md5"])
def test_rowlocal_minhash_matches_explode_groupby(spark, hash_mode):
    df = spark.createDataFrame(TRICKY)
    got = set(map(tuple, minhash_band_signatures(
        df, "text", "doc_id", num_hashes=16, bands=4, shingle_n=3,
        hash_mode=hash_mode).collect()))
    ref = set(map(tuple, _reference_band_signatures(
        df, "text", "doc_id", 16, 4, 3, hash_mode).collect()))
    assert got == ref
    # empty doc excluded in both shapes; exact dup docs share all sigs
    ids = {r[0] for r in got}
    assert 4 not in ids and {1, 2, 3, 5, 6, 7} <= ids
    sig_of = {}
    for i, b, s in got:
        sig_of.setdefault(i, set()).add((b, s))
    assert sig_of[1] == sig_of[2]


def test_ld_memo_same_results_and_schema(spark):
    sf = "/root/testdata/sf0.001"
    for name in ["orders", "events"]:
        first = Q.ld(spark, sf, name)
        second = Q.ld(spark, sf, name)
        assert first.schema == second.schema
        assert first.orderBy(first.columns[0]).limit(50).collect() == \
            second.orderBy(second.columns[0]).limit(50).collect()
    # events nanos special case survives the memo: ts is a usable timestamp
    ev = Q.ld(spark, sf, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")


def test_current_schema_scan_skips_alignment_but_matches(spark, tmp_path):
    from linkedin_iceberg_spark import Catalog, Schema

    src = spark.range(0, 100).selectExpr(
        "id AS k", "cast(id * 2 AS double) AS v", "concat('s', id) AS s")
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("db.t", src)
    t.append(src)
    out = t.to_df()
    # column order and values match the current schema exactly
    assert out.columns == ["k", "v", "s"]
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, src.collect()))
    # evolved table still aligns old files by field id
    t.update_schema().rename_column("v", "val").commit()
    out2 = t.to_df()
    assert out2.columns == ["k", "val", "s"]
    assert sorted(r["val"] for r in out2.collect()) == \
        sorted(r["v"] for r in src.collect())
