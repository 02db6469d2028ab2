"""Run every queries() entry and compare with its oracle_sql() via DuckDB —
a local mirror of the driver's correctness gate.

Usage: python tools/check_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from linkedin_iceberg_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle_con(sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            # unify resolution: assert_frame_equal mis-compares ns-vs-us
            # frames that contain NaT
            out[c] = (pd.to_datetime(out[c]).dt.tz_localize(None)
                      .astype("datetime64[us]"))
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def dtype_skew(actual: pd.DataFrame, expected: pd.DataFrame) -> list:
    """Pre-normalization dtype comparison — the driver's value-hash treats
    representation as significant even when schema_match passes (r2 verdict:
    Spark LONG floor() vs DuckDB DOUBLE floor() hash-mismatch on equal
    values).  Timestamp resolution (ns vs us) is unified first; everything
    else must match exactly.  Any hit = pin the dtype in BOTH the Spark
    query (.cast) and the oracle SQL (CAST ... AS)."""
    skews = []
    for c in sorted(set(actual.columns) & set(expected.columns)):
        a, e = actual[c].dtype, expected[c].dtype
        if pd.api.types.is_datetime64_any_dtype(a) and \
                pd.api.types.is_datetime64_any_dtype(e):
            continue
        if a != e:
            skews.append(f"{c}: spark={a} oracle={e}")
        elif a == object:
            av = next((x for x in actual[c] if x is not None), None)
            ev = next((x for x in expected[c] if x is not None), None)
            if av is not None and ev is not None and \
                    type(av).__name__ != type(ev).__name__:
                skews.append(f"{c}: spark cell={type(av).__name__} "
                             f"oracle cell={type(ev).__name__}")
    return skews


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = [a for a in sys.argv[2:] if not a.startswith("-")]
    spark = get_spark("check_queries")
    con = oracle_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = rows_only = 0
    t_all = time.time()
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            actual = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                rows_only += 1
                print(f"  ROWS-ONLY {name}: {len(actual)} rows "
                      f"({time.time()-t0:.1f}s)")
                continue
            expected = con.execute(oracles[name]).fetchdf()
            skews = dtype_skew(actual, expected)
            if skews:
                raise AssertionError(f"dtype skew: {'; '.join(skews)}")
            a, e = normalize(actual), normalize(expected)
            if list(a.columns) != list(e.columns):
                raise AssertionError(
                    f"columns: {list(a.columns)} vs {list(e.columns)}")
            if len(a) != len(e):
                raise AssertionError(f"rows: {len(a)} vs {len(e)}")
            # The driver compares a hash of exact values: default to exact
            # equality here so float-formatting drift fails locally too.
            # --lenient restores the old tolerance for triage.
            if "--lenient" in sys.argv:
                pd.testing.assert_frame_equal(a, e, check_dtype=False,
                                              check_exact=False, rtol=1e-4,
                                              atol=1e-6)
            else:
                pd.testing.assert_frame_equal(a, e, check_dtype=False,
                                              check_exact=True)
            passed += 1
            print(f"  PASS {name}: {len(a)} rows ({time.time()-t0:.1f}s)")
        except Exception as ex:
            failed += 1
            print(f"  FAIL {name}: {type(ex).__name__}: "
                  f"{str(ex)[:300]} ({time.time()-t0:.1f}s)")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only "
          f"({time.time()-t_all:.0f}s total)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
