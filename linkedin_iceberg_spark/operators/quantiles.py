"""Exact distributed order-statistics quantiles (per group or global).

The corpus-threshold primitive behind Gopher/CCNet-style filtering
("drop documents below the 10th percentile of quality score", "cap at
the 99th percentile of length"): thresholds must be EXACT and
reproducible when the filter decision feeds a training-data release
that a second engine audits — `percentile_approx` sketches drift run
to run with partitioning, so they cannot anchor a release manifest.

Two physical shapes, one semantic:

* grouped: one window sort PER GROUP (groups are the parallel unit —
  the standard per-source / per-language corpus shape).  A single
  colossal group serializes into one task; for that case call with
  ``group_col=None``.
* global: range-partition on (value, tiebreak) (the TeraSort shape —
  the range partitioner samples split points, each partition sorts
  locally), rank within partitions, then add per-partition offsets
  computed from a P-row count collect (metadata-sized).  No
  single-partition window, no driver data movement.

Rank convention (pinned so a second engine replays it): the q-quantile
is the value at rank ``max(1, ceil(q * n))`` under ascending
(value, tiebreak) order — the smallest value with cumulative fraction
>= q (SQL's discrete quantile).  Ties on value break by `id_col`, so
the chosen ROW is deterministic even though tied values are equal.

No reference analog (the 0.9-era fork has no relational operator
plane); published basis: order-statistic selection via total sort,
e.g. TeraSort (O'Malley '08) for the distribution shape.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _targets(counts: DataFrame, pcts: Sequence[int],
             gcols: list) -> DataFrame:
    pct_df = counts.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(set(int(p) for p in pcts))],
        "pct int")
    # target rank per (group, pct): max(1, ceil(p/100 * n)) in integer
    # arithmetic — (p*n + 99) DIV 100 equals ceil for positive ints
    return (counts.crossJoin(F.broadcast(pct_df))
            .select(*gcols, "pct", "_n",
                    F.greatest(F.lit(1),
                               F.expr("(pct * _n + 99) DIV 100"))
                    .cast("long").alias("_rk")))


def exact_quantiles(df: DataFrame, value_col: str,
                    pcts: Sequence[int] = (25, 50, 75, 90),
                    group_col: Optional[str] = None,
                    id_col: Optional[str] = None) -> DataFrame:
    """Exact discrete quantiles of `value_col`, per `group_col` group
    (or one global row set when None).  `pcts` are integer percents
    (50 = median).  Returns (group?, pct, n, quantile_value) ordered by
    (group, pct).  NULL values are excluded from ranks and counts (the
    SQL convention); empty groups produce no rows.

    `id_col` breaks ties deterministically; omit it only when
    `value_col` has no duplicates or when any tied row is acceptable
    (the VALUE returned is identical either way — ties are equal)."""
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError(f"pcts must be integer percents in [1,100], "
                         f"got {list(pcts)!r}")
    rows = df.filter(F.col(value_col).isNotNull())
    order = [F.col(value_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())

    if group_col:
        gcols = [group_col]
        w = W.partitionBy(group_col).orderBy(*order)
        ranked = rows.select(group_col, F.col(value_col),
                             F.row_number().over(w).cast("long")
                             .alias("_rk"))
        counts = rows.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("_n"))
        out = (ranked.join(F.broadcast(_targets(counts, pcts, gcols)),
                           gcols + ["_rk"])
               .select(group_col, "pct",
                       F.col("_n").cast("long").alias("n"),
                       F.col(value_col).alias("quantile_value")))
        return out.orderBy(group_col, "pct")

    # global: range-partitioned rank with per-partition offsets — the
    # scalable total-order shape (no partition-less window)
    spark = rows.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    part = (rows.select(F.col(value_col),
                        *( [F.col(id_col)] if id_col else [] ))
            .repartitionByRange(nparts, *order)
            .withColumn("_pid", F.spark_partition_id()))
    local = part.select(
        "_pid", F.col(value_col),
        F.row_number().over(
            W.partitionBy("_pid").orderBy(*order)).cast("long")
        .alias("_lrk"))
    # P rows — metadata-sized driver work, same class as plan_files
    sizes = {r["_pid"]: r["c"] for r in
             part.groupBy("_pid").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    offs, acc = {}, 0
    for pid in sorted(sizes):
        offs[pid] = acc
        acc += sizes[pid]
    off_df = F.broadcast(spark.createDataFrame(
        [(int(p), int(o)) for p, o in offs.items()],
        "_pid int, _off long"))
    ranked = (local.join(off_df, "_pid")
              .select(F.col(value_col),
                      (F.col("_lrk") + F.col("_off")).alias("_rk")))
    counts = spark.createDataFrame([(int(acc),)], "_n long")
    out = (ranked.join(F.broadcast(_targets(counts, pcts, [])), ["_rk"])
           .select("pct", F.col("_n").cast("long").alias("n"),
                   F.col(value_col).alias("quantile_value")))
    return out.orderBy("pct")


def sampled_quantiles(df: DataFrame, value_col: str,
                      pcts: Sequence[int] = (25, 50, 75, 90),
                      group_col: Optional[str] = None,
                      id_col: str = "doc_id", k: int = 4096,
                      salt: str = "v1") -> DataFrame:
    """Bounded-memory quantiles: exact order statistics over a
    DETERMINISTIC uniform sample — the scale path when the full sort of
    `exact_quantiles` is too heavy and percentile_approx's run-to-run
    drift is unacceptable.

    The sample is each group's bottom-``k`` rows by the house md5 hash
    order over (value, id) — uniform (the hash is independent of the
    value ordering), reproducible across engines/runs/partitionings,
    and MERGEABLE (bottom-k of a union = bottom-k of the parts'
    bottom-ks, the KMV property), so per-shard samples roll up without
    rescans.  Quantiles over the sample follow the same pinned rank
    arithmetic as exact_quantiles; sampling error is the standard
    order-statistic bound (~1/sqrt(k) on the rank fraction — k=4096
    gives ~1.6% rank error).  When a group has <= k rows the sample IS
    the group and the result is exact.

    Shape: one hash + per-group TOP-K (window over hash order — groups
    are the parallel unit), then the tiny rank join; nothing sorts the
    full corpus.  Returns (group?, pct, n_sampled, quantile_value)."""
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError(f"pcts must be integer percents in [1,100], "
                         f"got {list(pcts)!r}")
    if k <= 0:
        raise ValueError("k must be positive")
    rows = df.filter(F.col(value_col).isNotNull())
    gcols = [group_col] if group_col else []
    h = F.md5(F.concat(F.lit(salt), F.lit("-"),
                       F.col(value_col).cast("string"), F.lit("-"),
                       F.col(id_col).cast("string")))
    worder = [F.col("_h").asc(), F.col(id_col).asc()]
    if gcols:
        w = W.partitionBy(*gcols).orderBy(*worder)
        sample = (rows.select(*gcols, value_col, id_col, h.alias("_h"))
                  .withColumn("_sr", F.row_number().over(w))
                  .filter(F.col("_sr") <= k))
    else:
        # global: a single bottom-k window would shuffle the WHOLE
        # corpus to one task just to rank hashes — take per-Spark-
        # partition heads first (each task keeps <= k), then the final
        # bottom-k runs over <= k * n_partitions survivors
        part = (rows.select(value_col, id_col, h.alias("_h"))
                .withColumn("_pid", F.spark_partition_id()))
        wl = W.partitionBy("_pid").orderBy(*worder)
        local = (part.withColumn("_sr", F.row_number().over(wl))
                 .filter(F.col("_sr") <= k).drop("_sr", "_pid"))
        # <= k * n_partitions rows remain; the final bottom-k is tiny
        wg = W.partitionBy(F.lit(1)).orderBy(*worder)
        sample = (local.withColumn("_sr", F.row_number().over(wg))
                  .filter(F.col("_sr") <= k))
    ranked = sample.select(
        *gcols, F.col(value_col),
        F.row_number().over(
            (W.partitionBy(*gcols) if gcols else
             W.partitionBy(F.lit(1)))
            .orderBy(F.col(value_col).asc(), F.col(id_col).asc()))
        .cast("long").alias("_rk"))
    counts = sample.groupBy(*gcols).agg(F.count(F.lit(1)).alias("_n"))
    out = (ranked.join(F.broadcast(_targets(counts, pcts, gcols)),
                       gcols + ["_rk"])
           .select(*gcols, "pct",
                   F.col("_n").cast("long").alias("n_sampled"),
                   F.col(value_col).alias("quantile_value")))
    return out.orderBy(*gcols, "pct")
