"""Incrementally-maintained aggregate views over engine tables.

A materialized per-key aggregate (counts/sums) that refreshes from the
CHANGELOG instead of recomputing: each refresh reads only the row-level
inserts/deletes committed since the last sync (catalog/changelog.py),
folds them into signed deltas, and applies ONE MERGE snapshot to the view
(update touched groups, delete groups whose count reaches zero, insert
new groups).  Work per refresh is O(changed rows), never O(base table) —
the property that makes a derived table maintainable at 100 TB.

Only algebraic aggregates participate (count, sum — avg is sum/count at
read time): they admit signed folding (insert -> +x, delete -> -x).
Float sums would drift from a full recompute at the ulp level under
reordering; pass integer-typed columns (e.g. cents) when exact equality
with a recompute matters.

Sync state: the base location and the INITIAL base snapshot live in the
view's properties; each refresh that commits carries the new watermark
in its MERGE snapshot's summary — the SAME atomic commit as the data, so
a crash between "apply delta" and "advance watermark" cannot
double-apply.  A refresh whose changelog range holds no row changes
(e.g. compaction only) advances the watermark with a metadata-only
property update, which is equally safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.changelog import CHANGE_TYPE_COL
from linkedin_iceberg_spark.catalog.deletes import _maybe_broadcast

PROP_BASE = "view.base-location"
PROP_SNAPSHOT = "view.base-snapshot-id"
COUNT_COL = "n_rows"


def _last_sync(view) -> int:
    """Latest synced base snapshot: the newest view snapshot whose summary
    carries the watermark (written atomically with each refresh's merge),
    falling back to the creation-time property."""
    for s in reversed(view.metadata.snapshots):
        v = s.summary.get(PROP_SNAPSHOT)
        if v is not None:
            return int(v)
    return int(view.properties[PROP_SNAPSHOT])


def _changed_rows_bound(base, last: int, cur: int):
    """Upper bound on the changelog's row count between two synced
    snapshots, read from snapshot summaries (metadata only — the same
    source catalog/deletes.py gates its delete broadcasts on).  Every
    changelog row comes from a record added or removed by some commit in
    the range, so summing both per snapshot bounds touched-key
    cardinality from above.  None when any summary lacks counts
    (conservative: no broadcast hint)."""
    md = base.metadata
    total = 0
    for sid in md.ancestry(cur):
        if sid == last:
            return total
        s = md.snapshot_by_id(sid)
        a = s.summary.get("added-records")
        d = s.summary.get("deleted-records")
        if a is None and d is None:
            return None
        total += int(a or 0) + int(d or 0)
    # `last` not on cur's ancestry (rollback/branch swap): no safe bound
    return None


def _agg_exprs(aggs: dict, signed: bool) -> list:
    """aggs: out_name -> ("count" | "sum" | "min" | "max",
    col_name_or_Column).  Signed folding only applies to count/sum;
    min/max views refresh via the recompute-touched-groups path."""
    sign = (F.when(F.col(CHANGE_TYPE_COL) == "insert", F.lit(1))
            .otherwise(F.lit(-1))) if signed else F.lit(1)
    out = [F.sum(sign).cast("long").alias(COUNT_COL)]
    for name, (fn, col) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        if fn == "count":
            # SQL COUNT(col): only non-NULL values participate
            agg = F.sum(F.when(c.isNotNull(), sign).otherwise(F.lit(0))) \
                .cast("long")
        elif fn == "sum":
            agg = F.sum(sign * c)
        elif fn in ("min", "max") and not signed:
            agg = F.min(c) if fn == "min" else F.max(c)
        else:
            raise ValueError(
                f"{fn} does not fold under deletes; it refreshes via the "
                f"recompute-touched-groups path")
        out.append(agg.alias(name))
    return out


def _foldable(aggs: dict) -> bool:
    return all(fn in ("count", "sum") for fn, _c in aggs.values())


def create_agg_view(catalog, name: str, base, keys: list,
                    aggs: dict):
    """Materialize groupBy(keys).agg(aggs) of `base` as an engine table,
    stamped with the base snapshot it reflects."""
    df = base.to_df().groupBy(*keys).agg(*_agg_exprs(aggs, signed=False))
    view = catalog.create_table(name, df, properties={
        PROP_BASE: base.location,
        PROP_SNAPSHOT: str(base.metadata.current_snapshot_id)})
    view.append(df)
    return view


def refresh_agg_view(view, base, keys: list, aggs: dict):
    """Fold the base's changelog since the last sync into the view with
    one MERGE snapshot; advance the sync watermark in the same commit's
    metadata update.  No-op (and no new snapshot) when the base hasn't
    moved."""
    if view.properties.get(PROP_BASE) != base.location:
        raise ValueError("view was not created over this base table")
    last = _last_sync(view)
    cur = base.metadata.current_snapshot_id
    if cur == last:
        return view

    ch = base.changes(from_snapshot_id=last, to_snapshot_id=cur)
    if _foldable(aggs):
        delta = ch.groupBy(*keys).agg(*_agg_exprs(aggs, signed=True))
        # a fully-cancelling delta needs no filtering: a zero delta updates
        # an existing group by +0, insert_cond blocks zero-count new
        # groups, and matched_delete fires only when count reaches zero
        # coalesce the delta side: sum() over an all-NULL changed set is
        # NULL, and t.a + NULL would poison the stored aggregate
        upd = {COUNT_COL: F.col(f"t.{COUNT_COL}") + F.col(f"s.{COUNT_COL}")}
        for a in aggs:
            upd[a] = (F.coalesce(F.col(f"t.{a}"), F.lit(0))
                      + F.coalesce(F.col(f"s.{a}"), F.lit(0)))
        view.merge(
            delta, key_cols=keys,
            matched_delete_cond=(F.col(f"t.{COUNT_COL}")
                                 + F.col(f"s.{COUNT_COL}")) == 0,
            matched_update=upd,
            insert_cond=F.col(COUNT_COL) > 0,
            extra_summary={PROP_SNAPSHOT: str(cur)})
    else:
        # min/max don't fold under deletes (removing a group's minimum
        # needs the group's surviving rows): recompute ONLY the groups the
        # changelog touched — work is O(touched groups' rows), the
        # standard non-foldable-aggregate trade.  The touched-key set is
        # bounded by the changelog's row count, which the snapshot
        # summaries give for free: broadcast only when that metadata
        # bound is provably small (a wide overwrite over a
        # high-cardinality key can touch millions of groups — forcing a
        # broadcast there ships the whole key set to every executor);
        # past the gate the semi-join shuffles, same rows either way
        touched = ch.select(*keys).distinct()
        touched = _maybe_broadcast(
            touched, _changed_rows_bound(base, last, cur))
        fresh = (base.to_df()
                 .join(touched, keys, "left_semi")
                 .groupBy(*keys).agg(*_agg_exprs(aggs, signed=False)))
        src = touched.join(fresh, keys, "left")
        view.merge(
            src, key_cols=keys,
            matched_delete_cond=F.col(f"s.{COUNT_COL}").isNull(),
            matched_update={c: F.col(f"s.{c}")
                            for c in [COUNT_COL, *aggs]},
            insert_cond=F.col(COUNT_COL).isNotNull(),
            extra_summary={PROP_SNAPSHOT: str(cur)})
    view.refresh()
    if _last_sync(view) != cur:
        # the changelog range held no row changes (compaction-only or
        # fully-cancelling): no merge snapshot was committed, so advance
        # the watermark with a metadata-only property update (safe: the
        # skipped range is change-free by construction)
        view.update_properties(set_props={PROP_SNAPSHOT: str(cur)})
    return view.refresh()
