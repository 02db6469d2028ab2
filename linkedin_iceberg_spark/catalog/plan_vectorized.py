"""Vectorized manifest-entry filtering for large scan plans.

The default plan_files() path materializes every manifest entry as Python
objects and walks the predicate tree per entry — fine to ~10k entries, but
Python-per-entry at ~10^6 entries is minutes where a columnar pass is
seconds.  This module evaluates the partition predicate and the inclusive
metrics predicate over the manifest PARQUET COLUMNS first, and only
materializes surviving entries (SURVEY.md M3's declared design; the
behavior matched is the reference's per-entry filtering in
core/.../ManifestGroup.java:201-261 — same outcome, columnar execution).

Semantics parity: the masks computed here replicate
expressions/metrics.py::InclusiveMetricsEvaluator and the per-spec
partition Evaluator bit for bit — tests/test_plan_vectorized.py
cross-checks both paths on randomized manifests and asserts the planned
task list is byte-identical.

Cost model:
- partition predicate: memoized per DISTINCT (spec_id, partition-JSON)
  pair — manifest entries are partition-clustered, so distinct keys are
  orders of magnitude fewer than rows, and pruned rows never pay stats
  decoding at all.
- metrics predicate: one single-parse JSON decode per stats column over
  the partition-surviving subset, then one tight loop PER PREDICATE LEAF
  (not per row x tree walk), touching only the field ids the filter
  references.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from linkedin_iceberg_spark.catalog import manifests as M
from linkedin_iceberg_spark.expressions.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    Not,
    Operation,
    Or,
    Predicate,
    TransformTerm,
    rewrite_not,
)

# below this many live entries the per-entry loop in scan.py is used (object
# materialization is cheap and the memoization machinery here isn't worth it)
VECTORIZED_THRESHOLD = 10_000


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def partition_mask(data_tbl: "pa.Table", part_evals: dict,
                   default_eval, ptypes: dict) -> np.ndarray:
    """Boolean keep-mask from the per-spec partition evaluators, computed
    once per DISTINCT (spec_id, partition-JSON) key.

    Single-spec tables (the overwhelmingly common case) take a
    dictionary-encode fast path: the evaluator runs once per distinct
    partition string and the mask is a C-level take over the indices."""
    import pyarrow.compute as pc

    spec_col = data_tbl["spec_id"]
    sid_min = pc.min(spec_col).as_py()
    sid_max = pc.max(spec_col).as_py()
    if sid_min == sid_max:
        ev = part_evals.get(sid_min, default_eval)
        enc = pc.dictionary_encode(
            data_tbl["partition"].combine_chunks())
        dict_vals = enc.dictionary.to_pylist()
        dict_mask = np.fromiter(
            (bool(ev.eval(M._decode_partition(s, ptypes)))
             for s in dict_vals), dtype=bool, count=len(dict_vals))
        return dict_mask[enc.indices.to_numpy()]

    spec_ids = spec_col.to_pylist()
    pstrs = data_tbl["partition"].to_pylist()
    cache: dict = {}
    n = len(pstrs)
    out = np.empty(n, dtype=bool)
    for i in range(n):
        key = (spec_ids[i], pstrs[i])
        got = cache.get(key)
        if got is None:
            part = M._decode_partition(pstrs[i], ptypes)
            ev = part_evals.get(spec_ids[i], default_eval)
            got = bool(ev.eval(part))
            cache[key] = got
        out[i] = got
    return out


class _LazyCols:
    """dict-like view over a pyarrow table that materializes pylists on
    first access only — predicates rarely touch every stats column."""

    def __init__(self, tbl: "pa.Table"):
        self.tbl = tbl
        self._cols: dict = {}

    def __getitem__(self, name: str) -> list:
        got = self._cols.get(name)
        if got is None:
            got = self._cols[name] = self.tbl[name].to_pylist()
        return got


class _StatsColumns:
    """Lazy per-field-id stat vectors over a manifest sub-table.

    Each stats column is JSON-parsed ONCE for the whole subset into raw
    dicts (single C-level parse of a joined array — no per-row transform,
    no dict copies), then only the field ids the predicate actually
    references are extracted and (for bounds) value-decoded."""

    def __init__(self, d, types_by_id: dict):
        self._d = d
        self._types = types_by_id
        self._raw: dict = {}
        self._by_fid: dict = {}
        tbl = getattr(d, "tbl", None)
        if tbl is not None:
            self.n = tbl.num_rows
            self.record_count = tbl["record_count"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
        else:
            rcs = d["record_count"]
            self.n = len(rcs)
            self.record_count = np.asarray(
                [rc or 0 for rc in rcs], dtype=np.int64)

    def _parse(self, col: str) -> list:
        got = self._raw.get(col)
        if got is None:
            import json
            got = json.loads(
                "[" + ",".join(s if s else "null" for s in self._d[col])
                + "]")
            self._raw[col] = got
        return got

    def fid_values(self, col: str, fid: int) -> list:
        key = (col, fid)
        got = self._by_fid.get(key)
        if got is None:
            rows = self._parse(col)
            k = str(fid)
            if col in ("lower_bounds", "upper_bounds"):
                t = self._types.get(fid, "string")
                dec = M.decode_value
                # memoize decode per distinct encoded value — bounds repeat
                # across partition-clustered entries
                cache: dict = {}
                got = []
                for r in rows:
                    v = None if r is None else r.get(k)
                    if v is None:
                        got.append(None)
                        continue
                    dv = cache.get(v)
                    if dv is None:
                        dv = dec(v, t)
                        cache[v] = dv
                    got.append(dv)
            else:
                got = [None if r is None else r.get(k) for r in rows]
            self._by_fid[key] = got
        return got

    def counts(self, col: str, fid: int) -> np.ndarray:
        """Count vector as int64 with -1 standing for 'stat absent'.

        Count JSON strings repeat heavily (empty stats, files with equal
        row counts), so the column is dictionary-encoded and parsed once
        per DISTINCT string; the row vector is a C-level take."""
        key = ("np", col, fid)
        got = self._by_fid.get(key)
        if got is None:
            import json
            k = str(fid)
            tbl = getattr(self._d, "tbl", None)
            if tbl is not None:
                import pyarrow.compute as pc
                enc = self._raw.get(("enc", col))
                if enc is None:
                    enc = pc.dictionary_encode(tbl[col].combine_chunks())
                    self._raw[("enc", col)] = enc
                dvals = np.fromiter(
                    ((lambda r: -1 if r is None else r.get(k, -1))(
                        json.loads(s) if s else None)
                     for s in enc.dictionary.to_pylist()),
                    dtype=np.int64, count=len(enc.dictionary))
                got = dvals[enc.indices.to_numpy()]
            else:
                rows = self._parse(col)
                got = np.fromiter(
                    ((-1 if r is None else r.get(k, -1)) for r in rows),
                    dtype=np.int64, count=len(rows))
            self._by_fid[key] = got
        return got

    def numeric_bounds(self, col: str, fid: int, kind: str):
        """(values, valid) for a numeric bound column — raw JSON values are
        already numeric (serde encode_value), so no per-value decode is
        needed.  kind="int" (int/long/time) uses an exact int64 vector —
        float64 would round >2^53 bounds (hash columns!) and silently
        diverge from the row evaluator.  kind="float" uses float64; NaN
        bounds are marked invalid, matching the row evaluator's _is_nan
        skip, while +-inf stay valid and comparable."""
        key = ("num", col, fid, kind)
        got = self._by_fid.get(key)
        if got is None:
            rows = self._parse(col)
            k = str(fid)
            n = len(rows)
            valid = np.zeros(n, dtype=bool)
            if kind == "int":
                vals = np.zeros(n, dtype=np.int64)
                for i, r in enumerate(rows):
                    v = None if r is None else r.get(k)
                    if v is not None:
                        vals[i] = v
                        valid[i] = True
            else:
                vals = np.full(n, np.nan, dtype=np.float64)
                for i, r in enumerate(rows):
                    v = None if r is None else r.get(k)
                    if v is None:
                        continue
                    if isinstance(v, str):  # "NaN"/"Infinity"/"-Infinity"
                        if v == "NaN":
                            continue  # invalid, like _is_nan
                        vals[i] = np.inf if v == "Infinity" else -np.inf
                    else:
                        vals[i] = v
                    valid[i] = True
            self._by_fid[key] = got = (vals, valid)
        return got


def metrics_mask(stats: _StatsColumns, bound_expr) -> np.ndarray:
    """Vectorized InclusiveMetricsEvaluator: True = file MIGHT match.

    Mirrors expressions/metrics.py::InclusiveMetricsEvaluator exactly,
    including the record_count==0 gate, the all-null short-circuit for
    value predicates, NaN-bound skips, and the IN 200-literal limit."""
    expr = rewrite_not(bound_expr)
    n = stats.n
    mask = _eval_node(expr, stats, n)
    return mask & (stats.record_count > 0)


def _flatten_and(e) -> list:
    if isinstance(e, And):
        return _flatten_and(e.left) + _flatten_and(e.right)
    return [e]


def _is_fully_vectorized(e) -> bool:
    """True when evaluating `e` never enters a per-row Python loop — used
    to order AND conjuncts so C-speed conjuncts shrink the row set before
    the loop-backed ones (string bounds, STARTS_WITH) run."""
    if isinstance(e, (AlwaysTrue, AlwaysFalse, Not)):
        return True
    if isinstance(e, (And, Or)):
        return _is_fully_vectorized(e.left) and _is_fully_vectorized(e.right)
    if isinstance(e, Predicate):
        if isinstance(e.term, TransformTerm):
            return True
        if e.op in (Operation.IS_NULL, Operation.NOT_NULL,
                    Operation.IS_NAN, Operation.NOT_NAN):
            return True
        # _types lookup happens at eval time; mirror the kind dispatch
        return e.op != Operation.STARTS_WITH
    return True


def _leaf_types(e, types_by_id: dict) -> bool:
    """Whether every value-comparison leaf in `e` is numeric-typed (and so
    takes the numpy path in _eval_leaf)."""
    if isinstance(e, (And, Or)):
        return _leaf_types(e.left, types_by_id) and \
            _leaf_types(e.right, types_by_id)
    if isinstance(e, Predicate) and not isinstance(e.term, TransformTerm) \
            and e.op not in (Operation.IS_NULL, Operation.NOT_NULL,
                             Operation.IS_NAN, Operation.NOT_NAN):
        t = types_by_id.get(e.term.field_id, "string")
        return t in _INT_KINDS or t in _FLOAT_KINDS
    return True


def _eval_node(e, stats: _StatsColumns, n: int) -> np.ndarray:
    if isinstance(e, AlwaysTrue):
        return np.ones(n, dtype=bool)
    if isinstance(e, AlwaysFalse):
        return np.zeros(n, dtype=bool)
    if isinstance(e, And):
        return _eval_node(e.left, stats, n) & _eval_node(e.right, stats, n)
    if isinstance(e, Or):
        return _eval_node(e.left, stats, n) | _eval_node(e.right, stats, n)
    if isinstance(e, Not):
        return np.ones(n, dtype=bool)  # conservative, as the row evaluator
    assert isinstance(e, Predicate)
    if isinstance(e.term, TransformTerm):
        return np.ones(n, dtype=bool)  # stats are in source space only
    return _eval_leaf(e, stats, n)


_INT_KINDS = ("int", "long", "time")
_FLOAT_KINDS = ("float", "double")


def _all_null(stats: _StatsColumns, fid: int) -> np.ndarray:
    vc = stats.counts("value_counts", fid)
    nc = stats.counts("null_value_counts", fid)
    return (vc != -1) & (nc != -1) & (vc == nc)


def _eval_leaf(p: Predicate, stats: _StatsColumns, n: int) -> np.ndarray:
    fid = p.term.field_id
    op = p.op

    if op == Operation.IS_NULL:
        nc = stats.counts("null_value_counts", fid)
        return (nc == -1) | (nc > 0)
    if op == Operation.NOT_NULL:
        return ~_all_null(stats, fid)
    if op == Operation.IS_NAN:
        # row evaluator: CANNOT_MATCH only when nan_count == 0
        return stats.counts("nan_value_counts", fid) != 0
    if op == Operation.NOT_NAN:
        nanc = stats.counts("nan_value_counts", fid)
        vc = stats.counts("value_counts", fid)
        return ~((nanc != -1) & (vc != -1) & (nanc == vc))

    # value comparisons: an all-null column can't match
    not_all_null = ~_all_null(stats, fid)
    t = stats._types.get(fid, "string")
    kind = "int" if t in _INT_KINDS else \
        "float" if t in _FLOAT_KINDS else None

    if kind is not None and op in (
            Operation.LT, Operation.LT_EQ, Operation.GT, Operation.GT_EQ,
            Operation.EQ, Operation.NOT_EQ, Operation.IN, Operation.NOT_IN):
        lo, lo_ok = stats.numeric_bounds("lower_bounds", fid, kind)
        hi, hi_ok = stats.numeric_bounds("upper_bounds", fid, kind)
        if op == Operation.LT:
            cannot = lo_ok & (lo >= p.literal)
        elif op == Operation.LT_EQ:
            cannot = lo_ok & (lo > p.literal)
        elif op == Operation.GT:
            cannot = hi_ok & (hi <= p.literal)
        elif op == Operation.GT_EQ:
            cannot = hi_ok & (hi < p.literal)
        elif op == Operation.EQ:
            cannot = (lo_ok & (lo > p.literal)) | (hi_ok & (hi < p.literal))
        elif op in (Operation.NOT_EQ, Operation.NOT_IN):
            return not_all_null.copy()
        else:  # IN
            lits = p.literals
            if len(lits) > 200:  # ref: IN_PREDICATE_LIMIT
                return not_all_null.copy()
            might = np.zeros(n, dtype=bool)
            for x in lits:
                might |= (~lo_ok | (lo <= x)) & (~hi_ok | (hi >= x))
            return not_all_null & might
        return not_all_null & ~cannot

    # non-numeric (string/date/decimal/...) or STARTS_WITH: per-row loop
    # over decoded natives — exact same logic as the row evaluator
    lows = stats.fid_values("lower_bounds", fid)
    highs = stats.fid_values("upper_bounds", fid)
    v = p.literal if op not in (Operation.IN, Operation.NOT_IN) else None
    out = np.empty(n, dtype=bool)

    for i in range(n):
        if not not_all_null[i]:
            out[i] = False
            continue
        lo, hi = lows[i], highs[i]
        lo_ok = lo is not None and not _is_nan(lo)
        hi_ok = hi is not None and not _is_nan(hi)
        if op == Operation.LT:
            out[i] = not (lo_ok and lo >= v)
        elif op == Operation.LT_EQ:
            out[i] = not (lo_ok and lo > v)
        elif op == Operation.GT:
            out[i] = not (hi_ok and hi <= v)
        elif op == Operation.GT_EQ:
            out[i] = not (hi_ok and hi < v)
        elif op == Operation.EQ:
            out[i] = not ((lo_ok and lo > v) or (hi_ok and hi < v))
        elif op == Operation.NOT_EQ:
            out[i] = True
        elif op == Operation.IN:
            lits = p.literals
            if len(lits) > 200:
                out[i] = True
            else:
                ls = lits
                if lo_ok:
                    ls = [x for x in ls if x >= lo]
                if hi_ok:
                    ls = [x for x in ls if x <= hi]
                out[i] = bool(ls)
        elif op == Operation.NOT_IN:
            out[i] = True
        elif op == Operation.STARTS_WITH:
            pre = p.literal
            keep = True
            if lo is not None and isinstance(lo, str) and \
                    lo[: len(pre)] > pre:
                keep = False
            if keep and hi is not None and isinstance(hi, str) and \
                    hi[: len(pre)] < pre:
                keep = False
            out[i] = keep
        else:
            out[i] = True
    return out


def filter_entries(tables: list, bound_expr, part_evals: dict,
                   default_eval, types_by_id: dict,
                   ptypes: dict) -> tuple:
    """Columnar equivalent of scan.py's per-entry loop: returns
    (data_entries, delete_entries) with data entries filtered by the
    partition + metrics predicates, in the same order the loop produces.

    `tables` are raw manifest pyarrow Tables in manifest order."""
    big = pa.concat_tables(tables) if len(tables) != 1 else tables[0]

    status = big["status"].to_numpy()
    content = np.asarray(big["content"].to_numpy())
    live = status != M.STATUS_DELETED

    # delete files: no predicate filtering (they are matched per data file
    # later); materialize the (small) live delete subset directly
    delete_tbl = big.filter(pa.array(live & (content != M.CONTENT_DATA)))
    delete_entries = M.entries_from_table(delete_tbl, types_by_id, ptypes)

    data_tbl = big.filter(pa.array(live & (content == M.CONTENT_DATA)))
    if data_tbl.num_rows == 0:
        return [], delete_entries

    # level 2a: partition predicate, memoized per distinct key — pruned
    # rows never pay stats decoding
    pmask = partition_mask(data_tbl, part_evals, default_eval, ptypes)
    data_tbl = data_tbl.filter(pa.array(pmask))
    if data_tbl.num_rows == 0:
        return [], delete_entries

    # level 2b: inclusive metrics over the survivors (columns pulled
    # lazily — only what the predicate references is materialized).
    # AND conjuncts are phased: fully-C-speed conjuncts (numeric bounds,
    # count checks) run first over everything; loop-backed conjuncts
    # (string bounds, STARTS_WITH) run only on what survives.
    expr = rewrite_not(bound_expr)
    conjs = _flatten_and(expr)
    fast = [c for c in conjs if _is_fully_vectorized(c)
            and _leaf_types(c, types_by_id)]
    fast_ids = {id(c) for c in fast}
    slow = [c for c in conjs if id(c) not in fast_ids]

    stats = _StatsColumns(_LazyCols(data_tbl), types_by_id)
    mmask = stats.record_count > 0
    for c in fast:
        mmask &= _eval_node(c, stats, stats.n)
    if slow and mmask.any():
        sub_tbl = data_tbl.filter(pa.array(mmask))
        sub_stats = _StatsColumns(_LazyCols(sub_tbl), types_by_id)
        smask = np.ones(sub_stats.n, dtype=bool)
        for c in slow:
            smask &= _eval_node(c, sub_stats, sub_stats.n)
        idx = np.flatnonzero(mmask)
        mmask = np.zeros(stats.n, dtype=bool)
        mmask[idx[smask]] = True
    data_tbl = data_tbl.filter(pa.array(mmask))

    data_entries = M.entries_from_table(data_tbl, types_by_id, ptypes)
    return data_entries, delete_entries
