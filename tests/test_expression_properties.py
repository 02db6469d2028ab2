"""Property-based invariants of the expression/projection plane
(hypothesis).  These are the soundness contracts the whole pruning design
rests on (ref: Projections.java inclusive/strict semantics,
InclusiveMetricsEvaluator.java, RewriteNot.java):

1. rewrite_not preserves evaluation on every row.
2. Inclusive projection NEVER prunes a partition containing a matching row.
3. Strict projection never accepts a partition containing a non-matching row.
4. The inclusive metrics evaluator never skips a file containing a match.

No Spark needed — pure driver-side evaluators.
"""

from hypothesis import given, settings, strategies as st

from linkedin_iceberg_spark.catalog.spec import PartitionSpec
from linkedin_iceberg_spark.expressions import (
    Evaluator,
    InclusiveMetricsEvaluator,
    and_,
    bind,
    eq,
    gt,
    gt_eq,
    in_,
    inclusive_projection,
    is_null,
    lt,
    lt_eq,
    not_eq,
    not_null,
    or_,
    strict_projection,
)
from linkedin_iceberg_spark.expressions.expressions import not_, rewrite_not
from linkedin_iceberg_spark.schema import NestedField, Schema

SCHEMA = Schema([NestedField(1, "a", "long"),
                 NestedField(2, "s", "string")])

SPEC = PartitionSpec.builder_for(SCHEMA).identity("a").truncate("s", 2) \
    .build()

ints = st.integers(min_value=-50, max_value=50)
strs = st.text(alphabet="abcd", min_size=0, max_size=4)


def _preds():
    int_pred = st.builds(
        lambda op, v: op("a", v),
        st.sampled_from([lt, lt_eq, gt, gt_eq, eq, not_eq]), ints)
    str_pred = st.builds(
        lambda op, v: op("s", v),
        st.sampled_from([lt, lt_eq, gt, gt_eq, eq, not_eq]), strs)
    in_pred = st.builds(lambda vs: in_("a", list(vs)),
                        st.lists(ints, min_size=1, max_size=3))
    null_pred = st.builds(lambda op, c: op(c),
                          st.sampled_from([is_null, not_null]),
                          st.sampled_from(["a", "s"]))
    return st.one_of(int_pred, str_pred, in_pred, null_pred)


exprs = st.recursive(
    _preds(),
    lambda kids: st.one_of(
        st.builds(and_, kids, kids),
        st.builds(or_, kids, kids),
        st.builds(not_, kids)),
    max_leaves=6)

rows = st.fixed_dictionaries({
    "a": st.one_of(st.none(), ints),
    "s": st.one_of(st.none(), strs),
})


def _partition_of(row: dict) -> dict:
    out = {}
    for pf in SPEC.fields:
        v = row[pf.source_name]
        out[pf.name] = pf.bound_transform().apply(v)
    return out


@settings(max_examples=300, deadline=None)
@given(exprs, rows)
def test_rewrite_not_preserves_eval(expr, row):
    bound = bind(SCHEMA, expr)
    assert Evaluator(rewrite_not(bound)).eval(row) == \
        Evaluator(bound).eval(row)


@settings(max_examples=300, deadline=None)
@given(exprs, rows)
def test_inclusive_projection_never_prunes_matches(expr, row):
    bound = bind(SCHEMA, expr)
    if not Evaluator(bound).eval(row):
        return  # row doesn't match; nothing to protect
    part = _partition_of(row)
    proj = inclusive_projection(SPEC, bound)
    assert Evaluator(proj).eval(part), \
        f"pruned a matching row: {expr!r} row={row} part={part} proj={proj!r}"


@settings(max_examples=300, deadline=None)
@given(exprs, rows)
def test_strict_projection_only_accepts_all_match(expr, row):
    bound = bind(SCHEMA, expr)
    part = _partition_of(row)
    proj = strict_projection(SPEC, bound)
    if Evaluator(proj).eval(part):
        assert Evaluator(bound).eval(row), \
            f"strict accepted a non-matching row: {expr!r} row={row}"


@settings(max_examples=300, deadline=None)
@given(exprs, st.lists(rows, min_size=1, max_size=5))
def test_metrics_evaluator_never_skips_matches(expr, file_rows):
    bound = bind(SCHEMA, expr)
    if not any(Evaluator(bound).eval(r) for r in file_rows):
        return
    # build file stats the way the write path would
    stats = {"record_count": len(file_rows), "value_counts": {},
             "null_value_counts": {}, "nan_value_counts": {},
             "lower_bounds": {}, "upper_bounds": {}}
    for fid, col in ((1, "a"), (2, "s")):
        vals = [r[col] for r in file_rows]
        non_null = [v for v in vals if v is not None]
        stats["value_counts"][fid] = len(vals)
        stats["null_value_counts"][fid] = len(vals) - len(non_null)
        if non_null:
            stats["lower_bounds"][fid] = min(non_null)
            stats["upper_bounds"][fid] = max(non_null)
    assert InclusiveMetricsEvaluator(bound).eval(stats), \
        f"metrics skipped a file with a match: {expr!r} rows={file_rows}"


BUCKET_SPEC = PartitionSpec.builder_for(SCHEMA).bucket("a", 4).build()


@settings(max_examples=300, deadline=None)
@given(exprs, rows)
def test_bucket_projection_never_prunes_matches(expr, row):
    """Inclusive projection through a bucket transform (eq/in project;
    ranges can't) must never prune a matching row's bucket."""
    bound = bind(SCHEMA, expr)
    if not Evaluator(bound).eval(row):
        return
    part = {pf.name: pf.bound_transform().apply(row[pf.source_name])
            for pf in BUCKET_SPEC.fields}
    proj = inclusive_projection(BUCKET_SPEC, bound)
    assert Evaluator(proj).eval(part), \
        f"bucket-pruned a matching row: {expr!r} row={row} part={part}"


@settings(max_examples=300, deadline=None)
@given(exprs, st.lists(rows, min_size=1, max_size=5))
def test_strict_metrics_only_accepts_all_match(expr, file_rows):
    """StrictMetricsEvaluator says 'every row matches' -> it must be true.
    This is the evaluator that authorizes metadata-only whole-file DELETEs;
    a false positive would silently drop surviving rows."""
    from linkedin_iceberg_spark.expressions import StrictMetricsEvaluator

    bound = bind(SCHEMA, expr)
    stats = {"record_count": len(file_rows), "value_counts": {},
             "null_value_counts": {}, "nan_value_counts": {},
             "lower_bounds": {}, "upper_bounds": {}}
    for fid, col in ((1, "a"), (2, "s")):
        vals = [r[col] for r in file_rows]
        non_null = [v for v in vals if v is not None]
        stats["value_counts"][fid] = len(vals)
        stats["null_value_counts"][fid] = len(vals) - len(non_null)
        if non_null:
            stats["lower_bounds"][fid] = min(non_null)
            stats["upper_bounds"][fid] = max(non_null)
    if StrictMetricsEvaluator(bound).eval(stats):
        for r in file_rows:
            assert Evaluator(bound).eval(r), \
                f"strict metrics claimed all-match falsely: {expr!r} row={r}"
