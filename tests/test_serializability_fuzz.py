"""Serializability fuzz: every raced pair of DML ops must either commit
with a state equal to the SERIAL rival-then-victim execution, or raise
ValidationException and leave exactly the rival's state.

The race is deterministic (the victim's ops.refresh hook lands the rival
first — the "committed between plan and CAS" interleaving); the oracle is
a literal serial replay on a fresh table.  This is the property the
reference's conflict validation exists to guarantee
(BaseOverwriteFiles.java:76-129, SnapshotProducer retry loop), checked
across op-type combinations instead of hand-picked scenarios.
"""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.catalog.metadata import ValidationException
from linkedin_iceberg_spark.expressions import and_, gt_eq, lt


def _df(spark, lo, hi, v=None):
    out = spark.range(lo, hi).withColumnRenamed("id", "k")
    return out.withColumn(
        "v", F.lit(v).cast("long") if v is not None else F.col("k") * 2)


def _pred(lo, hi):
    return and_(gt_eq("k", lo), lt("k", hi))


OPS = {
    "append": lambda t, spark, lo, hi: t.append(_df(spark, lo, hi)
                                                .orderBy("k")),
    "delete": lambda t, spark, lo, hi: t.delete_where(_pred(lo, hi)),
    "overwrite": lambda t, spark, lo, hi: t.overwrite_where(
        _df(spark, lo, hi, v=-1), _pred(lo, hi)),
    "upsert": lambda t, spark, lo, hi: t.upsert(
        _df(spark, lo, hi, v=-7), ["k"]),
}

OVERLAP = (100, 160)    # inside the base key range 0..400
DISJOINT = (700, 760)   # outside it


def _state(t):
    return sorted(map(tuple, t.to_df().select("k", "v").collect()))


def _fresh(catalog, spark, name):
    t0 = catalog.create_table(name, _df(spark, 0, 1))
    t0.append(_df(spark, 0, 400).orderBy("k"))
    return catalog.load_table(name)


@pytest.mark.parametrize("victim", sorted(OPS))
@pytest.mark.parametrize("rival,rival_range", [
    ("append", OVERLAP), ("append", DISJOINT),
    ("delete", OVERLAP), ("upsert", DISJOINT),
])
def test_raced_pair_is_serializable(catalog, spark, victim, rival,
                                    rival_range):
    name = f"db.ser_{victim}_{rival}_{rival_range[0]}"
    # serial oracle: rival first, then the victim re-planned on top
    ts = _fresh(catalog, spark, name + "_serial")
    OPS[rival](ts, spark, *rival_range)
    ts = catalog.load_table(name + "_serial")
    OPS[victim](ts, spark, *OVERLAP)
    want_serial = _state(catalog.load_table(name + "_serial"))

    tr = _fresh(catalog, spark, name)
    rival_handle = catalog.load_table(name)
    rival_done = []
    orig = tr.ops.refresh

    def racy():
        if not rival_done:
            rival_done.append(True)
            OPS[rival](rival_handle, spark, *rival_range)
        return orig()
    tr.ops.refresh = racy

    try:
        OPS[victim](tr, spark, *OVERLAP)
        raced = _state(catalog.load_table(name))
        assert raced == want_serial, \
            f"{victim} raced by {rival}{rival_range} merged " \
            "non-serializably"
    except ValidationException:
        # rejection must leave exactly the rival's committed state
        tw = _fresh(catalog, spark, name + "_rivalonly")
        OPS[rival](tw, spark, *rival_range)
        assert _state(catalog.load_table(name)) == \
            _state(catalog.load_table(name + "_rivalonly"))
