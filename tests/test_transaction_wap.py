"""Transactions (W10), WAP staged commits (W13), predicate string parser
(P13)."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.expressions import eq, gt_eq, lt, and_
from linkedin_iceberg_spark.expressions.parser import parse_expr


@pytest.fixture()
def orders_df(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_transaction_atomic(catalog, orders_df):
    t = catalog.create_table("db.txn", orders_df)
    t.append(orders_df)
    v_before = t.version

    txn = t.new_transaction()
    txn.append(orders_df.limit(100)) \
       .delete_where(parse_expr("o_orderkey < 50")) \
       .update_properties({"owner": "etl"})
    # nothing visible before commit
    assert catalog.load_table("db.txn").version == v_before
    txn.commit()

    t2 = catalog.load_table("db.txn")
    assert t2.version == v_before + 1  # ONE metadata swap
    assert t2.properties["owner"] == "etl"
    # chain: append 100 rows, then delete o_orderkey < 50 across everything
    expected = (orders_df.count() + 100
                - orders_df.filter(F.col("o_orderkey") < 50).count()
                - orders_df.limit(100)
                  .filter(F.col("o_orderkey") < 50).count())
    assert t2.to_df().count() == expected
    # double commit refused
    with pytest.raises(RuntimeError):
        txn.commit()


def test_transaction_conflict(catalog, orders_df):
    from linkedin_iceberg_spark.catalog.metadata import CommitFailedException
    t = catalog.create_table("db.txn2", orders_df)
    t.append(orders_df.limit(10))
    txn = t.new_transaction().append(orders_df.limit(5))
    # concurrent writer wins the CAS
    other = catalog.load_table("db.txn2")
    other.append(orders_df.limit(7))
    with pytest.raises(CommitFailedException):
        txn.commit()


def test_wap_stage_and_publish(catalog, orders_df):
    """Write-audit-publish: stage under wap.id, current snapshot unchanged,
    then cherry-pick to publish (ref: SnapshotManager.java:65-171,
    WapUtil.java:27-49)."""
    t = catalog.create_table("db.wap", orders_df)
    t.append(orders_df.limit(100))
    published = t.current_snapshot().snapshot_id

    t.append(orders_df.limit(200), wap_id="audit-1")
    assert t.current_snapshot().snapshot_id == published  # still staged
    staged_id = t.metadata.staged_wap["audit-1"]
    assert t.to_df().count() == 100

    # audit the staged snapshot via time-travel scan
    assert t.scan(snapshot_id=staged_id).count() == 300

    t.cherry_pick(staged_id)
    assert t.current_snapshot().snapshot_id == staged_id
    assert t.to_df().count() == 300

    # duplicate wap id must be rejected
    t.append(orders_df.limit(10), wap_id="audit-1")
    dup = t.metadata.staged_wap["audit-1"]
    with pytest.raises(ValueError):
        t.cherry_pick(dup)


def test_parse_expr_forms(catalog, orders_df):
    t = catalog.create_table("db.parse", orders_df)
    t.append(orders_df)
    cases = [
        ("o_orderkey < 100 and o_totalprice >= 1000.5",
         and_(lt("o_orderkey", 100), gt_eq("o_totalprice", 1000.5))),
        ("o_orderstatus = 'F'", eq("o_orderstatus", "F")),
    ]
    for s, expected in cases:
        assert t.scan(row_filter=parse_expr(s)).count() == \
            t.scan(row_filter=expected).count()

    # forms executed against the engine
    n1 = t.scan(row_filter=parse_expr(
        "o_orderstatus in ('F', 'O') and not (o_orderkey between 10 and 20)"
    )).count()
    n2 = orders_df.filter(
        F.col("o_orderstatus").isin("F", "O")
        & ~(F.col("o_orderkey").between(10, 20))).count()
    assert n1 == n2

    n3 = t.scan(row_filter=parse_expr(
        "o_orderpriority like '1%' or o_orderdate is null")).count()
    n4 = orders_df.filter(F.col("o_orderpriority").startswith("1")
                          | F.col("o_orderdate").isNull()).count()
    assert n3 == n4

    with pytest.raises(ValueError):
        parse_expr("o_orderkey <")
    with pytest.raises(ValueError):
        parse_expr("name like '%suffix'")


def test_concurrent_appends_all_land(catalog, spark, orders_df):
    """Optimistic CAS commit loop (ref: SnapshotProducer.commit:249-285 +
    Tasks retry): N writers with independent Table handles append disjoint
    batches concurrently; every batch must land exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    t0 = catalog.create_table("db.conc", orders_df)
    batches = [orders_df.filter(orders_df.o_orderkey % 4 == i).limit(20)
               .cache() for i in range(4)]
    counts = [b.count() for b in batches]

    def do_append(i):
        h = catalog.load_table("db.conc")
        h.append(batches[i])
        return i

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert sorted(pool.map(do_append, range(4))) == [0, 1, 2, 3]

    t0.refresh()
    assert t0.to_df().count() == sum(counts)
    # one snapshot per append, all on one linear history
    assert len(t0.snapshots()) == 4
    md = t0.metadata
    chain = md.ancestry()
    assert len(chain) == 4


def test_rollback_to_time(catalog, spark, sf_dir):
    import time

    from pyspark.sql import functions as F
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = catalog.create_table("db.rbt", o)
    t.append(o.filter(F.col("o_orderkey") <= 200))
    n1 = t.to_df().count()
    cut_ms = int(time.time() * 1000)
    time.sleep(0.05)
    t.append(o.filter(F.col("o_orderkey") > 200))
    assert t.to_df().count() > n1
    t.rollback_to_time(cut_ms)
    assert t.to_df().count() == n1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no snapshot"):
        t.rollback_to_time(1)
