"""Round-5 ADVICE fixes, each with the failure scenario the advisor named.

1. partial_progress compaction re-plans entries/delete_entries at the top
   of EACH batch: a concurrent delete-file commit adopted into
   table.metadata by an earlier batch's commit must be APPLIED by later
   batches (stale plan-time delete lists silently resurrect deleted rows).
2. snapshot_table strips snapshot.clone-locations from the clone's
   properties: a clone of an already-cloned source must be droppable.
3. The clone's TableMetadata resets ref_types/ref_ages along with refs:
   no phantom branches that pass the type check but fail at read time,
   and create_tag on a name that was a branch on the SOURCE must work.
"""

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark import PartitionSpec, Schema
from linkedin_iceberg_spark.catalog.catalog import clone_registry
from linkedin_iceberg_spark.catalog.maintenance import rewrite_data_files


# -- 1: partial-progress compaction re-plans each batch --------------------

def test_partial_progress_applies_mid_run_delete(catalog, spark):
    # disjoint id ranges per partition so the injected delete's key
    # bounds provably miss the OTHER partition's files (conflict
    # validation prunes on equality-column bounds)
    df = spark.range(0, 100).withColumn("p", (F.col("id") >= 50).cast("int"))
    schema = Schema.from_spark(df.schema)
    spec = PartitionSpec.builder_for(schema).identity("p").build()
    t = catalog.create_table("db.adv5_pp", df, spec=spec)
    t.append(df)
    t.append(df)  # 2 small files per partition -> 2 rewrite groups

    path2p = {e.data_file.file_path: e.data_file.partition["p"]
              for e in t._live_data_and_deletes()[0]}

    # the advisor's scenario: an equality delete lands while batch 1's
    # commit is in flight, targeting ONLY the partition a LATER batch will
    # compact — batch 1's conflict check rightly passes (no overlap), the
    # delete is adopted into table.metadata, and a stale plan-time delete
    # list would let batch 2 rewrite its files at a higher sequence
    # number WITHOUT materializing it, resurrecting the deleted rows
    deleted = {}
    orig_rf = t.rewrite_files
    state = {"n": 0}

    def wrapped_rewrite_files(removed_paths, added_files):
        if state["n"] == 0:
            first_p = {path2p[p] for p in removed_paths}
            assert len(first_p) == 1
            other = 1 - first_p.pop()
            keys = list(range(50, 60) if other else range(0, 10))
            deleted["keys"] = set(keys)
            h2 = catalog.load_table("db.adv5_pp")
            h2.row_delta(
                equality_delete_keys=spark.createDataFrame(
                    [(k,) for k in keys], "id bigint"),
                key_cols=["id"])
        state["n"] += 1
        return orig_rf(removed_paths, added_files)

    t.rewrite_files = wrapped_rewrite_files
    out = rewrite_data_files(t, partial_progress=True,
                             max_groups_per_commit=1)
    assert out["commits"] == 2

    t.refresh()
    ids = [r["id"] for r in t.to_df().select("id").collect()]
    # each id was appended twice; the 10 deleted keys must be GONE —
    # if batch 2 compacted with the stale delete list, its output file
    # outranks the delete by sequence number and the rows resurrect
    assert deleted["keys"].isdisjoint(set(ids))
    assert len(ids) == 2 * 100 - 2 * 10


# -- 2: clone of an already-cloned source is droppable ---------------------

def test_second_clone_does_not_inherit_clone_registry(catalog, spark):
    df = spark.range(0, 50)
    t = catalog.create_table("db.adv5_src", df)
    t.append(df)
    c1 = catalog.snapshot_table(t, "db.adv5_c1")
    c2 = catalog.snapshot_table(t, "db.adv5_c2")

    # the clone is born clone-less: inheriting the source's registry
    # would make EVERY second-and-later clone undroppable
    assert clone_registry(c2.metadata.properties) == []
    assert catalog.drop_table("db.adv5_c2") is True

    # dropping c2 released only c2 from the source; c1 still fences it
    t.refresh()
    assert clone_registry(t.metadata.properties) == [c1.location]
    with pytest.raises(ValueError, match="zero-copy clones"):
        catalog.drop_table("db.adv5_src")


# -- 3: clone resets ref bookkeeping with refs -----------------------------

def test_clone_has_no_phantom_refs(catalog, spark):
    df = spark.range(0, 50)
    t = catalog.create_table("db.adv5_refsrc", df)
    t.append(df)
    t.create_branch("dev")
    t.create_tag("v1")

    clone = catalog.snapshot_table(t, "db.adv5_refclone")
    assert clone.metadata.refs == {}
    assert clone.metadata.ref_types == {}
    assert clone.metadata.ref_ages == {}

    # phantom ref_types would (a) let branch("dev") pass the type check
    # and explode at read time, (b) make create_tag("dev") raise
    # "is a branch" on a table with no branches at all
    with pytest.raises(ValueError, match="unknown branch"):
        clone.branch("dev")
    clone.create_tag("dev")  # must not raise
    assert "dev" in clone.metadata.refs
    assert clone.metadata.ref_types.get("dev") is None  # tag, not branch
    clone.create_branch("v1")  # a tag name on the source is free here
    assert clone.branch("v1").to_df().count() == 50
