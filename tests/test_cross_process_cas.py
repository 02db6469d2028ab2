"""Cross-PROCESS commit CAS: the os.link create-if-absent primitive must
serialize writers in different OS processes, not just threads — the
actual multi-writer deployment shape.  Each child process runs its own
optimistic retry loop bumping a counter property; every bump must land
exactly once with a gap-free version chain."""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, random, sys, time
sys.path.insert(0, {repo!r})
from linkedin_iceberg_spark.catalog.metadata import (
    CommitFailedException, TableOperations, invalidate_metadata_cache)
import dataclasses

location, n_commits, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
ops = TableOperations(location)
done = 0
while done < n_commits:
    invalidate_metadata_cache(location)
    md = ops.refresh()
    version = getattr(md, "_version", 0)
    new = dataclasses.replace(md)
    new.properties = dict(md.properties)
    new.properties["counter"] = str(int(md.properties.get("counter", "0"))
                                    + 1)
    new.properties[f"last-writer"] = tag
    try:
        ops.commit(version, new)
        done += 1
    except CommitFailedException:
        time.sleep(random.random() * 0.02)
print(done)
"""


def test_cross_process_commit_cas(catalog, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(5)
    t = catalog.create_table("db.xproc", o)
    t.append(o)
    v0 = t.version
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = CHILD.format(repo=repo)
    writers, per = 3, 15
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, t.location, str(per), f"w{i}"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(writers)]
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-500:]
        assert out.decode().strip().endswith(str(per))

    t.refresh()
    total = writers * per
    assert int(t.metadata.properties["counter"]) == total  # no lost update
    assert t.version == v0 + total                         # gap-free chain
    assert t.to_df().count() == 5                          # data untouched
