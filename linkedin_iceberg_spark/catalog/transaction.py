"""Transactions: multiple table operations, one atomic metadata swap (W10).

ref: api/.../Transaction.java, core/.../BaseTransaction.java — operations
apply against a staged TableMetadata; data/manifest files are written
eagerly (harmless orphans if abandoned, swept by remove_orphan_files), but
the metadata JSON advances exactly once, via the same CAS as single commits.
"""

from __future__ import annotations

from linkedin_iceberg_spark.catalog.metadata import (
    CommitFailedException,
    TableMetadata,
    TableOperations,
)


class _StagedOps(TableOperations):
    """TableOperations whose 'commits' only mutate in-memory staged state."""

    def __init__(self, real: TableOperations, metadata: TableMetadata,
                 version: int):
        super().__init__(real.location)
        self._md = metadata
        self._version = version
        # CreateSnapshotEvents queued here by Table._commit instead of being
        # fired for staged (possibly never-published) snapshots; emitted by
        # Transaction.commit after the durable publish
        self.pending_events: list = []

    def refresh(self):
        return self._md

    def commit(self, base_version: int, metadata: TableMetadata) -> int:
        metadata._version = self._version  # type: ignore[attr-defined]
        self._md = metadata
        return self._version


class Transaction:
    """Usage:
        txn = table.new_transaction()
        txn.append(df1).delete_where(expr).update_properties({...})
        txn.commit()   # one snapshot chain, one metadata-file swap
    """

    def __init__(self, table):
        from linkedin_iceberg_spark.catalog.table import Table
        self._table = table
        self._base_version = table.version
        self._staged = _StagedOps(table.ops, table.metadata, table.version)
        self._work = Table(table.spark, self._staged, table.metadata,
                           table.version, table.name)
        self._committed = False

    # ---- delegated operations (each stages a snapshot in memory) ----------
    def append(self, df, **kw) -> "Transaction":
        self._work.append(df, **kw)
        return self

    def delete_where(self, expr) -> "Transaction":
        self._work.delete_where(expr)
        return self

    def overwrite_where(self, df, expr) -> "Transaction":
        self._work.overwrite_where(df, expr)
        return self

    def overwrite_partitions(self, df) -> "Transaction":
        self._work.overwrite_partitions(df)
        return self

    def upsert(self, df, key_cols) -> "Transaction":
        self._work.upsert(df, key_cols)
        return self

    def rewrite_files(self, removed_paths, added_files) -> "Transaction":
        self._work.rewrite_files(removed_paths, added_files)
        return self

    def update_properties(self, set_props=None, remove=None) -> "Transaction":
        self._work.update_properties(set_props, remove)
        return self

    def update_schema(self):
        """Returns the SchemaUpdate builder bound to the staged table; its
        .commit() stages the evolution inside this transaction."""
        return self._work.update_schema()

    # ---- atomic publish ---------------------------------------------------
    def commit(self):
        if self._committed:
            raise RuntimeError("transaction already committed")
        md = self._work.metadata
        try:
            new_version = self._table.ops.commit(self._base_version, md)
        except CommitFailedException:
            raise CommitFailedException(
                "table changed since transaction start; re-apply")
        md._version = new_version  # type: ignore[attr-defined]
        self._table.metadata = md
        self._table.version = new_version
        self._committed = True
        # the staged snapshots are durable now — fire their queued events
        # (ref: the reference notifies listeners on real commits only)
        from linkedin_iceberg_spark import events as EV
        for ev in self._staged.pending_events:
            EV.notify_all(ev)
        self._staged.pending_events.clear()
        return self._table
