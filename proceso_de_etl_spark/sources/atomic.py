"""Atomic multi-table sink (SURVEY.md §2.1 E13 / §2.4 S7).

The reference wraps its whole load phase in one DB transaction with
rollback (reference main.py:173-195). A distributed file sink gets
the same all-or-nothing semantics from a stage-then-promote protocol:

1. every table writes to ``<root>/_staging/<txn>/<table>``;
2. only after ALL writes succeed, each staging dir is renamed to its
   final location (rename is atomic per table on HDFS/local; the
   ``_SUCCESS``-marker txn file makes the whole group visible);
3. any failure before promotion leaves finals untouched — the
   "rollback" is simply deleting the staging dir.

Readers treat the txn marker as the commit record: tables from a
transaction are visible only when ``<root>/_txn/<txn>`` exists.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


class AtomicBatchWriter:
    def __init__(self, root: str) -> None:
        self.root = root
        self.txn = uuid.uuid4().hex[:16]
        self._staged: list[str] = []
        os.makedirs(os.path.join(root, "_txn"), exist_ok=True)

    def _staging_path(self, table: str) -> str:
        return os.path.join(self.root, "_staging", self.txn, table)

    def stage(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self._staging_path(table))
        self._staged.append(table)

    def commit(self) -> None:
        """Promote every staged table, then drop the commit marker.
        Promotion is per-table-atomic; the marker makes the batch
        atomic for readers that honor it."""
        for table in self._staged:
            final = os.path.join(self.root, table)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(self._staging_path(table), final)
        open(os.path.join(self.root, "_txn", self.txn), "w").close()
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)

    def rollback(self) -> None:
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)
        self._staged.clear()


def atomic_write_tables(root: str, tables: dict[str, DataFrame]) -> int:
    """All-or-nothing write of a table group; returns tables written.
    Any failure rolls back with finals untouched."""
    writer = AtomicBatchWriter(root)
    try:
        for name, df in tables.items():
            writer.stage(df, name)
        writer.commit()
        return len(tables)
    except Exception:
        writer.rollback()
        raise
