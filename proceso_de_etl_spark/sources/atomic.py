"""Atomic multi-table sink (SURVEY.md §2.1 E13 / §2.4 S7).

The reference wraps its whole load phase in one DB transaction with
rollback (reference main.py:173-195). A distributed file sink gets
the same all-or-nothing semantics from a stage-then-promote protocol:

1. every table writes to ``<root>/_staging/<txn>/<table>``;
2. only after ALL writes succeed does promotion start, and it is
   CRASH-RECOVERABLE: an existing final is first renamed ASIDE to
   ``<table>.__old_<txn>`` (never deleted), then the staging dir is
   renamed into place and stamped with a ``_txn`` file carrying the
   transaction id (an underscore-prefixed file, which parquet
   readers treat as metadata and skip);
3. the batch-level commit record ``<root>/_txn/<txn>`` is written
   LAST — readers that honor the marker protocol never observe a
   half-promoted batch, and the per-table ``_txn`` stamp lets them
   (and recovery tooling) match each table version to its marker;
4. only after the marker exists are the ``.__old_*`` dirs deleted.

Failure handling: an exception anywhere before the marker write
un-promotes the already-renamed tables and restores every
``.__old_*`` dir, so the previous versions are never lost — the
all-or-nothing guarantee holds across promotion, not just before it.
A hard crash mid-promotion leaves the old versions intact on disk
(as finals or ``.__old_*``) and no commit marker: recoverable, and
invisible to marker-honoring readers.
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

    def _old_path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.__old_{self.txn}")

    def stage(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self._staging_path(table))
        self._staged.append(table)

    def commit(self) -> None:
        """Promote every staged table (rename old aside → rename new
        in → stamp txn id), drop the batch commit marker, then clean
        up the old versions. Any exception before the marker write
        rolls the promotion back with the previous finals restored."""
        promoted: list[str] = []
        olds: dict[str, str] = {}
        try:
            for table in self._staged:
                final = os.path.join(self.root, table)
                if os.path.exists(final):
                    os.rename(final, self._old_path(table))
                    olds[table] = self._old_path(table)
                os.rename(self._staging_path(table), final)
                promoted.append(table)
                with open(os.path.join(final, "_txn"), "w") as fh:
                    fh.write(self.txn)
        except Exception:
            # un-promote the new versions, restore every old version
            for table in reversed(promoted):
                shutil.rmtree(os.path.join(self.root, table), ignore_errors=True)
            for table, old in olds.items():
                final = os.path.join(self.root, table)
                if os.path.exists(old) and not os.path.exists(final):
                    os.rename(old, final)
            raise
        open(os.path.join(self.root, "_txn", self.txn), "w").close()
        for old in olds.values():
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)

    def rollback(self) -> None:
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)
        self._staged.clear()


def atomic_write_tables(root: str, tables: dict[str, DataFrame]) -> int:
    """All-or-nothing write of a table group; returns tables written.
    Any failure — during staging OR during promotion — rolls back
    with the previous finals intact."""
    writer = AtomicBatchWriter(root)
    try:
        for name, df in tables.items():
            writer.stage(df, name)
        writer.commit()
        return len(tables)
    except Exception:
        writer.rollback()
        raise
