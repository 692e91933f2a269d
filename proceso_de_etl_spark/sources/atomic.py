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
    def __init__(self, root: str, retain_history: bool = False) -> None:
        self.root = root
        self.txn = uuid.uuid4().hex[:16]
        self.retain_history = retain_history
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
        # commit sequence number orders versions without relying on
        # filesystem mtimes (single-writer protocol, like the rest)
        seq = len(os.listdir(os.path.join(self.root, "_txn"))) + 1
        with open(os.path.join(self.root, "_txn", self.txn), "w") as fh:
            fh.write(str(seq))
        for table, old in olds.items():
            if self.retain_history:
                archived = os.path.join(self.root, "_versions", table, _dir_txn(old))
                os.makedirs(os.path.dirname(archived), exist_ok=True)
                os.rename(old, archived)
            else:
                shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)

    def rollback(self) -> None:
        shutil.rmtree(os.path.join(self.root, "_staging", self.txn), ignore_errors=True)
        self._staged.clear()


def _dir_txn(table_dir: str) -> str:
    """The txn id stamped inside a promoted table dir (step 2 of the
    protocol); pre-protocol dirs get a sentinel so archival never
    collides."""
    stamp = os.path.join(table_dir, "_txn")
    if os.path.exists(stamp):
        return open(stamp).read().strip()
    return "unstamped"


def list_table_versions(root: str, table: str) -> list[tuple[str, str]]:
    """(txn, 'current'|'archived') for every retained version of a
    table, current first, archived ordered by commit sequence (the
    number in the batch marker) descending — newest history first."""
    out: list[tuple[str, str]] = []
    final = os.path.join(root, table)
    if os.path.exists(final):
        out.append((_dir_txn(final), "current"))

    def _seq(txn: str) -> int:
        marker = os.path.join(root, "_txn", txn)
        try:
            return int(open(marker).read().strip())
        except (OSError, ValueError):
            return -1

    vdir = os.path.join(root, "_versions", table)
    if os.path.isdir(vdir):
        out.extend((t, "archived") for t in sorted(os.listdir(vdir), key=_seq, reverse=True))
    return out


def read_table_version(spark, root: str, table: str, txn: str | None = None) -> DataFrame:
    """Time-travel read: the current table (txn=None), or the exact
    snapshot a given transaction promoted — served straight from the
    retained version dir, no log replay. Raises KeyError with the
    retrievable txns when the requested one is gone (vacuumed or
    never existed)."""
    final = os.path.join(root, table)
    if txn is None or (_dir_txn(final) == txn if os.path.exists(final) else False):
        return spark.read.parquet(final)
    archived = os.path.join(root, "_versions", table, txn)
    if os.path.isdir(archived):
        return spark.read.parquet(archived)
    raise KeyError(
        f"version {txn!r} of {table!r} not retained; available: {list_table_versions(root, table)}"
    )


def vacuum_table_versions(root: str, table: str, keep_last: int = 0) -> int:
    """Drop archived snapshots beyond the newest ``keep_last`` (the
    storage-reclaim half of time travel). Returns dirs removed; never
    touches the current version."""
    archived = [t for t, kind in list_table_versions(root, table) if kind == "archived"]
    victims = archived[keep_last:] if keep_last > 0 else archived
    for txn in victims:
        shutil.rmtree(os.path.join(root, "_versions", table, txn), ignore_errors=True)
    return len(victims)


def atomic_write_tables(
    root: str, tables: dict[str, DataFrame], retain_history: bool = False
) -> int:
    """All-or-nothing write of a table group; returns tables written.
    Any failure — during staging OR during promotion — rolls back
    with the previous finals intact. With ``retain_history`` the
    displaced versions are archived for time-travel reads instead of
    deleted."""
    writer = AtomicBatchWriter(root, retain_history=retain_history)
    try:
        for name, df in tables.items():
            writer.stage(df, name)
        writer.commit()
        return len(tables)
    except Exception:
        writer.rollback()
        raise
