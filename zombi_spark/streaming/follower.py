"""TableFollower — checkpointed incremental consumption of an EventTable.

The reference's consumers either tail the hot buffer (S7,
handlers.rs:934-1033) or track their own position with the deprecated
consumer-offset KV (T12, rocksdb.rs:896-917). The cold-tier analogue at
scale is Iceberg's incremental scan: remember the last snapshot version
you processed and read only the files appended after it. This module
composes the two pieces this engine already has —
:meth:`EventTable.read_changes` (manifest-delta incremental reads) and
:class:`~zombi_spark.streaming.offsets.ConsumerOffsets` (durable group
positions) — into a poll loop a downstream pipeline can crash and resume.

Scale notes: each :meth:`poll` is one metadata read (latest version) plus
a scan restricted to the new appends' files — cost tracks the delta, not
the table. The position commit is atomic (tmp+rename in the offset
store), written AFTER the caller's batch function returns, so a crash
mid-batch replays that batch — at-least-once, upgraded to exactly-once
when the downstream write is idempotent (same contract as foreachBatch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from zombi_spark.streaming.offsets import VERSION_SLOT, ConsumerOffsets
from zombi_spark.table.event_table import EventTable

# versions are tracked in the offsets store under a reserved pseudo
# partition (offsets.VERSION_SLOT), so table-follow positions and
# (deprecated) per-partition sequence offsets share one file without
# colliding — and expire_snapshots' retention guard can read them
_VERSION_SLOT = VERSION_SLOT


class TableFollower:
    """Follow a table's append snapshots from a durable named position."""

    def __init__(self, table: EventTable, group: str):
        self.table = table
        self.group = group
        self._offsets = ConsumerOffsets(table.path)

    @property
    def position(self) -> int | None:
        """Last snapshot version this group has fully processed (None =
        nothing yet — the next poll starts from the table's beginning)."""
        return self._offsets.get(self.group, _VERSION_SLOT)

    def poll(self) -> tuple[DataFrame, int | None]:
        """Changes since the stored position: ``(changes_df, to_version)``.

        ``to_version`` is None when there is nothing new (empty frame).
        The position is NOT advanced — call :meth:`commit` after the
        batch is durably handled, or use :meth:`process` to get the
        commit-after-success loop for free."""
        latest = self.table.latest_version()
        pos = self.position
        if latest is None or (pos is not None and pos >= latest):
            return self.table.read_changes(latest, latest), None
        return self.table.read_changes(pos, latest), latest

    def commit(self, version: int) -> None:
        """Durably record that everything ≤ ``version`` was processed."""
        self._offsets.commit(self.group, _VERSION_SLOT, version)

    def process(self, fn: Callable[[DataFrame, int], None]) -> int | None:
        """One poll-handle-commit cycle: run ``fn(changes, to_version)``
        and advance the position only after it returns. Returns the new
        position, or None when there was nothing to do."""
        changes, to_version = self.poll()
        if to_version is None:
            return None
        fn(changes, to_version)
        self.commit(to_version)
        return to_version
