"""Consumer offset commit/get (T12 — deprecated upstream, kept for parity).

The reference stores consumer-group read positions as a tiny KV surface:
``off:{topic}:{group}:{partition}`` → sequence (rocksdb.rs:896-917) behind
``PUT/GET /tables/{t}/offsets/{group}`` (handlers.rs:1144-1188), deprecated
in favor of client-side checkpoints.  Spark's own analogue is the
Structured Streaming checkpoint; this module exists so a reference client
that still calls the offsets API has somewhere to land.

Storage is one JSON file per table root (atomic tmp+rename, like the
catalog registry) — offsets are driver-side metadata, O(groups×partitions),
never touching data files; at any scale this stays a few KB.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import uuid

_OFFSETS_FILE = "_zombi_offsets.json"

#: Reserved pseudo partition for TableFollower's per-group snapshot
#: VERSION positions (streaming/follower.py) — real partitions are ≥ 0,
#: so follower positions and the deprecated per-partition sequence
#: offsets share one file without colliding. Defined HERE so
#: EventTable.expire_snapshots can read follower lag without importing
#: follower.py (which imports event_table — cycle).
VERSION_SLOT = -1


class ConsumerOffsets:
    """Per-table consumer-group offset store.

    Commits are serialized with an flock on a sibling lockfile, not
    just the in-process mutex: the HTTP edge constructs a FRESH
    instance per request (and a follower may hold a long-lived one in
    another process), so a per-instance threading.Lock alone would
    leave the read-modify-write racy — two concurrent commits would
    each rewrite the JSON from their own snapshot and the last rename
    would silently drop the other's offset (the same lost-update class
    ``Catalog._registry_lock`` guards)."""

    def __init__(self, table_root: str):
        self.path = os.path.join(table_root, _OFFSETS_FILE)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def _file_lock(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd = os.open(f"{self.path}.lock", os.O_CREAT | os.O_RDWR)
        try:
            try:
                import fcntl

                fcntl.flock(fd, fcntl.LOCK_EX)
            except ImportError:  # non-POSIX: in-process lock only
                pass
            yield
        finally:
            os.close(fd)  # releases the flock

    def _read(self) -> dict:
        if not os.path.isfile(self.path):
            return {}
        with open(self.path) as fh:
            return json.load(fh)

    def _write(self, data: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = f"{self.path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, sort_keys=True)
        os.replace(tmp, self.path)

    @staticmethod
    def _key(group: str, partition: int) -> str:
        return f"{group}:{partition}"

    def commit(self, group: str, partition: int, offset: int) -> None:
        """``PUT /offsets/{group}`` (handlers.rs:1144-1165): last-write-wins,
        like the reference's unconditional KV put."""
        with self._lock, self._file_lock():
            data = self._read()
            data[self._key(group, partition)] = int(offset)
            self._write(data)

    def get(self, group: str, partition: int) -> int | None:
        """``GET /offsets/{group}`` (handlers.rs:1167-1188): None when the
        group has no committed position (new consumer starts at the low
        watermark)."""
        return self._read().get(self._key(group, partition))

    def all_for_group(self, group: str) -> dict[int, int]:
        prefix = f"{group}:"
        return {
            int(k.split(":", 1)[1]): v
            for k, v in self._read().items()
            if k.startswith(prefix)
        }

    def follower_positions(self) -> dict[str, int]:
        """group → last fully-processed snapshot version, for every
        registered table follower (the :data:`VERSION_SLOT` pseudo
        partition). One metadata file read; the retention guard in
        ``EventTable.expire_snapshots`` sizes its kill window from the
        minimum of these."""
        out: dict[str, int] = {}
        for k, v in self._read().items():
            group, _, part = k.rpartition(":")
            if group and part == str(VERSION_SLOT):
                out[group] = int(v)
        return out
