"""Incremental materialized rollup — a continuously-maintained
aggregate over an EventTable's snapshot log (the continuous-aggregate /
materialized-view pattern: TimescaleDB's continuous aggregates, Iceberg
incremental refresh).

Why it matters at 100 TB: the per-hour dashboard question ("events,
bytes, freshness per topic-hour") must not re-scan the event table.
Each :meth:`refresh` reads ONLY the files appended since the last
refresh (``EventTable.read_changes`` — a manifest delta), merges the
batch's partial aggregates into the tiny rollup state, and serves any
later query from that state in milliseconds. Cost tracks the delta; the
state is O(distinct keys), thousands of rows for years of hours.

Exactly-once by construction: the state parquet AND the position are
committed together — a refresh writes a NEW state directory, then
atomically swings one pointer file carrying ``{version, state_dir}``
(tmp + rename). A crash between the state write and the pointer leaves
the pointer at the old (state, position) pair, so the next refresh
recomputes the same delta against the OLD state — no double counting,
no torn state (the same invariant the engine's snapshot commits use).

All aggregates kept are DECOMPOSABLE (sum/min/max re-aggregate), which
is what makes delta-merge correct: merged(old, delta) == full recompute.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zombi_spark.table.event_table import EventTable

_POINTER = "ROLLUP.json"
_DEFAULT_KEYS = ("topic", "partition", "event_date", "event_hour")


class MaterializedRollup:
    """Per-key event rollup (count, bytes, ts bounds, high sequence)
    maintained incrementally from the table's append snapshots."""

    def __init__(
        self,
        table: EventTable,
        path: str,
        keys: tuple[str, ...] = _DEFAULT_KEYS,
    ):
        self.table = table
        self.spark = table.spark
        self.path = path
        self.keys = list(keys)

    # ------------------------------------------------------------- pointer
    @contextlib.contextmanager
    def _refresh_lock(self, blocking: bool = True):
        """flock serializing refreshes ACROSS processes: two concurrent
        refreshes that both snapshot the same position would each fold
        the same delta — the second one on top of the first one's
        already-folded state (its merge re-reads the pointer), silently
        double-counting every key in the delta. The edge's per-table
        maintenance lock covers only its own process; this is the
        cross-process guard (same pattern as Catalog._registry_lock).

        ``blocking=False`` yields ``False`` instead of waiting when
        another refresh holds the lock — for callers on a latency path
        (the per-micro-batch continuous fold) that must not couple their
        cadence to a foreign process's refresh duration."""
        os.makedirs(self.path, exist_ok=True)
        fd = os.open(os.path.join(self.path, ".refresh.lock"), os.O_CREAT | os.O_RDWR)
        try:
            try:
                import fcntl

                try:
                    fcntl.flock(
                        fd,
                        fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB),
                    )
                except OSError:
                    yield False  # held elsewhere; non-blocking caller skips
                    return
            except ImportError:
                # no flock on this platform: the cross-process
                # double-count guard is ABSENT, not just degraded — warn
                # loudly so an operator can tell the guarantee is gone
                import warnings

                warnings.warn(
                    "fcntl unavailable: rollup refreshes are not "
                    "serialized across processes — concurrent refreshes "
                    "can double-count deltas",
                    RuntimeWarning,
                    stacklevel=3,
                )
            yield True
        finally:
            os.close(fd)

    def _pointer(self) -> dict | None:
        p = os.path.join(self.path, _POINTER)
        if not os.path.isfile(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    @property
    def position(self) -> int | None:
        """Last snapshot version folded into the state (None = empty)."""
        ptr = self._pointer()
        return None if ptr is None else ptr["version"]

    # --------------------------------------------------------------- state
    def _agg(self, df: DataFrame) -> DataFrame:
        # extraction tables drop the raw payload column at write
        # (schema-on-write, §1.3) — their rollup carries zero bytes
        # rather than an unresolved-column failure
        bytes_col = F.length("payload") if "payload" in df.columns else F.lit(0)
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(bytes_col, F.lit(0))).alias("payload_bytes"),
            F.min("timestamp_ms").alias("min_ts"),
            F.max("timestamp_ms").alias("max_ts"),
            F.max("sequence").alias("max_seq"),
        )

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        # decomposable re-aggregation: counts/bytes sum, bounds min/max
        return (
            state.unionByName(partial)
            .groupBy(*self.keys)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("payload_bytes").alias("payload_bytes"),
                F.min("min_ts").alias("min_ts"),
                F.max("max_ts").alias("max_ts"),
                F.max("max_seq").alias("max_seq"),
            )
        )

    def snapshot(self) -> tuple[int | None, DataFrame]:
        """(position, state) from ONE pointer read — the pair a server
        response should report together (reading them separately lets a
        concurrent refresh slip between, pairing new rows with an old
        position)."""
        ptr = self._pointer()
        if ptr is None:
            # empty state with the exact output schema: aggregate an
            # empty slice of the table itself
            return None, self._agg(self.table.read().limit(0))
        return ptr["version"], self.spark.read.parquet(
            os.path.join(self.path, ptr["state_dir"])
        )

    def read(self) -> DataFrame:
        """The current rollup — a metadata-cheap parquet read of the
        state the pointer references (empty frame before any refresh)."""
        return self.snapshot()[1]

    def _rows_were_removed_in(self, from_version: int | None, to_version: int) -> bool:
        """True when a snapshot in ``(from_version, to_version]`` removed
        ROWS from the table (retention delete). Compaction also records
        removed files but is row-preserving (its adds carry the same
        rows), so the additive fold stays valid across it."""
        for s in self.table.snapshots():
            if (from_version is None or s["version"] > from_version) and s[
                "version"
            ] <= to_version:
                if s.get("removed") and s.get("operation") != "compact":
                    return True
        return False

    def refresh(self, blocking: bool = True) -> dict:
        """Fold appends since :attr:`position` into the state. Returns
        ``{from_version, to_version, delta_rows, state_rows}``; a no-op
        report (``to_version is None``) when nothing is new, and a
        ``{"skipped": True}`` report when ``blocking=False`` and another
        process's refresh holds the lock (the next refresh catches up).

        Serialized cross-process by :meth:`_refresh_lock`; the pointer
        is read ONCE and everything (old state, delta range, GC) derives
        from that snapshot — re-reading it mid-refresh is how a
        concurrent refresh's result would get folded in twice. The delta
        parquet is scanned exactly once: the partial aggregate (O(keys
        touched) rows) is collected and re-lifted, which both feeds the
        merge without a second scan and gives ``delta_rows`` for free.

        Row-REMOVING snapshots in the range (retention deletes) can't be
        folded additively — the refresh detects them and recomputes the
        state from the live table instead, so ``merged == full
        recompute`` holds across retention too (compaction is
        row-preserving and stays on the cheap additive path)."""
        with self._refresh_lock(blocking=blocking) as held:
            if not held:
                return {"skipped": True, "to_version": None, "delta_rows": 0}
            ptr = self._pointer()
            pos = None if ptr is None else ptr["version"]
            latest = self.table.latest_version()
            if latest is None or (pos is not None and pos >= latest):
                return {"from_version": pos, "to_version": None, "delta_rows": 0}
            if pos is not None and self._rows_were_removed_in(pos, latest):
                # retention delete in range: additive fold would keep
                # counting the dropped rows — rebuild from the live table
                source = self.table.read(version=latest)
            else:
                source = None
            delta = (
                source
                if source is not None
                else self.table.read_changes(pos, latest)
            )
            partial_plan = self._agg(delta)
            partial_rows = partial_plan.collect()  # the ONE delta scan
            delta_rows = sum(r["n_events"] for r in partial_rows)
            partial = self.spark.createDataFrame(partial_rows, partial_plan.schema)
            if ptr is None or source is not None:
                merged = partial  # first build, or full rebuild
            else:
                old_state = self.spark.read.parquet(
                    os.path.join(self.path, ptr["state_dir"])
                )
                merged = self._merge(old_state, partial)
            state_dir = f"state-{uuid.uuid4().hex[:12]}"
            out = os.path.join(self.path, state_dir)
            merged.write.mode("overwrite").parquet(out)
            n_state = self.spark.read.parquet(out).count()
            # atomic (state, position) commit: the pointer swing is the
            # ONLY visibility point — a crash before it leaves the old
            # pair intact
            tmp = os.path.join(self.path, f".{_POINTER}.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"version": latest, "state_dir": state_dir}, fh)
            os.replace(tmp, os.path.join(self.path, _POINTER))
            # GC with one generation of grace: keep the new state and the
            # immediately-previous one (a lock-free reader that loaded
            # the old pointer may still be collecting from it); every
            # other state-* dir — older generations AND orphans from
            # crashed refreshes — is reclaimed
            keep = {state_dir} | ({ptr["state_dir"]} if ptr else set())
            for d in os.listdir(self.path):
                if d.startswith("state-") and d not in keep:
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return {
            "from_version": pos,
            "to_version": latest,
            "delta_rows": delta_rows,
            "state_rows": n_state,
            "rebuilt": source is not None,
        }
