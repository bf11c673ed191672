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
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("payload_bytes"),
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

    def read(self) -> DataFrame:
        """The current rollup — a metadata-cheap parquet read of the
        state the pointer references (empty frame before any refresh)."""
        ptr = self._pointer()
        if ptr is None:
            # empty state with the exact output schema: aggregate an
            # empty slice of the table itself
            return self._agg(self.table.read().limit(0))
        return self.spark.read.parquet(os.path.join(self.path, ptr["state_dir"]))

    def refresh(self) -> dict:
        """Fold appends since :attr:`position` into the state. Returns
        ``{from_version, to_version, delta_rows, state_rows}``; a no-op
        report (``to_version is None``) when nothing is new."""
        latest = self.table.latest_version()
        pos = self.position
        if latest is None or (pos is not None and pos >= latest):
            return {"from_version": pos, "to_version": None, "delta_rows": 0}
        delta = self.table.read_changes(pos, latest)
        partial = self._agg(delta)
        merged = partial if pos is None else self._merge(self.read(), partial)
        state_dir = f"state-{uuid.uuid4().hex[:12]}"
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, state_dir)
        merged.write.mode("overwrite").parquet(out)
        n_state = self.spark.read.parquet(out).count()
        # atomic (state, position) commit: the pointer swing is the ONLY
        # visibility point — a crash before it leaves the old pair intact
        old = self._pointer()
        tmp = os.path.join(self.path, f".{_POINTER}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": latest, "state_dir": state_dir}, fh)
        os.replace(tmp, os.path.join(self.path, _POINTER))
        if old is not None:  # previous state is unreferenced now
            shutil.rmtree(os.path.join(self.path, old["state_dir"]), ignore_errors=True)
        delta_rows = delta.count()
        return {
            "from_version": pos,
            "to_version": latest,
            "delta_rows": delta_rows,
            "state_rows": n_state,
        }
