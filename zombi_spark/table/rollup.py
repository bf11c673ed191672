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

State scalability: below ``shard_threshold_rows`` the state is one
parquet directory rewritten per refresh (fine at the thousands of keys a
topic-hour rollup accumulates). Past the threshold the state shards by
key hash (``_shard = md5(keys) % n_shards`` partition dirs) and a
refresh REWRITES ONLY THE SHARDS ITS DELTA TOUCHES — untouched shards
are hardlinked from the previous state generation into the new one, so
the atomic pointer-swing contract is unchanged while the write cost
tracks keys touched, not keys accumulated (the contract a
high-cardinality key set, e.g. per-user rollups, needs)."""

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
        n_shards: int = 32,
        shard_threshold_rows: int = 100_000,
    ):
        self.table = table
        self.spark = table.spark
        self.path = path
        self.keys = list(keys)
        self.n_shards = n_shards
        self.shard_threshold_rows = shard_threshold_rows
        # same commit primitives as the owning table: shard carry-forward
        # hardlinks on POSIX, COPIES under object-store semantics
        self.backend = table.backend

    def _shard_col(self, n_shards: int | None = None) -> F.Column:
        """Deterministic shard of the key tuple — a pure function of the
        key columns, so a key's rows land in the same shard in every
        state generation and in every engine with md5. ``n_shards``
        defaults to the instance setting; the incremental path passes the
        POINTER's recorded width so an instance constructed with a
        different setting still addresses the existing layout correctly."""
        from zombi_spark.functions.hashing import md5_long

        return F.pmod(
            md5_long(F.concat_ws("\x1f", *[F.col(k).cast("string") for k in self.keys])),
            F.lit(n_shards or self.n_shards),
        ).cast("int")

    def _link_untouched_shards(self, old_dir: str, new_dir: str, touched: set[int]) -> None:
        """Carry untouched ``_shard=K`` partition dirs from the previous
        state generation into the new one by HARDLINK (fallback copy):
        O(1) metadata per file, no data rewrite, and the old generation
        stays intact for in-flight readers until GC."""
        if not os.path.isdir(old_dir):
            return
        for d in os.listdir(old_dir):
            if not d.startswith("_shard="):
                continue
            try:
                sh = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if sh in touched:
                continue
            src, dst = os.path.join(old_dir, d), os.path.join(new_dir, d)
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                if f.startswith(".") or f.startswith("_"):
                    continue
                self.backend.carry_forward(os.path.join(src, f), os.path.join(dst, f))

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
        df = self.spark.read.parquet(os.path.join(self.path, ptr["state_dir"]))
        # _shard is internal layout (partition-discovered on sharded states)
        return ptr["version"], df.drop("_shard")

    def read(self) -> DataFrame:
        """The current rollup — a metadata-cheap parquet read of the
        state the pointer references (empty frame before any refresh)."""
        return self.snapshot()[1]

    def _rows_were_removed_in(self, from_version: int | None, to_version: int) -> bool:
        """True when a snapshot in ``(from_version, to_version]`` removed
        ROWS from the table (retention delete, row takedown — including
        a MERGE-ON-READ takedown, which removes rows while removing no
        data file: ``added_deletes`` is its marker). Compaction also
        records removed files but is row-preserving from the fold's view
        (its adds carry the same VISIBLE rows — tombstones it consumes
        were already invisible at their delete snapshot), so the
        additive fold stays valid across it."""
        for s in self.table.snapshots():
            if (from_version is None or s["version"] > from_version) and s[
                "version"
            ] <= to_version:
                if s.get("removed") and s.get("operation") != "compact":
                    return True
                if s.get("added_deletes"):
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
            state_dir = f"state-{uuid.uuid4().hex[:12]}"
            out = os.path.join(self.path, state_dir)
            old_n_shards = (ptr or {}).get("n_shards")
            incremental = ptr is not None and source is None
            # shard from this refresh onward once the accumulated state
            # crosses the threshold (one refresh of lag — decided off the
            # pointer's recorded size, no extra count)
            shard_now = bool(old_n_shards) or (
                (ptr or {}).get("state_rows", 0) > self.shard_threshold_rows
            )
            if incremental and old_n_shards:
                # SHARDED incremental: merge + rewrite ONLY the shards the
                # delta touches; untouched shards hardlink across
                old_dir = os.path.join(self.path, ptr["state_dir"])
                shard = self._shard_col(old_n_shards)
                touched = sorted(
                    {
                        r["_shard"]
                        for r in partial.select(shard.alias("_shard")).distinct().collect()
                    }
                )
                n_old_touched = 0
                if touched:
                    old_touched = (
                        self.spark.read.parquet(old_dir)
                        .where(F.col("_shard").isin(touched))
                        .drop("_shard")
                    )
                    n_old_touched = old_touched.count()
                    (
                        self._merge(old_touched, partial)
                        .withColumn("_shard", shard)
                        .write.mode("overwrite")
                        .partitionBy("_shard")
                        .parquet(out)
                    )
                else:
                    os.makedirs(out, exist_ok=True)
                # count BEFORE linking: only the rewritten shards are in
                # `out`, so this never re-reads the whole state
                n_new_touched = (
                    self.spark.read.parquet(out).count() if touched else 0
                )
                self._link_untouched_shards(old_dir, out, set(touched))
                n_state = ptr["state_rows"] - n_old_touched + n_new_touched
                new_shards: int | None = old_n_shards
            else:
                if incremental:
                    old_state = self.spark.read.parquet(
                        os.path.join(self.path, ptr["state_dir"])
                    ).drop("_shard")
                    merged = self._merge(old_state, partial)
                else:
                    merged = partial  # first build, or full rebuild
                if shard_now and not merged.isEmpty():
                    # transition / rebuild into the sharded layout
                    (
                        merged.withColumn("_shard", self._shard_col())
                        .write.mode("overwrite")
                        .partitionBy("_shard")
                        .parquet(out)
                    )
                    new_shards = self.n_shards
                else:
                    # NB: an EMPTY state must write UNSHARDED — a
                    # zero-row partitionBy write emits no part files at
                    # all, so the dir has no schema and the read-back
                    # raises; the plain write emits a schema-bearing
                    # file (hit when a retention delete empties a
                    # sharded rollup's whole key range)
                    merged.write.mode("overwrite").parquet(out)
                    new_shards = None
                n_state = self.spark.read.parquet(out).count()
            # atomic (state, position) commit: the pointer swing is the
            # ONLY visibility point — a crash before it leaves the old
            # pair intact
            tmp = os.path.join(self.path, f".{_POINTER}.{uuid.uuid4().hex[:8]}.tmp")
            new_ptr = {
                "version": latest,
                "state_dir": state_dir,
                "state_rows": n_state,
            }
            if new_shards:
                new_ptr["n_shards"] = new_shards
            with open(tmp, "w") as fh:
                json.dump(new_ptr, fh)
            self.backend.swing(tmp, os.path.join(self.path, _POINTER))
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
