"""Background maintenance policy loop (VERDICT r7 #7 / r8 #6 / r9 #7).

The maintenance VERBS have existed since round 4 — compact (M1),
expire_snapshots + remove_orphans (M4), expire_data_older_than (T8) —
as explicit calls and HTTP routes; nothing scheduled them. This module
is the scheduler: the reference's flusher runs a periodic tick that
evaluates per-topic pending stats and fires when
``file_count >= threshold_files || total_bytes >= threshold_bytes``
or the backlog's age crosses ``max_age`` (flusher/mod.rs:676-729 — the
threshold-OR-age shape). :class:`MaintenancePolicy` applies that same
shape to the lakehouse maintenance verbs:

- **compact** when the compactable small-file backlog (partitions with
  ≥ ``min_input_files`` files under ``small_file_bytes``) crosses a
  file-count or byte threshold, or has sat un-compacted past
  ``compact_max_age_s`` (the reference's ``pending_snapshot_since``
  age escalation — low traffic must not keep a backlog forever).
- **expire_snapshots → remove_orphans** when the retained snapshot log
  outgrows ``expire_keep_last`` (orphan reclamation piggybacks on
  expiry: expiring is what strands files).
- **expire_data_older_than** every tick when a ``retention_ms`` window
  is configured (the verb is a metadata no-op when nothing ages out).

Every EVALUATION is metadata-only — manifest entries and directory
listings, no Spark job, no data file opened — so a tick on a 100 TB
table costs O(manifest) on the driver, and the tick interval can be
seconds. Actions reuse the crash-safe, optimistically-retried verbs;
a lost commit race (CommitConflictError) is recorded and retried at
the next tick, never escalated out of the loop.

Run it either embedded (``policy.run_due()`` from an ingest loop after
each batch) or as a daemon thread (``policy.start(interval_s)``), the
in-process analogue of the reference's tokio maintenance task.
"""

from __future__ import annotations

import threading
import time
from collections import deque

from zombi_spark.table.event_table import CommitConflictError, EventTable


class MaintenancePolicy:
    """Threshold-driven compact / expire / orphan-GC / retention.

    Parameters mirror the reference's flusher thresholds
    (snapshot_threshold_files / snapshot_threshold_bytes /
    snapshot_max_age, flusher/mod.rs:684-689), re-aimed at the
    small-file backlog that the lakehouse cares about.

    ``clock`` is injectable (monotonic seconds) so tests drive the
    age-escalation branch without sleeping.
    """

    def __init__(
        self,
        table: EventTable,
        *,
        small_file_bytes: int = 64 << 20,
        compact_trigger_files: int = 12,
        compact_trigger_bytes: int = 512 << 20,
        compact_max_age_s: float = 600.0,
        min_input_files: int = 3,
        expire_keep_last: int = 16,
        orphan_older_than_s: float = 3600.0,
        retention_ms: int | None = None,
        recluster_every_s: float | None = None,
        recluster_strategy: str = "zorder",
        recluster_columns: list[str] | None = None,
        recluster_target_files: int = 8,
        clock=time.monotonic,
        wall_clock=time.time,
    ) -> None:
        self.table = table
        self.small_file_bytes = small_file_bytes
        self.compact_trigger_files = compact_trigger_files
        self.compact_trigger_bytes = compact_trigger_bytes
        self.compact_max_age_s = compact_max_age_s
        self.min_input_files = min_input_files
        self.expire_keep_last = expire_keep_last
        self.orphan_older_than_s = orphan_older_than_s
        self.retention_ms = retention_ms
        if recluster_every_s is not None:
            if not recluster_columns:
                raise ValueError("recluster_every_s needs recluster_columns")
            # fail fast at CONSTRUCTION: a bad (strategy, columns) pair
            # would otherwise error on every tick forever (ADVICE r13)
            from zombi_spark.table.clustering import validate_clustering_spec

            stat_kinds = table.extracted_stat_columns()
            validate_clustering_spec(
                recluster_strategy,
                recluster_columns,
                tuple(n for n, k in stat_kinds.items() if k == "int"),
                tuple(n for n, k in stat_kinds.items() if k != "int"),
            )
        self.recluster_every_s = recluster_every_s
        self.recluster_strategy = recluster_strategy
        self.recluster_columns = recluster_columns
        self.recluster_target_files = recluster_target_files
        #: monotonic time of the last SUCCESSFUL re-cluster (None = never;
        #: the first tick with a window configured is immediately due)
        self._last_recluster: float | None = None
        #: table version observed right after the last successful
        #: re-cluster — a due window with an UNCHANGED version is skipped
        #: (no data landed; a rewrite_all would churn every file and a
        #: snapshot for nothing, ADVICE r13), and a changed one rewrites
        #: only :meth:`EventTable.changed_partitions` since it (r14).
        #: RECOVERED from the snapshot log at construction: the newest
        #: compact snapshot committed with this policy's exact
        #: (strategy, columns) proves everything up to it was clustered,
        #: so a restarted daemon resumes incremental instead of paying a
        #: full-table rewrite on its first window. O(snapshots) metadata
        #: reads; an expired log safely degrades to the full rewrite.
        self._last_recluster_version: int | None = None
        if recluster_every_s is not None:
            self._last_recluster_version = self._recover_recluster_version()
        self._clock = clock
        #: wall clock (epoch seconds) for the retention cutoff — data ages
        #: by timestamp_ms, an epoch quantity, so it CANNOT use the
        #: monotonic ``clock``; injectable so tests drive the retention
        #: branch without real waiting (ADVICE r10)
        self._wall_clock = wall_clock
        #: when the CURRENT compactable backlog was first observed
        #: (None = no backlog) — the pending_snapshot_since analogue
        self._backlog_since: float | None = None
        #: bounded action log (what ran, when, outcome) — the
        #: observability surface tests and /stats read. A deque with a
        #: maxlen, NOT a list: retention_due ticks every interval when a
        #: retention window is configured, so an unbounded log would grow
        #: by one entry per tick for the multi-day lifetime of the
        #: daemon (~17k/day at a 5 s trigger).
        self.history: deque[dict] = deque(maxlen=4096)
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        #: serializes ticks across callers (ADVICE r10): a policy can be
        #: BOTH embedded in an ingest loop and start()ed as a daemon;
        #: without this, concurrent run_due calls race on _backlog_since
        #: and double-fire compact (harmless but noisy — one loses the
        #: optimistic commit race every time). Non-blocking: a tick that
        #: finds another in flight skips, it doesn't queue.
        self._tick_lock = threading.Lock()

    def _recover_recluster_version(self) -> int | None:
        """The newest snapshot version whose commit was THIS policy's
        re-cluster (operation compact, matching strategy + sort columns)
        — metadata-only, newest first, stops at the first usable match.

        A policy-committed rewrite carries ``recluster_pre_version`` in
        its summary; recovery replays the live watermark rule on it: a
        commit exactly one above the observed pre-version proves no
        append interleaved (watermark = the commit), anything else
        resumes from the pre-version. A MANUAL partition-scoped compact
        (API/HTTP ``partitions=``, summary ``scoped``) with a matching
        strategy looks identical but proves only its OWN dirs were
        clustered — trusting it would permanently skip partitions
        dirtied before it (ADVICE r14), so it is skipped."""
        try:
            names = self.table._snapshot_files()
        except Exception:  # noqa: BLE001 — table may not exist yet
            return None
        for name in reversed(names):
            snap = self.table._read_snapshot(name)
            if not (
                snap.get("operation") == "compact"
                and snap.get("strategy") == self.recluster_strategy
                and snap.get("sort_columns") == list(self.recluster_columns or [])
            ):
                continue
            v = int(name[5:13])
            pre = snap.get("recluster_pre_version")
            if pre is not None:
                return v if v == int(pre) + 1 else int(pre)
            if snap.get("scoped"):
                continue
            return v
        return None

    # ------------------------------------------------------------ evaluate
    def evaluate(self, now: float | None = None) -> dict:
        """Metadata-only tick evaluation: which actions are due and why.

        Never opens a data file: ``table.files()`` is the committed
        manifest (size/row-count already recorded at commit), the
        snapshot log is a directory listing.
        """
        now = self._clock() if now is None else now
        files = self.table.files()
        by_part: dict[str, list[int]] = {}
        for f in files:
            if f["file_size_bytes"] < self.small_file_bytes:
                by_part.setdefault(f["partition_dir"], []).append(
                    f["file_size_bytes"]
                )
        compactable = {
            p: sizes
            for p, sizes in by_part.items()
            if len(sizes) >= self.min_input_files
        }
        backlog_files = sum(len(s) for s in compactable.values())
        backlog_bytes = sum(sum(s) for s in compactable.values())
        if compactable:
            if self._backlog_since is None:
                self._backlog_since = now
        else:
            self._backlog_since = None
        backlog_age_s = (
            0.0 if self._backlog_since is None else now - self._backlog_since
        )
        threshold_exceeded = (
            backlog_files >= self.compact_trigger_files
            or backlog_bytes >= self.compact_trigger_bytes
        )
        age_exceeded = bool(compactable) and backlog_age_s >= self.compact_max_age_s
        n_snapshots = len(self.table._snapshot_files())
        return {
            "backlog_files": backlog_files,
            "backlog_bytes": backlog_bytes,
            "backlog_partitions": len(compactable),
            "backlog_age_s": round(backlog_age_s, 3),
            "compact_due": threshold_exceeded or age_exceeded,
            "compact_reason": (
                "threshold" if threshold_exceeded else "age" if age_exceeded else None
            ),
            "n_snapshots": n_snapshots,
            "expire_due": n_snapshots > self.expire_keep_last,
            "retention_due": self.retention_ms is not None,
            "recluster_due": (
                self.recluster_every_s is not None
                and bool(files)
                and (
                    self._last_recluster is None
                    or now - self._last_recluster >= self.recluster_every_s
                )
                # change detection: version unchanged since the last
                # successful re-cluster ⇒ the layout is already the one
                # that rewrite would produce — skip the churn
                and self.table.latest_version() != self._last_recluster_version
            ),
        }

    # ------------------------------------------------------------ actions
    def run_due(self, now: float | None = None) -> list[dict]:
        """One tick: evaluate, run every due action, log outcomes.

        Action order matters: retention first (it strands files that the
        SAME tick's compact would otherwise rewrite for nothing), then
        compact, then snapshot expiry + orphan GC (expiry is what makes
        orphans reclaimable).

        Ticks are serialized by a policy-owned non-blocking lock: a call
        that finds another tick in flight (embedded ingest hook racing
        the daemon thread) returns ``[]`` immediately — the in-flight
        tick is already doing this tick's work. Per-action failures are
        ISOLATED (the reference flusher's per-item error handling,
        flusher/mod.rs:676-729): one action raising — a commit race, an
        OSError from retention — is recorded in ``history`` and the
        remaining due actions still run."""
        if not self._tick_lock.acquire(blocking=False):
            return []
        try:
            return self._run_due_locked(now)
        finally:
            self._tick_lock.release()

    def _run_due_locked(self, now: float | None = None) -> list[dict]:
        ev = self.evaluate(now)
        actions: list[dict] = []

        def _record(kind: str, fn):
            entry: dict = {"action": kind, "at_monotonic": self._clock()}
            try:
                entry["result"] = fn()
                entry["ok"] = True
            except CommitConflictError as exc:
                # lost an optimistic race to a writer — next tick retries
                entry["ok"] = False
                entry["error"] = str(exc)
            except Exception as exc:  # noqa: BLE001 — isolate per action
                # ANY other failure (an OSError from retention, a storage
                # hiccup) must not abort the remaining due actions and
                # must leave an observable record even on the embedded
                # path, which has no caller to re-raise to (ADVICE r10)
                entry["ok"] = False
                entry["error"] = f"{type(exc).__name__}: {exc}"
            self.history.append(entry)
            actions.append(entry)

        if ev["retention_due"]:
            cutoff = int(self._wall_clock() * 1000) - int(self.retention_ms)
            _record(
                "retention",
                lambda: self.table.expire_data_older_than(cutoff),
            )
        if ev["recluster_due"]:
            # a re-layout subsumes this tick's small-file compact for the
            # dirty partitions, so compact is skipped when both fire —
            # one rewrite, not two. INCREMENTAL (r14): only the storage
            # partitions whose file set changed since the last successful
            # rewrite are re-clustered (appends bring new data; an
            # intermediate binpack compact de-clusters a dir — both make
            # it dirty, changed_partitions counts both). The first
            # rewrite (no prior version) covers the whole table; at
            # 100 TB every later window costs O(dirty dirs), never a
            # full-table rewrite.
            def _recluster():
                # observe the version BEFORE computing the dirty set: any
                # commit landing after this point must stay ABOVE the
                # watermark this window records, or its partitions would
                # silently never be re-clustered (ADVICE r14 race)
                pre = self.table.latest_version()
                dirty = (
                    None
                    if self._last_recluster_version is None
                    else self.table.changed_partitions(self._last_recluster_version)
                )
                r = self.table.compact(
                    strategy=self.recluster_strategy,
                    sort_columns=self.recluster_columns,
                    rewrite_all=True,
                    min_input_files=1,
                    target_files_per_partition=self.recluster_target_files,
                    partitions=dirty,
                    # recorded in the snapshot so a RESTARTED daemon can
                    # replay the same watermark rule (_recover_recluster_version)
                    extra_summary={"recluster_pre_version": pre},
                )
                self._last_recluster = self._clock()
                # Watermark = the rewrite's OWN committed version, never
                # latest_version() (which may already include an append
                # committed while the rewrite ran). A commit more than one
                # version above `pre` means an append interleaved between
                # the dirty-set read and the commit (the rewrite REBASED
                # over it): that append is below `committed` but was never
                # in `dirty`, so keep `pre` as the watermark and let the
                # next window re-scan the interleaved commits — one window
                # of re-churn, never a silently-stale layout.
                committed = r.get("version")
                clean = (
                    committed is not None
                    and pre is not None
                    and (committed == pre if r.get("noop") else committed == pre + 1)
                )
                self._last_recluster_version = committed if clean else pre
                self._backlog_since = None
                return r

            _record("recluster", _recluster)
        elif ev["compact_due"]:
            entry_meta = {"reason": ev["compact_reason"]}

            def _compact():
                r = self.table.compact(
                    small_file_bytes=self.small_file_bytes,
                    min_input_files=self.min_input_files,
                )
                self._backlog_since = None  # backlog cleared (or re-observed)
                return {**entry_meta, **r}

            _record("compact", _compact)
        if ev["expire_due"]:
            _record(
                "expire_snapshots",
                lambda: {"expired": self.table.expire_snapshots(self.expire_keep_last)},
            )
            _record(
                "remove_orphans",
                lambda: {"removed": len(self.table.remove_orphans(self.orphan_older_than_s))},
            )
        return actions

    # ------------------------------------------------------------ thread
    def start(self, interval_s: float = 30.0) -> "MaintenancePolicy":
        """Run ticks on a daemon thread every ``interval_s`` until
        :meth:`stop` — the in-process analogue of the reference's
        background flusher task. Exceptions are logged to history and
        never kill the loop."""
        if self._thread is not None:
            raise RuntimeError("maintenance loop already running")
        self._stop.clear()

        def _loop():
            while not self._stop.wait(interval_s):
                try:
                    self.run_due()
                except Exception as exc:  # noqa: BLE001 — loop must survive
                    self.history.append(
                        {"action": "tick", "ok": False, "error": f"{type(exc).__name__}: {exc}"}
                    )

        self._thread = threading.Thread(
            target=_loop, name=f"maintenance-{self.table.name}", daemon=True
        )
        self._thread.start()
        return self

    def stop(self, timeout_s: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout_s)
            self._thread = None
