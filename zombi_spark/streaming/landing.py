"""Landing-zone write plane — the filesystem half of ingest, Spark-free.

The reference's edge accepts writes on many OS threads at once
(api/handlers.rs:64-232); the engine behind it only sees durably-landed
batches. This module is that boundary with NO pyspark import so it can
run in plain worker PROCESSES (the multi-process HTTP write plane in
:mod:`zombi_spark.streaming.http_edge`): producers land atomic files,
admission control bounds the un-ingested backlog, and the write combiner
turns per-request writes into per-few-milliseconds files. The
Spark-attached :class:`~zombi_spark.streaming.ingest.StreamingIngest`
composes a :class:`LandingZone` and layers the streaming query on top.

Cross-process safety is by construction: landing files are tmp+rename
with unique names (no writer ever observes a half file, two writers
never collide), and the checkpoint seen-file list used by admission
control is read-only here — Spark's file-source log is written only by
the one streaming query.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.parse
import uuid


class AdmissionRejected(RuntimeError):
    """Landing-zone backlog over budget — the 503 the reference's edge
    returns when its in-flight semaphore is exhausted
    (handlers.rs:64-232)."""


class LandingZone:
    """Producer-side view of one table's landing zone: atomic batch
    landing (:meth:`produce`) plus T10 admission control against the
    streaming checkpoint's committed-file log. Safe to instantiate in
    any process — only filesystem paths are held."""

    #: seconds between backlog-counter resyncs against the filesystem —
    #: the admitted-while-stale window (bounded the same way the permit
    #: semantics already are: budget + one batch per writer, plus up to
    #: one interval of other-process produces)
    RESYNC_INTERVAL_S = 0.5

    def __init__(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        byte_budget: int | None = None,
    ):
        # absolute from the start: checkpoint logs record file:// URIs
        # (always absolute), and every membership test here compares
        # against paths built from landing_dir — a relative landing_dir
        # would never match and every committed file would look pending
        from zombi_spark.table.commit_backend import get_backend

        self.landing_dir = os.path.abspath(landing_dir)
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        self.byte_budget = byte_budget
        # landing publish is an atomic pointer-style PUT (file appears
        # fully formed or not at all) — backend-swung for object stores
        self.backend = get_backend()
        self._seen_cache: tuple[tuple, set[str]] | None = None
        # O(1) admission accounting (the reference keeps atomic in-flight
        # counters, handlers.rs:64-232): produce() bumps this cached
        # backlog-byte counter; the O(backlog) directory walk runs only as
        # the periodic resync / refusal-confirmation path
        self._backlog_lock = threading.Lock()
        self._backlog_bytes: int | None = None
        self._backlog_synced_at = 0.0

    def _committed_batch_ids(self) -> set[int]:
        """Batch ids with a ``<ckpt>/commits/<id>`` marker — the batches
        whose sink work (our ``EventTable.append``) actually completed."""
        commits = os.path.join(self.checkpoint_dir, "commits")
        ids: set[int] = set()
        if os.path.isdir(commits):
            for f in os.listdir(commits):
                if not f.startswith("."):
                    try:
                        ids.add(int(f.removesuffix(".compact")))
                    except ValueError:
                        pass
        return ids

    def checkpoint_seen_files(self) -> set[str]:
        """Landing files in a COMMITTED micro-batch. Spark's file source
        writes ``<ckpt>/sources/0/<batchId>`` at batch PLANNING time —
        before foreachBatch runs — so an entry there alone does not mean
        the data is durable in the table; the batch is done only once
        ``<ckpt>/commits/<batchId>`` exists. Each sources entry carries
        its ``batchId``, so membership is entry-level: a planned-but-
        uncommitted batch's files stay un-seen (still hot, still backlog,
        never cleanup-eligible). Parsed once per log state (cached on the
        log dirs' file list + mtimes) — tail/produce costs stay flat as
        the stream ages instead of re-reading every batch's log."""
        src_log = os.path.join(self.checkpoint_dir, "sources", "0")
        commits = os.path.join(self.checkpoint_dir, "commits")

        def _dir_state(d: str) -> tuple:
            if not os.path.isdir(d):
                return ()
            out = []
            for f in sorted(os.listdir(d)):
                if f.startswith("."):
                    continue
                try:
                    st = os.stat(os.path.join(d, f))
                    out.append((f, st.st_mtime_ns, st.st_size))
                except OSError:
                    pass
            return tuple(out)

        key = (_dir_state(src_log), _dir_state(commits))
        if self._seen_cache is not None and self._seen_cache[0] == key:
            return self._seen_cache[1]
        committed = self._committed_batch_ids()
        seen: set[str] = set()
        if os.path.isdir(src_log):
            for logf in os.listdir(src_log):
                p = os.path.join(src_log, logf)
                if logf.startswith(".") or not os.path.isfile(p):
                    continue
                try:
                    file_batch = int(logf.removesuffix(".compact"))
                except ValueError:
                    file_batch = None
                with open(p, errors="ignore") as fh:
                    for line in fh:
                        line = line.strip()
                        if line.startswith("{"):
                            try:
                                entry = json.loads(line)
                            except ValueError:
                                continue
                            if "path" not in entry:
                                continue
                            batch = entry.get("batchId", file_batch)
                            if batch in committed:
                                # the log records a file:// URI, percent-
                                # encoded — a naive prefix-strip leaves
                                # %20 etc. in the path, so committed files
                                # in any dir with a space/non-ASCII char
                                # never match and stay "pending" forever
                                p_raw = entry["path"]
                                if p_raw.startswith("file:"):
                                    parsed = urllib.parse.urlparse(p_raw)
                                    p_raw = urllib.parse.unquote(parsed.path)
                                seen.add(os.path.abspath(p_raw))
        self._seen_cache = (key, seen)
        return seen

    def pending_files(self) -> list[str]:
        """Landed files the checkpoint has NOT yet committed (the hot
        tier), sorted. O(landing files); the budget keeps that small."""
        if not os.path.isdir(self.landing_dir):
            return []
        seen = self.checkpoint_seen_files()
        return sorted(
            full
            for f in os.listdir(self.landing_dir)
            if not f.startswith(".")  # in-flight tmp files (not yet landed)
            and os.path.isfile(full := os.path.join(self.landing_dir, f))
            and full not in seen
        )

    def backlog_bytes(self) -> int:
        """Bytes in landing files the checkpoint has NOT yet committed —
        the in-flight work the admission budget bounds. This is the
        WALKING form (O(backlog) stats); the admission hot path uses
        :meth:`_cached_backlog` and reaches here only to resync."""
        total = 0
        for full in self.pending_files():
            try:
                total += os.path.getsize(full)
            except OSError:
                pass  # raced a cleanup; a vanished file has no backlog
        return total

    def _resync_backlog(self) -> int:
        """Recount from the filesystem and reset the cached counter."""
        total = self.backlog_bytes()
        with self._backlog_lock:
            self._backlog_bytes = total
            self._backlog_synced_at = time.monotonic()
        return total

    def _cached_backlog(self) -> int:
        """The O(1) admission read: the in-process counter, resynced from
        the directory at most every ``RESYNC_INTERVAL_S`` (which is also
        how drain by the streaming query and other processes' produces
        become visible)."""
        with self._backlog_lock:
            fresh = (
                self._backlog_bytes is not None
                and time.monotonic() - self._backlog_synced_at < self.RESYNC_INTERVAL_S
            )
            if fresh:
                return self._backlog_bytes
        return self._resync_backlog()

    def admission_status(self) -> dict:
        """The T10 surface ``health()`` reports: current backlog vs
        budget, and whether a produce() would currently be admitted
        (``status`` mirrors the reference's HTTP codes: 200 accepting /
        503 over budget, handlers.rs:64-232). A would-be 503 is always
        confirmed against the filesystem first — monitoring must never
        report not-accepting off a stale counter after the stream drained."""
        backlog = self._cached_backlog()
        if self.byte_budget is not None and backlog >= self.byte_budget:
            backlog = self._resync_backlog()
        accepting = self.byte_budget is None or backlog < self.byte_budget
        return {
            "backlog_bytes": backlog,
            "budget_bytes": self.byte_budget,
            "accepting": accepting,
            "status": 200 if accepting else 503,
        }

    def produce(self, name: str, events: list[dict]) -> str:
        """Admission-controlled producer write: refuse (AdmissionRejected,
        the 503) when the un-ingested backlog is at/over budget;
        otherwise land the batch atomically (tmp + rename — a crashed
        producer never leaves a half file for the stream to read).
        Returns the landed path.

        The under-budget hot path does NO directory walk: admission reads
        the cached counter and the landed bytes are added to it, so a
        thousand-file backlog costs each write one integer compare, not a
        thousand stats (the reference's atomic in-flight counters,
        handlers.rs:64-232). Refusal is never issued from a stale counter:
        a would-be 503 recounts from the filesystem first, so a drained
        zone is admitted again immediately, not an interval later."""
        body = ("\n".join(json.dumps(e) for e in events) + "\n").encode()
        if self.byte_budget is not None:
            # semaphore semantics (a writer may take the last permit, so
            # the zone is bounded by budget + one batch per writer):
            # admit while the backlog is under budget, refuse at/over
            backlog = self._cached_backlog()
            if backlog >= self.byte_budget:
                backlog = self._resync_backlog()
            if backlog >= self.byte_budget:
                raise AdmissionRejected(
                    f"landing backlog {backlog} B at/over budget "
                    f"{self.byte_budget} B — retry after the stream "
                    "drains (503)"
                )
        os.makedirs(self.landing_dir, exist_ok=True)
        final = os.path.join(self.landing_dir, f"{name}.json")
        tmp = os.path.join(self.landing_dir, f".{name}.json.tmp")
        with open(tmp, "wb") as fh:
            fh.write(body)
        self.backend.swing(tmp, final)
        landed_at = time.monotonic()
        with self._backlog_lock:
            # count our file only if no resync walked the directory since
            # it landed — a concurrent resync that finished after our
            # os.replace already saw the file, and adding it again would
            # overstate the backlog, putting every later produce on the
            # O(backlog) refusal-confirmation path (the inverse race —
            # a walk that started before our replace but finished after —
            # skips the add and undercounts by one batch for at most one
            # resync interval, inside the documented budget softness)
            if self._backlog_bytes is not None and self._backlog_synced_at < landed_at:
                self._backlog_bytes += len(body)
        return final


class WriteCombiner:
    """S4 write combiner, the real thing (combiner.rs:98-225): single
    writes queue up and flush as ONE landing file when the batch reaches
    ``max_events`` or ``max_wait_ms`` elapses, and every submitter is
    acked only after its batch has durably landed (the reference's
    per-event oneshot ack after the RocksDB WriteBatch). Turns
    one-file-per-request into one file per few milliseconds — the
    difference between ~500 and several thousand HTTP acks/s here, and
    between 10⁶ landing files/hour and a few hundred at a real edge.

    ``ingest`` is anything with a ``produce(name, events)`` — the
    Spark-attached :class:`StreamingIngest` or a bare
    :class:`LandingZone` in an edge worker process.

    A failed flush (e.g. AdmissionRejected when the landing zone is over
    budget) fails EVERY submitter in that batch — the whole batch is one
    atomic landing file, so there is no partial-accept state to report.
    """

    class _Batch:
        __slots__ = ("events", "done", "err")

        def __init__(self):
            self.events: list[dict] = []
            self.done = threading.Event()
            self.err: Exception | None = None

    def __init__(
        self,
        ingest,
        max_events: int = 512,
        max_wait_ms: float = 4.0,
    ):
        self.ingest = ingest
        self.max_events = max_events
        self.max_wait = max_wait_ms / 1000.0
        self._cv = threading.Condition()
        self._batch = self._Batch()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, event: dict) -> None:
        """Enqueue one event; returns once its batch has landed (or
        raises the batch's failure)."""
        with self._cv:
            if self._closed:
                raise RuntimeError("combiner is closed")
            batch = self._batch
            batch.events.append(event)
            self._cv.notify_all()
        batch.done.wait()
        if batch.err is not None:
            raise batch.err

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._batch.events and not self._closed:
                    self._cv.wait()
                if self._closed and not self._batch.events:
                    return
                # linger for up to max_wait to fill the batch
                deadline = time.monotonic() + self.max_wait
                while len(self._batch.events) < self.max_events:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._closed:
                        break
                    self._cv.wait(timeout=remaining)
                batch, self._batch = self._batch, self._Batch()
            try:
                self.ingest.produce(f"combined-{uuid.uuid4().hex}", batch.events)
            except Exception as exc:  # the whole batch shares one fate
                batch.err = exc
            batch.done.set()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=10)
