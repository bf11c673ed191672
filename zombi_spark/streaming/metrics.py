"""Latency histograms for the HTTP plane — the reference's streaming
metrics primitive (metrics/histogram.rs:1-220) re-expressed: fixed
buckets sized for storage-operation latencies, CUMULATIVE bucket counts
(each bucket includes every smaller observation, the form Prometheus's
``histogram_quantile()`` consumes), plus running sum and count.

Spark-free on purpose: observations happen on the edge's request
threads (and in worker processes), never inside a Spark job — the
scrape path reads a snapshot under the same lock. The reference uses
relaxed atomics; a lock around three integer updates is the Python
equivalent at these request rates.
"""

from __future__ import annotations

import threading

# Fixed bucket boundaries in MICROSECONDS — the reference's exact set
# (metrics/histogram.rs:11-24: 10μs … 50ms, tuned for storage ops).
HISTOGRAM_BUCKETS_US: tuple[int, ...] = (
    10, 25, 50, 100, 250, 500, 1_000, 2_500, 5_000, 10_000, 25_000, 50_000,
)


#: shared-array layout: [sum, count, bucket_0 … bucket_11]
SHM_SLOTS = 2 + len(HISTOGRAM_BUCKETS_US)


class LatencyHistogram:
    """Thread-safe fixed-bucket latency histogram.

    ``observe(value_us)`` increments every bucket whose boundary is
    ≥ the value (cumulative form, histogram.rs:80-87); values past the
    last boundary land only in the implicit ``+Inf`` bucket (= count).

    ``backing`` accepts a ``multiprocessing.Array('Q', SHM_SLOTS)``:
    with it, observations from EVERY process of the edge's write plane
    accumulate into one shared histogram (the reference's process-wide
    atomics) — without it, counts are process-local.
    """

    __slots__ = ("_backing", "_lock", "_sum", "_count", "_buckets")

    def __init__(self, backing=None) -> None:
        self._backing = backing
        if backing is None:
            self._lock = threading.Lock()
            self._sum = 0
            self._count = 0
            self._buckets = [0] * len(HISTOGRAM_BUCKETS_US)

    def observe(self, value_us: int) -> None:
        v = int(value_us)
        if self._backing is not None:
            with self._backing.get_lock():
                self._backing[0] += v
                self._backing[1] += 1
                for i, boundary in enumerate(HISTOGRAM_BUCKETS_US):
                    if v <= boundary:
                        self._backing[2 + i] += 1
            return
        with self._lock:
            self._sum += v
            self._count += 1
            for i, boundary in enumerate(HISTOGRAM_BUCKETS_US):
                if v <= boundary:
                    self._buckets[i] += 1

    def snapshot(self) -> tuple[int, int, list[int]]:
        """(sum, count, cumulative bucket counts)."""
        if self._backing is not None:
            with self._backing.get_lock():
                vals = list(self._backing)
            return vals[0], vals[1], vals[2:]
        with self._lock:
            return self._sum, self._count, list(self._buckets)

    def percentile(self, p: float) -> int | None:
        """Approximate percentile from the bucket boundaries (the upper
        boundary of the first bucket covering p·count observations;
        None when empty, the last boundary when past it — the same
        answer ``histogram_quantile()`` would interpolate toward)."""
        _sum, count, buckets = self.snapshot()
        if count == 0:
            return None
        target = p * count
        for i, boundary in enumerate(HISTOGRAM_BUCKETS_US):
            if buckets[i] >= target:
                return boundary
        return HISTOGRAM_BUCKETS_US[-1]

    def format_prometheus(self, name: str, help_: str) -> str:
        """Prometheus histogram exposition (histogram.rs:117-146):
        ``_bucket{le=...}`` lines in cumulative form, ``+Inf``, ``_sum``,
        ``_count``."""
        total, count, buckets = self.snapshot()
        lines = [f"# HELP {name} {help_}", f"# TYPE {name} histogram"]
        for i, boundary in enumerate(HISTOGRAM_BUCKETS_US):
            lines.append(f'{name}_bucket{{le="{boundary}"}} {buckets[i]}')
        lines.append(f'{name}_bucket{{le="+Inf"}} {count}')
        lines.append(f"{name}_sum {total}")
        lines.append(f"{name}_count {count}")
        return "\n".join(lines) + "\n"
