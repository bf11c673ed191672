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

# Flush/drain operations (availableNow micro-batch commits) run
# seconds-to-minutes; on the storage-op set every observation would land
# only in +Inf and the bucket series would carry no distribution at all.
FLUSH_BUCKETS_US: tuple[int, ...] = HISTOGRAM_BUCKETS_US + (
    100_000, 250_000, 500_000, 1_000_000, 2_500_000, 5_000_000,
    10_000_000, 30_000_000, 60_000_000, 300_000_000,
)


def shm_slots(buckets: tuple[int, ...] = HISTOGRAM_BUCKETS_US) -> int:
    """Shared-array layout: [sum, count, bucket_0 … bucket_{n-1}]."""
    return 2 + len(buckets)


#: default layout size (storage-op bucket set)
SHM_SLOTS = shm_slots()


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

    __slots__ = ("_backing", "_lock", "_sum", "_count", "_buckets", "boundaries")

    def __init__(self, backing=None, buckets: tuple[int, ...] = HISTOGRAM_BUCKETS_US) -> None:
        self._backing = backing
        self.boundaries = tuple(buckets)
        if backing is not None and len(backing) != shm_slots(self.boundaries):
            raise ValueError(
                f"backing has {len(backing)} slots, bucket set needs "
                f"{shm_slots(self.boundaries)}"
            )
        if backing is None:
            self._lock = threading.Lock()
            self._sum = 0
            self._count = 0
            self._buckets = [0] * len(self.boundaries)

    def observe(self, value_us: int) -> None:
        v = int(value_us)
        if self._backing is not None:
            with self._backing.get_lock():
                self._backing[0] += v
                self._backing[1] += 1
                for i, boundary in enumerate(self.boundaries):
                    if v <= boundary:
                        self._backing[2 + i] += 1
            return
        with self._lock:
            self._sum += v
            self._count += 1
            for i, boundary in enumerate(self.boundaries):
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

    def percentile(self, p: float) -> float | None:
        """Approximate percentile from the bucket boundaries (the upper
        boundary of the first bucket covering p·count observations;
        None when empty). When the target falls PAST the last boundary
        the honest answer is ``+Inf`` — returning the last boundary
        would falsely report e.g. 50ms for a minutes-long drain."""
        _sum, count, buckets = self.snapshot()
        if count == 0:
            return None
        target = p * count
        for i, boundary in enumerate(self.boundaries):
            if buckets[i] >= target:
                return boundary
        return float("inf")

    def format_prometheus(self, name: str, help_: str) -> str:
        """Prometheus histogram exposition (histogram.rs:117-146):
        ``_bucket{le=...}`` lines in cumulative form, ``+Inf``, ``_sum``,
        ``_count``."""
        total, count, buckets = self.snapshot()
        lines = [f"# HELP {name} {help_}", f"# TYPE {name} histogram"]
        for i, boundary in enumerate(self.boundaries):
            lines.append(f'{name}_bucket{{le="{boundary}"}} {buckets[i]}')
        lines.append(f'{name}_bucket{{le="+Inf"}} {count}')
        lines.append(f"{name}_sum {total}")
        lines.append(f"{name}_count {count}")
        return "\n".join(lines) + "\n"
