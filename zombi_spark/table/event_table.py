"""EventTable — the cold tier: partitioned, sorted Parquet with a snapshot log.

The reference's cold tier is Iceberg on S3 (iceberg_storage.rs). This
container ships no Iceberg Spark runtime jar, so the table layer writes the
same *physical layout* directly — hive-partitioned
``event_date=YYYY-MM-DD/event_hour=H`` Zstd Parquet, rows sorted by
``(timestamp_ms, sequence)`` within each file (SPEC.md:320-333,
parquet.rs:347-364) — plus a minimal JSON snapshot log giving atomic,
versioned commits with per-partition watermark summaries
(``zombi.watermark.{p}`` — iceberg_storage.rs:285-300). Swapping the sink
for Iceberg is a writer-format change, not a redesign: every reader goes
through :meth:`read`, every writer through :meth:`append`.

Scale notes:
  - append() repartitions by the storage partition key before writing, so
    each (event_date, event_hour) lands in few large files instead of
    shuffle_partitions small ones — the small-file problem compaction (M1)
    otherwise has to fix.
  - reads rely on partition pruning (event_date/event_hour dirs) +
    parquet min/max row-group stats on (timestamp_ms, sequence) — the same
    two-level skip as Iceberg partition pruning + DataFile bounds
    (SPEC.md:311-333).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zombi_spark.ingest.batch import EVENT_SCHEMA, validate_table_name

_META_DIR = "_zombi_meta"
_DATA_DIR = "data"


class EventTable:
    """A zombi event table rooted at ``{root}/{name}``."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.name = validate_table_name(name)
        self.path = os.path.join(root, name)
        self.data_path = os.path.join(self.path, _DATA_DIR)
        self.meta_path = os.path.join(self.path, _META_DIR)

    # ---------------------------------------------------------------- meta
    def _snapshot_files(self) -> list[str]:
        if not os.path.isdir(self.meta_path):
            return []
        return sorted(
            f for f in os.listdir(self.meta_path) if f.startswith("snap-") and f.endswith(".json")
        )

    def snapshots(self) -> list[dict]:
        """Snapshot log, oldest first (analogue of Iceberg ``t.snapshots``)."""
        out = []
        for f in self._snapshot_files():
            with open(os.path.join(self.meta_path, f)) as fh:
                out.append(json.load(fh))
        return out

    def _commit_snapshot(self, summary: dict) -> dict:
        os.makedirs(self.meta_path, exist_ok=True)
        version = len(self._snapshot_files())
        snap = {
            "version": version,
            "snapshot_id": uuid.uuid4().hex,
            "committed_at_ms": int(time.time() * 1000),
            **summary,
        }
        tmp = os.path.join(self.meta_path, f".snap-{version:08d}.json.tmp")
        final = os.path.join(self.meta_path, f"snap-{version:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(snap, fh, indent=1)
        os.rename(tmp, final)  # atomic commit point
        return snap

    # --------------------------------------------------------------- write
    def append(self, events: DataFrame) -> dict:
        """Append canonical event rows; returns the committed snapshot.

        Physical layout = zombi's flusher output: one shuffle on the storage
        partition key (A7/T4 hour grouping, flusher/mod.rs:398-437), sorted
        runs within files (O1), Zstd Parquet (X12), hive dirs (X1).
        """
        cols = [f.name for f in EVENT_SCHEMA.fields]
        # cache: the batch is consumed twice (write + watermark aggregate);
        # without it the whole prepare_events lineage (two window shuffles)
        # would recompute for the tiny watermark frame
        events = events.select(*cols).persist()
        # explicit partition count: with bare repartition(cols), AQE
        # coalesces a small batch's shuffle to ~1 partition and ONE task
        # then writes every hour directory serially (measured 11s for 744
        # dirs at sf0.1; ~32 tasks cut it to ~2s). At cluster scale the
        # batch is big enough that the count is the task width anyway.
        par = self.spark.sparkContext.defaultParallelism
        (
            events.repartition(par, "event_date", "event_hour")
            .sortWithinPartitions("timestamp_ms", "sequence")
            .write.mode("append")
            .partitionBy("event_date", "event_hour")
            # X5 analogue: parquet bloom filter on idempotency_key makes the
            # dedup-history anti-join probe skip row groups (the reference
            # keeps an in-memory bloom per partition, rocksdb.rs:39-88).
            # max.bytes bounds the per-file overhead (default is 1 MiB).
            .option("parquet.bloom.filter.enabled#idempotency_key", "true")
            .option("parquet.bloom.filter.max.bytes", str(64 * 1024))
            .parquet(self.data_path)
        )
        # watermarks: aggregate the BATCH (tiny frame: one row per producer
        # partition) and merge with the prior snapshot — never a re-scan of
        # the whole table (iceberg_storage.rs:285-300 does the same:
        # summary carries forward).
        snaps = self.snapshots()
        wm: dict[str, int] = dict(snaps[-1]["watermarks"]) if snaps and "watermarks" in snaps[-1] else {}
        for r in (
            events.groupBy("topic", "partition").agg(F.max("sequence").alias("hwm")).collect()
        ):
            key = f"zombi.watermark.{r['topic']}/{r['partition']}"
            wm[key] = max(wm.get(key, 0), r["hwm"])
        events.unpersist()
        return self._commit_snapshot(
            {
                "operation": "append",
                "watermarks": wm,
                # manifest-list analogue (iceberg_storage.rs:1087-1110):
                # every snapshot records the full active file set, enabling
                # snapshot reads (time travel) and compaction swaps
                "files": [f["file_path"] for f in self.files()],
            }
        )

    # ---------------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        """Scan the table (partition-pruned + stats-skipped by Catalyst).

        ``version`` reads the table AS OF that snapshot (time travel): the
        scan is restricted to the snapshot's recorded file set, partition
        columns still derive from the directory layout via basePath.
        Snapshots older than file-list tracking raise.
        """
        snaps = self.snapshots()
        if version is None:
            # serve the LATEST SNAPSHOT's file list, not the directory:
            # files written by an in-flight (or crashed) append are
            # invisible until their snapshot commits — the Iceberg
            # atomicity contract (INV-5, SPEC.md:754). Directory scan only
            # for pre-snapshot tables (empty log).
            if snaps and "files" in snaps[-1]:
                files = snaps[-1]["files"]
                if not files:
                    return self.spark.createDataFrame([], EVENT_SCHEMA)
                return (
                    self.spark.read.schema(EVENT_SCHEMA)
                    .option("basePath", self.data_path)
                    .parquet(*files)
                )
            return (
                self.spark.read.schema(EVENT_SCHEMA)
                .option("basePath", self.data_path)
                .parquet(self.data_path)
            )
        if not 0 <= version < len(snaps):
            raise ValueError(f"no snapshot version {version}; have 0..{len(snaps) - 1}")
        files = snaps[version].get("files")
        if files is None:
            raise ValueError(f"snapshot {version} predates file-list tracking")
        return (
            self.spark.read.schema(EVENT_SCHEMA)
            .option("basePath", self.data_path)
            .parquet(*files)
        )

    def export_json(self, out_dir: str) -> None:
        """S6 legacy JSON segment sink (s3.rs:136-185): dump the committed
        table as JSON-lines segments. Kept for parity; parquet is the
        standard format."""
        self.read().write.mode("overwrite").json(out_dir)

    def create_view(self, view_name: str | None = None) -> str:
        """Register the table as a temp view for spark.sql (S13-lite: the
        catalog surface an external engine would see)."""
        name = view_name or self.name.replace("-", "_")
        self.read().createOrReplaceTempView(name)
        return name

    def high_watermarks(self) -> DataFrame:
        """A2: max committed sequence per (topic, partition)
        (rocksdb.rs:851-853; committed recovery iceberg_storage.rs:1602-1652)."""
        return self.read().groupBy("topic", "partition").agg(F.max("sequence").alias("high_watermark"))

    def low_watermarks(self) -> DataFrame:
        """A3: min surviving sequence per (topic, partition) (rocksdb.rs:855-884)."""
        return self.read().groupBy("topic", "partition").agg(F.min("sequence").alias("low_watermark"))

    def files(self) -> list[dict]:
        """Data-file listing with sizes (analogue of Iceberg ``t.files`` / S11)."""
        out = []
        for dirpath, _dirs, files in os.walk(self.data_path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out.append(
                        {
                            "file_path": p,
                            "partition_dir": os.path.relpath(dirpath, self.data_path),
                            "file_size_bytes": os.path.getsize(p),
                        }
                    )
        return sorted(out, key=lambda d: d["file_path"])

    # --------------------------------------------------------- maintenance
    def remove_orphans(self) -> list[str]:
        """M4: delete leftover temp artifacts from failed rewrites/appends
        (``.compact-*`` dirs, spark staging markers) — the
        ``remove_orphan_files`` analogue (compaction.rs:350-364,
        iceberg_storage.rs:1587-1600). Committed data files are never
        touched: only dot-prefixed temporaries qualify."""
        removed: list[str] = []
        # 1) uncommitted data files: parquet present on disk but absent
        #    from the latest snapshot's file list (a crashed append wrote
        #    them before its commit) — invisible to read(), safe to drop
        snaps = self.snapshots()
        if snaps and "files" in snaps[-1]:
            active = set(snaps[-1]["files"])
            for f in self.files():
                if f["file_path"] not in active:
                    os.remove(f["file_path"])
                    removed.append(f["file_path"])
        # 2) walk the table root: crashed compactions stage under
        #    {path}/.compact-* and interrupted meta commits leave
        #    .snap-*.json.tmp
        for dirpath, dirs, files in os.walk(self.path, topdown=False):
            for d in list(dirs):
                if d.startswith(".compact-") or d == "_temporary":
                    full = os.path.join(dirpath, d)
                    for sub, _ds, fs in os.walk(full, topdown=False):
                        for f in fs:
                            os.remove(os.path.join(sub, f))
                            removed.append(os.path.join(sub, f))
                        os.rmdir(sub)
            for f in files:
                if f.startswith(".") and f.endswith(".tmp"):
                    os.remove(os.path.join(dirpath, f))
                    removed.append(os.path.join(dirpath, f))
        return removed

    def compact(
        self,
        small_file_bytes: int = 64 * 1024 * 1024,
        min_input_files: int = 3,
        target_files_per_partition: int = 1,
    ) -> dict:
        """M1 small-file compaction (compaction.rs:128-396).

        Candidates = storage partitions holding ≥ ``min_input_files`` files
        smaller than ``small_file_bytes``; each is rewritten as
        ``target_files_per_partition`` sorted file(s). Equivalent to
        Iceberg's ``rewrite_data_files`` with min-input-files/target-size.
        Rewrite preserves every row (INV-6) and the (timestamp_ms, sequence)
        sort; commit then swaps files per partition directory.
        """
        by_partition: dict[str, list[dict]] = {}
        for f in self.files():
            if f["file_size_bytes"] < small_file_bytes:
                by_partition.setdefault(f["partition_dir"], []).append(f)
        candidates = {p: fs for p, fs in by_partition.items() if len(fs) >= min_input_files}
        rewritten = 0
        if candidates:
            # ONE Spark job rewrites every candidate partition (a per-
            # partition loop of jobs would serialize at scale): read all
            # inputs with partition columns from the layout, shuffle once
            # on the storage key, write sorted into a staging tree, then
            # swap files per partition directory.
            all_paths = [f["file_path"] for fs in candidates.values() for f in fs]
            df = (
                self.spark.read.schema(EVENT_SCHEMA)
                .option("basePath", self.data_path)
                .parquet(*all_paths)
            )
            staging = os.path.join(self.path, f".compact-{uuid.uuid4().hex}")
            (
                df.repartition(
                    max(len(candidates) * target_files_per_partition, 1),
                    "event_date",
                    "event_hour",
                )
                .sortWithinPartitions("timestamp_ms", "sequence")
                .write.mode("overwrite")
                .partitionBy("event_date", "event_hour")
                .parquet(staging)
            )
            # commit: move rewritten files in, drop the inputs
            for dirpath, _dirs, files in os.walk(staging):
                rel = os.path.relpath(dirpath, staging)
                for nf in files:
                    if nf.endswith(".parquet"):
                        dest_dir = os.path.join(self.data_path, rel)
                        os.makedirs(dest_dir, exist_ok=True)
                        os.rename(
                            os.path.join(dirpath, nf),
                            os.path.join(dest_dir, f"compacted-{uuid.uuid4().hex}.parquet"),
                        )
            for p in all_paths:
                os.remove(p)
            for dirpath, dirs, files in os.walk(staging, topdown=False):
                for f in files:
                    os.remove(os.path.join(dirpath, f))
                os.rmdir(dirpath)
            rewritten = len(all_paths)
        snap = self._commit_snapshot(
            {
                "operation": "compact",
                "partitions": sorted(candidates),
                "files_rewritten": rewritten,
                "files": [f["file_path"] for f in self.files()],
            }
        )
        return snap
