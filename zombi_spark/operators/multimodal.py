"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media exactly like zombi treats payloads — opaque bytes
with schema-on-read feature extraction (SPEC.md:768 "payload is opaque
bytes"). The Spark-side plumbing is real and tested: typed struct schema,
Arrow-batched ``mapInPandas`` over partition-sized batches, deterministic
partitioning by content hash. The codec step itself is stubbed (this
container ships no image/audio libraries): ``decode_stub`` derives
deterministic fake dimensions from the content hash and is clearly marked;
swapping in PIL/libav changes only the inside of the pandas function —
schema, batching, and shuffle shape stay as tested.

Scale notes: media bytes never pass through a Python row loop — they move
as Arrow buffers into pandas batches (mapInPandas). Feature extraction is
embarrassingly parallel; the only shuffle is the optional content-hash
repartition for dedup co-location.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zombi_spark.shipping import ensure_package_on_workers

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def decode_stub(content: bytes, media_type: str) -> dict:
    """STUB codec: deterministic fake decode derived from the content hash.

    Real deployment replaces this body with PIL / soundfile / pyav decode.
    Raises for unknown media types (the real decoder would too). The
    returned ``sha256`` lets callers reuse the digest — hashing is the
    dominant cost of a stub pass, and re-hashing per caller would double
    it over a 100 TB corpus.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    sha = hashlib.sha256(content)
    h = sha.digest()
    out = {"sha256": sha.hexdigest()}
    if media_type == "image":
        return {**out, "width": 64 + h[0] % 192, "height": 64 + h[1] % 192, "duration_ms": None}
    return {**out, "width": None, "height": None, "duration_ms": 1000 + int.from_bytes(h[2:4], "big")}


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each pandas batch holds the binary buffers of one Arrow
    batch; the loop below is per-batch vectorizable work (hashing +
    decode), not a per-row Spark boundary.
    """
    ensure_package_on_workers(media.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, content, mtype in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                raw = bytes(content)
                d = decode_stub(raw, mtype)
                feats.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": len(raw),
                        "content_sha": d["sha256"],  # hashed once, in decode
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                    }
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling: one output row per sampled frame of each video —
    the UDTF-style row expansion of the multimodal spec, as Arrow-batched
    ``mapInPandas`` (a real decoder yields frame buffers here; the stub
    yields per-frame content hashes derived from (content, frame_idx), so
    even the expansion path is oracle-checkable).

    Frames land at 0, every_ms, 2·every_ms, … ≤ duration (count =
    duration // every_ms + 1, duration from the stub codec). Non-video
    rows produce no frames. Expansion happens inside the pandas batch —
    no shuffle, no Python row boundary; output size is rows × frames,
    which a real pipeline bounds with every_ms.
    """
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    ensure_package_on_workers(media.sparkSession)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_sha": []}
            for mid, content, mtype in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                if mtype != "video":
                    continue
                raw = bytes(content)
                duration = decode_stub(raw, mtype)["duration_ms"]
                # Hash the blob once, fork per frame: copy() + update(":i")
                # yields sha256(raw || ":" || i) in O(bytes + frames) per
                # video instead of O(frames × bytes) — same digests.
                base = hashlib.sha256(raw + b":")
                for i in range(duration // every_ms + 1):
                    h = base.copy()
                    h.update(str(i).encode())
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_sha"].append(h.hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(_frames, FRAME_SCHEMA)


def resize_stub(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """STUB resize: integer aspect-preserving scale-to-fit (the arithmetic
    a real thumbnailer applies; only the pixel work is absent). Exact
    integer math so results are engine-portable."""
    longest = max(width, height)
    if longest <= max_dim:
        return width, height
    return (width * max_dim) // longest, (height * max_dim) // longest


def resize_media(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize pass over image rows: original + resized dimensions per
    image (Arrow-batched; a real implementation would also emit the
    resized bytes — the plumbing is identical)."""
    ensure_package_on_workers(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized_width", T.IntegerType(), False),
            T.StructField("resized_height", T.IntegerType(), False),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, mtype in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                if mtype != "image":
                    continue
                d = decode_stub(bytes(content), mtype)
                rw, rh = resize_stub(d["width"], d["height"], max_dim)
                rows.append(
                    {
                        "media_id": mid,
                        "width": d["width"],
                        "height": d["height"],
                        "resized_width": rw,
                        "resized_height": rh,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(_resize, schema)


def media_exact_dedup(features: DataFrame) -> DataFrame:
    """Binary-content exact dedup on the extracted sha (groupBy, min id)."""
    return features.groupBy("content_sha").agg(
        F.min("media_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


def media_dedup_annotate(features: DataFrame) -> DataFrame:
    """Per-row dedup annotation (keep_id, n_copies) via a window over
    content_sha — ONE shuffle of the feature rows, versus the
    aggregate-then-join-back shape which recomputes the (expensive)
    extraction stage for both join sides. Same output contract as
    ``features.join(media_exact_dedup(features), "content_sha")``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_sha")
    return features.withColumn("keep_id", F.min("media_id").over(w)).withColumn(
        "n_copies", F.count(F.lit(1)).over(w)
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/bench: treat document text bytes as media blobs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("source"),
    )
