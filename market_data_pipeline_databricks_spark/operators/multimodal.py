"""Multimodal column plumbing: opaque binary media + typed metadata.

Design for 100 TB of mixed media:
- media travels as an opaque ``binary`` column plus a typed metadata
  struct (mime, width/height or duration, source uri) — never decoded
  into the shuffle path;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators so bytes cross the JVM↔Python boundary once
  per batch, not per row;
- partitioning: media tables repartition by a content-hash bucket so
  batch sizes stay uniform regardless of per-file size skew.

The actual codec calls (PIL/ffmpeg/torchaudio) are NOT available in
this environment, so the decode kernel is a clearly-marked stub: it
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic hash-derived feature vector with the exact
schema/batch shape a real decoder would emit — the Spark-side plumbing
(schemas, batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media content —
    exercises the full binary-column path with the data on hand."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 16 floats derived from
    the sha256 of the bytes, scaled to [0, 1)."""
    h = hashlib.sha256(content).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65536.0


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    With ``fake=False`` this raises NotImplementedError from the kernel
    (no codec libraries in this container); ``fake=True`` runs the
    deterministic stand-in through the identical plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment; pass fake=True for "
                    "the deterministic stand-in"
                )
            feats = [
                _fake_decode(bytes(c)) if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "n_bytes": [
                        m["n_bytes"] if m is not None else None for m in pdf["meta"]
                    ],
                    "feature": feats,
                }
            )

    # Content-hash bucketing: uniform batch sizes under media-size skew.
    bucketed = media.repartition(F.pmod(F.xxhash64("media_id"), F.lit(32)))
    return bucketed.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for video frame-sampling: emits one row per sampled
    frame index based on metadata only (no decode) — the downstream
    decode then touches just the sampled frames. Deterministic."""
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / 1024).cast("int"), F.lit(1)
    )  # stand-in for container-parsed frame count
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def read_media_dir(
    spark, path: str, glob: str = "*", mime: str = "application/octet-stream"
) -> DataFrame:
    """Ingest a directory of media files via Spark's ``binaryFile``
    source into MEDIA_SCHEMA shape.

    Scale: binaryFile parallelizes across files; pair with
    ``spark.sql.files.maxPartitionBytes`` so many small files coalesce
    per task. media_id = stable hash of the path (collision-checked
    downstream by dedup ops); real deployments carry the path through.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("path").alias("source_uri"),
        ).alias("meta"),
    )
