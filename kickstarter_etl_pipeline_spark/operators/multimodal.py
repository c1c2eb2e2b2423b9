"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so payload bytes never round-trip row-at-a-time through Python.

The actual media decoding (PIL/ffmpeg/etc.) is NOT available in this
environment — :func:`decode_image` is a clearly-marked STUB raising
``NotImplementedError``; :func:`extract_features` uses a deterministic
byte-level fake so the Spark-side plumbing (schema, batching, partition
behavior) is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/libjpeg, absent here.

    At deploy time this becomes ``PIL.Image.open(io.BytesIO(payload))``
    inside the same mapInPandas batch loop.
    """
    raise NotImplementedError("image decode requires PIL; not available in this environment")


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a media payload so the binary
    pipeline is exercisable against the shipped fixtures."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling: explode each payload into up to ``max_frames``
    evenly-spaced chunks — the video/audio frame-extraction shape
    (1 input row → N output rows through a single mapInPandas pass).

    The chunker is the deterministic stand-in for a real ffmpeg
    keyframe/stride sampler (no media libs in this environment); the
    production swap happens inside the same batch loop with identical
    schema and fan-out behavior. Fan-out is bounded (``max_frames``) so
    output size stays a constant factor of input — the property that
    keeps the operator safe at 100 TB.
    """

    def _batches(batches):
        for pdf in batches:
            out_ids, out_idx, out_payload, out_md5 = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n_frames):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_ids.append(media_id)
                    out_idx.append(i)
                    out_payload.append(chunk)
                    out_md5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": pd.Series(out_payload, dtype=object),
                    "frame_md5": pd.Series(out_md5, dtype=object),
                }
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The deterministic fake (byte length + md5) stands in for the decode +
    model-forward step; batch shape and schema are the real contract.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
