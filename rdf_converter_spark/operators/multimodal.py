# -*- coding: utf-8 -*-
"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata. The Spark-side plumbing (schema, batching, UDF
signatures, partition behaviour) is real and tested; the codec step is
STUBBED (no image/audio libs in this container) behind
``NotImplementedError`` with a deterministic fake used by tests.

Pattern: ``mapInPandas`` over (id, media binary, media_type) — one
Arrow batch in, one batch of (id, feature columns) out; heavy bytes
never leave the JVM->Arrow path more than once, and the decode UDF is
the template where a real PIL/ffmpeg call would slot in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(data: bytes):  # pragma: no cover - real codec absent
    """Real decoder slot (PIL.Image.open). Not available here."""
    raise NotImplementedError("image codecs not installed in this container")


def _fake_features(data: bytes, dims: int = 8):
    """Deterministic stand-in for a visual/audio embedding: bytes of
    the sha256 digest scaled to [0, 1). Keeps the full Spark plumbing
    (schema, Arrow batch shape) testable without codecs."""
    h = hashlib.sha256(data).digest()
    return [h[i] / 256.0 for i in range(dims)]


def media_features(media: DataFrame, use_codec: bool = False) -> DataFrame:
    """binary media -> (n_bytes, digest, feat).

    ``n_bytes``/``digest`` are plain JVM expressions (``F.length``/
    ``F.md5`` on the binary column — no Python in that path, r01 spent
    3 s of headline running them in a per-blob loop). Only the feature
    vector — the slot where a real codec/embedding call lives — is an
    Arrow-batched ``pandas_udf``; because it is a separate projected
    column (not a mapInPandas that swallows the whole row), Catalyst
    PRUNES it away when a downstream query never selects ``feat``.
    """
    codec = use_codec

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def feat_udf(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            data = bytes(blob) if blob is not None else b""
            if codec:
                decode_image(data)  # NotImplementedError by design
            out.append(_fake_features(data))
        return pd.Series(out)

    blob = F.coalesce(F.col("media"), F.lit(b""))
    return media.select(
        "media_id",
        F.length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest"),
        feat_udf(F.col("media")).alias("feat"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  use_codec: bool = False) -> DataFrame:
    """Resize plumbing: binary in -> binary out per Arrow batch. The
    codec slot raises (PIL absent); the deterministic fake truncates/
    tiles the payload to width*height bytes so batch shapes, schema and
    partitioning are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            out = []
            for blob in pdf["media"]:
                data = bytes(blob) if blob is not None else b""
                if use_codec:
                    decode_image(data)
                reps = (size // max(len(data), 1)) + 1
                out.append((data * reps)[:size])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                    "resized": out,
                }
            )

    return media.select("media_id", "media").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  use_codec: bool = False) -> DataFrame:
    """Frame sampling plumbing: one binary video -> n frame rows
    (1:N Arrow batch fan-out, the shape a real ffmpeg probe would
    have). Fake frames are deterministic equal-length byte slices."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                if use_codec:
                    decode_image(data)
                step = max(len(data) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    nos.append(k)
                    frames.append(data[k * step:(k + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames}
            )

    return media.select("media_id", "media").mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in
    for an encoded image payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )
