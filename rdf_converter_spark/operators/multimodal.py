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
    """binary media -> fixed-width feature vectors via Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, digests = [], [], []
            for blob in pdf["media"]:
                data = bytes(blob) if blob is not None else b""
                if use_codec:
                    decode_image(data)  # NotImplementedError by design
                nbytes.append(len(data))
                digests.append(hashlib.md5(data).hexdigest())
                feats.append(_fake_features(data))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": nbytes,
                    "digest": digests,
                    "feat": feats,
                }
            )

    return media.select("media_id", "media").mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in
    for an encoded image payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )
