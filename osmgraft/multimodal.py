"""Multimodal column plumbing: opaque binary payloads with typed
metadata, Arrow-batched feature extraction, and stubbed decoders.

Image/audio/video payloads are opaque ``binary`` columns.  The
Spark-side plumbing — schema, partition-friendly batch shape,
``mapInPandas`` signatures — is real and tested; the actual codec step
is stubbed (no image/audio libraries exist in this container): decode
raises ``NotImplementedError`` unless ``fake=True``, which produces a
deterministic digest-derived feature vector so the pipeline shape can
be exercised end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap document text bytes as opaque media payloads (deterministic
    stand-in for crawled image/audio bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_payload(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """STUB: real decoders (PIL/ffmpeg/torchaudio) are not available in
    this environment.  ``fake=True`` yields a deterministic 8-dim
    feature from the payload digest — same batch shape as a real
    decoder, so the distributed plumbing is fully exercised."""
    if not fake:
        raise NotImplementedError(
            f"no {kind} codec in this environment; pass fake=True for the "
            "deterministic digest feature"
        )
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1).astype(
        np.float32
    ) / 255.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads
    (mapInPandas — one batch per Arrow chunk, no per-row Python
    overhead beyond the codec call itself)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(bytes(p), k, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
