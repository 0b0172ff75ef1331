"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The decode kernels are STUBS (the container ships no image/audio codecs):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic md5-derived feature vector stands in for the decoder
output. The Spark-side plumbing - schema, batch shape, partition-parallel
UDF signature - is real and tested; swapping in PIL/ffmpeg later only
replaces the kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


def _fake_features(payload: bytes, dim: int = 8) -> list:
    """Deterministic stand-in for a decoder+encoder: md5 rolling bytes
    scaled to [0, 1)."""
    h = hashlib.md5(payload).digest()
    return [h[i % len(h)] / 256.0 for i in range(dim)]


def decode_image(payload: bytes):
    raise NotImplementedError(
        "image decoding requires an image codec (PIL/libvips), not shipped "
        "in this environment; use extract_features(fake=True) for plumbing "
        "tests")


def extract_features(media: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """media(media_id, kind, payload, ...) -> per-item feature vectors.

    Arrow-batched mapInPandas: one partition-parallel pass, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                nbytes.append(len(b))
                if fake:
                    feats.append(_fake_features(b, dim))
                else:
                    feats.append(decode_image(b))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "n_bytes": nbytes,
                                "feature": feats})

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
