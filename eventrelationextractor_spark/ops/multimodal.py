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


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("payload", BinaryType(), False),
])


def decode_video_frame(payload: bytes, idx: int):
    raise NotImplementedError(
        "video decoding requires ffmpeg, not shipped in this environment; "
        "use sample_frames(fake=True) for plumbing tests")


def resize_kernel(payload: bytes, width: int, height: int):
    raise NotImplementedError(
        "image resizing requires an image codec (PIL/libvips), not shipped "
        "in this environment; use resize_images(fake=True) for plumbing "
        "tests")


def resize_images(media: DataFrame, width: int = 224, height: int = 224,
                  fake: bool = True) -> DataFrame:
    """media -> media with image payloads resized to (width, height).

    Same schema in and out (so resize stages compose/chain); non-image
    rows pass through untouched. The fake kernel emits a deterministic
    md5-tagged payload so tests can assert the transform ran exactly once
    per image row."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for kind, payload, w, h in zip(pdf["kind"], pdf["payload"],
                                           pdf["width"], pdf["height"]):
                b = bytes(payload)
                if kind != "image":
                    payloads.append(b)
                    ws.append(w)
                    hs.append(h)
                    continue
                if fake:
                    tag = hashlib.md5(b).digest()
                    payloads.append(b"RSZ" + tag
                                    + width.to_bytes(2, "big")
                                    + height.to_bytes(2, "big"))
                else:
                    payloads.append(resize_kernel(b, width, height))
                ws.append(width)
                hs.append(height)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "payload": payloads,
                                "width": ws, "height": hs})

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame (1-to-many batch shape:
    the output frame count is data-dependent, which is exactly what
    mapInPandas supports and fixed-arity UDFs don't). Non-video rows are
    dropped; frame payloads are deterministic functions of
    (payload, frame_idx) in fake mode."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                b = bytes(payload)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    if fake:
                        payloads.append(
                            b"FRM" + hashlib.md5(b + bytes([i])).digest())
                    else:
                        payloads.append(decode_video_frame(b, i))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "payload": payloads})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


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
