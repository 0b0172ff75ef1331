"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

Decode kernels are REAL for PNG, baseline JPEG and GIF images, animated
GIF "video", and WAV audio (ops.codecs / ops.jpeg / ops.gif -
pure-stdlib+numpy decoders, validated against real-world files and
against Java ImageIO as an independent decoder): ``fake=False``
decodes, featurizes, resizes and frame-samples genuinely. Progressive
JPEG, WebP and true video codecs (H.264 etc.) remain
NotImplementedError - those need codec libraries this sandbox does not
ship; ``fake=True`` (the default, and what the oracled media_features
query uses) substitutes a deterministic md5-derived feature so plumbing
stays testable for every format. The Spark-side shape - schema, batch
framing, partition-parallel UDF signature, 1-to-many frame explode - is
identical in both modes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

from . import codecs, gif, jpeg

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
    """-> (h, w, ch) uint8 for PNG, baseline JPEG and GIF payloads
    (GIF: first frame composited over the logical screen)."""
    if payload[:8] == codecs.PNG_MAGIC:
        return codecs.decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg.decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return gif.decode_gif_frames(payload, max_frames=1)[0]
    raise NotImplementedError(
        "image decoding covers PNG, baseline JPEG and GIF (pure-stdlib, "
        "ops/{codecs,jpeg,gif}.py); WebP/AVIF/progressive-JPEG need codec "
        "libraries not shipped in this environment - use "
        "extract_features(fake=True) for plumbing tests on other formats")


def image_features(arr, dim: int = 8) -> list:
    """Deterministic image descriptor: [h/4096, w/4096, ch/4, mean/255,
    std/255, per-channel means/255...] truncated/zero-padded to dim."""
    import numpy as np
    h, w, ch = arr.shape
    vals = [h / 4096.0, w / 4096.0, ch / 4.0,
            float(arr.mean()) / 255.0, float(arr.std()) / 255.0]
    vals += [float(arr[:, :, c].mean()) / 255.0 for c in range(ch)]
    vals = vals[:dim] + [0.0] * max(0, dim - len(vals))
    return [float(np.float32(v)) for v in vals]


def audio_features(payload: bytes, dim: int = 8) -> list:
    """Deterministic audio descriptor from the decoded PCM: [duration_s/
    3600, rate/96k, channels/8, rms, peak, zero-crossing rate, ...]."""
    import numpy as np
    rate, samples = codecs.decode_wav(payload)
    mono = samples.mean(axis=1) if samples.size else samples.reshape(0)
    n = len(mono)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
        if n > 1 else 0.0
    vals = [n / rate / 3600.0 if rate else 0.0, rate / 96000.0,
            samples.shape[1] / 8.0,
            float(np.sqrt(np.mean(mono ** 2))) if n else 0.0,
            float(np.abs(mono).max()) if n else 0.0, zc]
    vals = vals[:dim] + [0.0] * max(0, dim - len(vals))
    return [float(np.float32(v)) for v in vals]


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("payload", BinaryType(), False),
])


def decode_video_frame(payload: bytes, idx: int):
    """Animated-GIF payloads decode for real: frame ``idx`` composited
    per the disposal rules, returned as a PNG payload (re-decodable, so
    frame stages compose with the image operators). True video
    containers (mp4/webm) raise - inter-frame codecs need libraries the
    sandbox does not ship."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        frames = gif.decode_gif_frames(payload, max_frames=idx + 1)
        return codecs.encode_png(frames[min(idx, len(frames) - 1)])
    raise NotImplementedError(
        "real frame decode covers animated GIF (ops/gif.py); mp4/webm "
        "need ffmpeg, not shipped in this environment - use "
        "sample_frames(fake=True) for plumbing tests")


def resize_kernel(payload: bytes, width: int, height: int):
    """PNG in -> nearest-neighbor-resized PNG out (re-decodable, so
    resize stages compose for real, not just schema-wise)."""
    return codecs.encode_png(
        codecs.resize_nearest(decode_image(payload), width, height))


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
                if fake:
                    for i in range(n_frames):
                        ids.append(mid)
                        idxs.append(i)
                        payloads.append(
                            b"FRM" + hashlib.md5(b + bytes([i])).digest())
                else:
                    # decode once, sample n_frames evenly across the clip
                    frames = gif.decode_gif_frames(b) \
                        if b[:6] in (b"GIF87a", b"GIF89a") else None
                    if frames is None:
                        raise NotImplementedError(
                            "real frame decode covers animated GIF; use "
                            "fake=True for other containers")
                    total = len(frames)
                    picks = sorted({min(i * total // n_frames, total - 1)
                                    for i in range(n_frames)})
                    for i in picks:
                        ids.append(mid)
                        idxs.append(i)
                        payloads.append(codecs.encode_png(frames[i]))
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
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                nbytes.append(len(b))
                if fake:
                    feats.append(_fake_features(b, dim))
                elif kind == "image":
                    feats.append(image_features(decode_image(b), dim))
                elif kind == "audio":
                    feats.append(audio_features(b, dim))
                else:
                    raise NotImplementedError(
                        f"no real decoder for kind={kind}; use fake=True")
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "n_bytes": nbytes,
                                "feature": feats})

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("rate", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("n_frames", LongType(), False),
    StructField("n_silent", LongType(), False),
    StructField("max_silent_run", LongType(), False),
    StructField("peak", LongType(), False),
    StructField("energy_total", LongType(), False),
])


def audio_frame_stats(media: DataFrame, frame_len: int = 160,
                      silence_thresh: int = 512) -> DataFrame:
    """Frame-level audio telemetry from a REAL WAV decode -> one row
    per clip: (media_id, rate, n_samples, n_frames, n_silent,
    max_silent_run, peak, energy_total). Frames are ``frame_len``
    samples (trailing partial frame included with its true length); a
    frame is silent iff its energy < n * silence_thresh^2 — i.e. mean
    square below the threshold squared, stated as a pure-INTEGER
    cross-multiplication so no float division exists anywhere. The
    silence-run statistic is the VAD primitive (speech/music
    segmentation, dead-air trimming) a 100-TB audio curation pass
    keys on.

    Exactness contract: 16-bit PCM decodes to dyadic float64
    (pcm/32768.0, lossless), the kernel reconstructs the integer
    samples and all statistics are int64 sums/maxima — a SQL oracle
    replays them from the staged closed-form pattern bit-for-bit
    (``encode_wav_pcm16`` exists so staging never passes through the
    lossy float rescale). Energy bound: frame_len * 32768^2 ~ 1.7e11,
    clip totals ~1e13 per hour of 8 kHz mono — int64-safe through
    ~10^5 hours per clip.

    Scale shape: pure map-side Arrow-batched mapInPandas over the
    binary column (the decode is the cost; Spark's job is exactly the
    partition-parallel batching), no shuffle at all; downstream aggs
    run on 8-column telemetry rows, not payloads."""
    import numpy as np
    import pandas as pd

    thr2 = int(silence_thresh) * int(silence_thresh)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = codecs.decode_wav(bytes(payload))
                mono = samples[:, 0]
                pcm = np.round(mono * 32768.0).astype(np.int64)
                n = len(pcm)
                n_frames = (n + frame_len - 1) // frame_len
                n_silent = 0
                run_len = 0
                max_run = 0
                peak = 0
                energy_total = 0
                for f in range(n_frames):
                    fr = pcm[f * frame_len:(f + 1) * frame_len]
                    e = int((fr * fr).sum())
                    energy_total += e
                    peak = max(peak, int(np.abs(fr).max()))
                    if e < len(fr) * thr2:
                        n_silent += 1
                        run_len += 1
                        max_run = max(max_run, run_len)
                    else:
                        run_len = 0
                out.append((int(mid), int(rate), n, int(n_frames),
                            n_silent, max_run, peak, energy_total))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             AUDIO_FRAME_SCHEMA.fields])

    return media.mapInPandas(run, AUDIO_FRAME_SCHEMA)


PHASH_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("b0", LongType(), False),
    StructField("b1", LongType(), False),
    StructField("b2", LongType(), False),
    StructField("b3", LongType(), False),
])


def perceptual_hash(media: DataFrame, rows: int = 8,
                    cols: int = 8) -> DataFrame:
    """dHash (difference hash) over REALLY decoded pixels - the
    image-side near-duplicate fingerprint (the standard pHash-family
    scheme: same image re-encoded, re-filtered or lightly edited keeps
    a hamming-close hash, while byte-level dedup sees nothing).

    Deliberately integer-exact so a SQL twin can replay it from a
    closed-form pixel pattern: gray = per-pixel CHANNEL SUM (no /3, no
    luma floats), the ``rows x (cols+1)`` grid is NEAREST-NEIGHBOR
    sampled at (i*h//rows, j*w//(cols+1)) (no interpolation), and bit
    (i,j) = 1 iff gray[i,j] < gray[i,j+1], packed row-major MSB-first
    into four 16-bit bands (b0..b3) - the banding
    ``perceptual_hash_pairs`` joins on.

    Scale shape: pure map-side Arrow-batched mapInPandas over the
    binary column; emits 5 integers per image, no shuffle."""
    import numpy as np
    import pandas as pd

    n_bits = rows * cols
    if n_bits % 4:
        raise ValueError("rows*cols must split into 4 bands")
    per = n_bits // 4

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                gray = arr.sum(axis=2)
                h, w = gray.shape
                ys = (np.arange(rows) * h) // rows
                xs = (np.arange(cols + 1) * w) // (cols + 1)
                s = gray[np.ix_(ys, xs)]
                bits = (s[:, :-1] < s[:, 1:]).astype(np.int64).ravel()
                bands = []
                for b in range(4):
                    v = 0
                    for bit in bits[b * per:(b + 1) * per]:
                        v = v * 2 + int(bit)
                    bands.append(v)
                out.append((int(mid), *bands))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             PHASH_SCHEMA.fields])

    return media.mapInPandas(run, PHASH_SCHEMA)


def perceptual_hash_pairs(media: DataFrame, max_hamming: int = 3,
                          max_bucket_size: int = 100) -> DataFrame:
    """Image near-duplicate pairs (a < b, hamming) with dHash hamming
    distance <= ``max_hamming``: the multimodal member of the dedup
    tier family (MinHash/SimHash/embedding-cosine on text, this on
    pixels).

    Same scale shape as every near-dup tier (Manku WWW'07 banding): a
    64-bit hash within hamming k of another must agree EXACTLY on one
    of k+1 disjoint bands, so with 4 x 16-bit bands the scheme is
    exact for max_hamming <= 3. Candidates = band equi-join with hot
    buckets dropped before any member list materializes
    (ops/dedup.py::capped_bucket_pairs); only candidates pay the exact
    hamming check (bit_count over the four banded XORs, pure
    codegen)."""
    from pyspark.sql import functions as F

    from .dedup import capped_bucket_pairs

    hashes = perceptual_hash(media)
    bands = hashes.select(
        F.col("media_id").alias("id"),
        F.posexplode(F.array("b0", "b1", "b2", "b3"))
        .alias("band", "bucket"))
    cands = capped_bucket_pairs(bands, max_bucket_size)
    ha = hashes.select(F.col("media_id").alias("a"),
                       *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)])
    hb = hashes.select(F.col("media_id").alias("b"),
                       *[F.col(f"b{i}").alias(f"b{i}_") for i in range(4)])
    ham = sum(F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}_")))
              for i in range(4))
    return (cands.join(ha, "a").join(hb, "b")
            .withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


SOBEL_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("h", LongType(), False),
    StructField("w", LongType(), False),
    StructField("n_interior", LongType(), False),
    StructField("sum_mag2", LongType(), False),
    StructField("max_mag2", LongType(), False),
    StructField("n_edges", LongType(), False),
])


def sobel_stats(media: DataFrame, edge_mag2: int = 10000) -> DataFrame:
    """Sobel edge statistics over REAL image decode -> (media_id, h, w,
    n_interior, sum_mag2, max_mag2, n_edges): the canonical cheap
    image-quality/content signal (blank or synthetic-flat images score
    near zero; busy photographs high) that a multimodal curation
    pipeline runs right after decode - the visual sibling of
    ``repetition_stats``.

    EVERY output is an exact integer: gray = (r+g+b) div 3 on uint8
    channels, Gx/Gy are the integer Sobel kernels over interior pixels,
    mag2 = Gx^2 + Gy^2 (no sqrt), n_edges counts mag2 >= ``edge_mag2``.
    So a REAL PNG/JPEG/GIF decode sits under the value-hash gate with
    zero float tolerance (the media_decode_stats contract, one step
    deeper into pixel processing).

    Scale shape: one mapInPandas over the payload column - peer
    batches of binaries in, 7 integers per image out; partitioning is
    whatever the media table already has, no shuffle at all."""
    thr = int(edge_mag2)

    def run(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {k: [] for k in ("media_id", "h", "w", "n_interior",
                                   "sum_mag2", "max_mag2", "n_edges")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype("int64")
                g = arr.sum(axis=2) // arr.shape[2]
                # integer Sobel on the interior via shifted slices
                gx = ((g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                      - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2]))
                gy = ((g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                      - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:]))
                mag2 = gx * gx + gy * gy
                out["media_id"].append(int(mid))
                out["h"].append(int(arr.shape[0]))
                out["w"].append(int(arr.shape[1]))
                out["n_interior"].append(int(mag2.size))
                out["sum_mag2"].append(int(mag2.sum()))
                out["max_mag2"].append(int(mag2.max())
                                       if mag2.size else 0)
                out["n_edges"].append(int((mag2 >= thr).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=SOBEL_SCHEMA)


OTSU_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("otsu_t", LongType(), False),
    StructField("n_below", LongType(), False),
    StructField("sum_below", LongType(), False),
])


def otsu_stats(media: DataFrame) -> DataFrame:
    """Otsu global threshold over REAL image decode -> (media_id,
    otsu_t, n_below, sum_below): the classic histogram-based
    binarization statistic (Otsu 1979) a multimodal curation pipeline
    uses to split scanned-text/diagram images from photographs (a
    bimodal gray histogram thresholds cleanly; flat noise does not).

    Determinism contract: gray = (r+g+b) div 3 on uint8 channels; the
    score of threshold t is the between-class variance written as the
    exact rational num/den with num = (S_t*N - n_t*S)^2 and den =
    n_t*(N - n_t) over the cumulative histogram - every integer fits
    int64 (N <= 2^20 pixels keeps num < 2^63) and num < 2^53 at our
    image sizes, so the DOUBLE division is correctly rounded and
    IDENTICAL on any IEEE engine; argmax ties break to the LOWEST t
    (numpy argmax first-hit == SQL ORDER BY score DESC, t ASC). The
    emitted surface is integers only.

    Scale shape: one mapInPandas over payloads (decode + 256-bin
    bincount + a 256-step vectorized scan per image), 4 integers out
    per image, no shuffle - the sobel_stats contract."""

    def run(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {k: [] for k in ("media_id", "otsu_t", "n_below",
                                   "sum_below")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype("int64")
                gray = arr.sum(axis=2) // arr.shape[2]
                c = np.bincount(gray.ravel(), minlength=256)
                cn = np.cumsum(c)
                cs = np.cumsum(c * np.arange(256, dtype="int64"))
                n_tot, s_tot = int(cn[-1]), int(cs[-1])
                num = (cs * n_tot - cn * s_tot) ** 2
                den = cn * (n_tot - cn)
                score = np.where(den > 0,
                                 num.astype("float64")
                                 / np.where(den > 0, den, 1), -1.0)
                t = int(np.argmax(score))
                out["media_id"].append(int(mid))
                out["otsu_t"].append(t)
                out["n_below"].append(int(cn[t]))
                out["sum_below"].append(int(cs[t]))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=OTSU_SCHEMA)


EQUALIZE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_px", LongType(), False),
    StructField("cdf_min", LongType(), False),
    StructField("sum_eq", LongType(), False),
    StructField("n_below128", LongType(), False),
])


def equalize_stats(media: DataFrame) -> DataFrame:
    """Histogram-equalization statistics over REAL image decode ->
    (media_id, n_px, cdf_min, sum_eq, n_below128): the standard
    contrast-normalization preprocessing (OpenCV equalizeHist) in its
    exact-integer form — map(v) = ((cdf(v) - cdf_min) * 255) div
    (n_px - cdf_min) with cdf_min the smallest nonzero cdf — so the
    remapped-luma sum and below-midpoint count of an ACTUAL decode
    sit under the value hash with zero float tolerance (the
    otsu_stats contract on the output side of the histogram).
    Constant images (n_px == cdf_min) map to all-zero by definition
    here (guarded, no /0).

    Scale shape: one mapInPandas (decode + 256-bin bincount + an
    np.take remap), 5 integers out per image, no shuffle."""

    def run(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_px", "cdf_min",
                                   "sum_eq", "n_below128")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype("int64")
                gray = arr.sum(axis=2) // arr.shape[2]
                c = np.bincount(gray.ravel(), minlength=256)
                cdf = np.cumsum(c)
                npx = int(cdf[-1])
                cdf_min = int(cdf[c > 0][0]) if npx else 0
                den = npx - cdf_min
                if den > 0:
                    emap = ((cdf - cdf_min) * 255) // den
                else:
                    emap = np.zeros(256, dtype="int64")
                out["media_id"].append(int(mid))
                out["n_px"].append(npx)
                out["cdf_min"].append(cdf_min)
                out["sum_eq"].append(int((c * emap).sum()))
                out["n_below128"].append(int(c[emap < 128].sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=EQUALIZE_SCHEMA)
