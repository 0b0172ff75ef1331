"""Real multimodal kernels: pure-stdlib PNG/WAV codecs (ops/codecs.py)
and the fake=False paths of the multimodal operators. PNG decode is
validated against real-world files (produced by real encoders with
per-row filter choices incl. Paeth), not only our own encoder, so the
filter inverses cannot silently cancel a shared bug."""

import glob
import os
import struct
import sysconfig

import numpy as np
import pytest

from eventrelationextractor_spark.ops import codecs, multimodal

# Real-world fixtures discovered from standard install locations (bounded
# globs; tests skip cleanly when absent so the suite stays portable).
_paths = sysconfig.get_paths()
REAL_PNGS = sorted(
    glob.glob("/usr/share/doc/python3*/_static/*.png")
    + glob.glob(os.path.join(_paths["purelib"],
                             "werkzeug", "debug", "shared", "*.png")))[:6]
REAL_WAVS = sorted(
    glob.glob(os.path.join(_paths["stdlib"], "test", "audiodata", "*.wav"))
    + glob.glob(os.path.join(_paths["stdlib"],
                             "test", "sndhdrdata", "sndhdr.wav")))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2])
def test_png_roundtrip(ch, filt):
    rng = np.random.default_rng(ch * 10 + filt)
    a = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    b = codecs.decode_png(codecs.encode_png(a, row_filter=filt))
    assert (a == b).all()


@pytest.mark.skipif(not REAL_PNGS, reason="no distribution PNGs on disk")
def test_png_decodes_real_world_files():
    decoded = 0
    for p in REAL_PNGS:
        payload = open(p, "rb").read()
        try:
            arr = codecs.decode_png(payload)
        except NotImplementedError:
            continue                      # outside the documented subset
        # dims must match the IHDR the real encoder wrote
        w, h = struct.unpack(">II", payload[16:24])
        assert arr.shape == (h, w, arr.shape[2]) and arr.shape[2] in (1, 2, 3, 4)
        assert 0 < float(arr.mean()) < 255
        # re-encode with our encoder and re-decode: exact round-trip of
        # the real-world pixels (real encoders use per-row Sub/Up/Paeth
        # filters, so this exercises decode paths our encoder can't emit)
        assert (codecs.decode_png(codecs.encode_png(arr, row_filter=2))
                == arr).all()
        decoded += 1
    assert decoded > 0


@pytest.mark.skipif(not REAL_WAVS, reason="no distribution WAVs on disk")
def test_wav_decodes_real_world_files():
    decoded = 0
    for p in REAL_WAVS:
        try:
            rate, s = codecs.decode_wav(open(p, "rb").read())
        except NotImplementedError:
            continue                      # e.g. 24-bit PCM
        assert rate > 0 and s.ndim == 2 and len(s) > 0
        assert float(np.abs(s).max()) <= 1.0
        decoded += 1
    assert decoded > 0


def test_wav_roundtrip_and_resize():
    sig = np.sin(np.linspace(0, 20, 8000))[:, None]
    rate, s = codecs.decode_wav(codecs.encode_wav(16000, sig))
    assert rate == 16000 and np.abs(s - sig).max() < 1e-3
    img = np.arange(24, dtype=np.uint8).reshape(4, 2, 3)
    up = codecs.resize_nearest(img, 4, 8)
    assert up.shape == (8, 4, 3)
    assert (codecs.resize_nearest(up, 2, 4) == img).all()  # exact inverse


def test_extract_features_real_kernels(spark):
    rng = np.random.default_rng(3)
    png = codecs.encode_png(
        rng.integers(0, 256, size=(16, 8, 3), dtype=np.uint8))
    wav = codecs.encode_wav(8000, np.sin(np.linspace(0, 60, 4000)))
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), 8, 16),
         (2, "audio", bytearray(wav), None, None)],
        multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in
             multimodal.extract_features(media, dim=8, fake=False).collect()}
    # image: h/4096, w/4096, ch/4 leading dims
    f1 = feats[1].feature
    assert abs(f1[0] - 16 / 4096) < 1e-6 and abs(f1[1] - 8 / 4096) < 1e-6
    assert abs(f1[2] - 3 / 4) < 1e-6
    # audio: duration 0.5s, rate 8k
    f2 = feats[2].feature
    assert abs(f2[0] - 0.5 / 3600) < 1e-6 and abs(f2[1] - 8000 / 96000) < 1e-5
    assert f2[3] > 0.5  # sine RMS ~ 0.707


def test_resize_images_real_kernel_composes(spark):
    rng = np.random.default_rng(5)
    png = codecs.encode_png(
        rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), 32, 32),
         (2, "audio", bytearray(b"notanimage"), None, None)],
        multimodal.MEDIA_SCHEMA)
    once = multimodal.resize_images(media, 16, 16, fake=False)
    twice = multimodal.resize_images(once, 8, 8, fake=False)
    rows = {r.media_id: r for r in twice.collect()}
    out = codecs.decode_png(bytes(rows[1].payload))
    assert out.shape == (8, 8, 3)          # genuinely re-decodable
    assert bytes(rows[2].payload) == b"notanimage"  # non-image passthrough


def test_unsupported_formats_still_fail_loudly():
    # JPEG/GIF now decode for real (ops/jpeg.py, ops/gif.py; see
    # test_jpeg_gif.py) - malformed streams raise ValueError, formats
    # with no sandbox-decodable codec raise NotImplementedError.
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFF....WEBPVP8 ")
    with pytest.raises(NotImplementedError):
        multimodal.decode_video_frame(b"x", 0)


# ------------------------------------------------- audio frame stats


def test_encode_wav_pcm16_exact_roundtrip():
    import numpy as np

    from eventrelationextractor_spark.ops import codecs
    pcm = np.array([0, 1, -1, 1023, -1024, 32767, -32768], dtype=np.int16)
    rate, s = codecs.decode_wav(codecs.encode_wav_pcm16(8000, pcm))
    assert rate == 8000
    back = np.round(s[:, 0] * 32768.0).astype(np.int64)
    assert back.tolist() == pcm.astype(np.int64).tolist()


def test_audio_frame_stats_silence_runs(spark):
    import numpy as np
    import pandas as pd

    from eventrelationextractor_spark.ops import codecs, multimodal

    # 5 frames of 4 samples: loud, silent, silent, loud, partial-silent
    pcm = np.array([1000, -1000, 1000, -1000,
                    0, 0, 0, 0,
                    3, -3, 2, 0,
                    900, 900, 900, 900,
                    0, 0], dtype=np.int16)
    payload = codecs.encode_wav_pcm16(8000, pcm)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "kind": ["audio"],
                      "payload": [payload], "width": [0], "height": [0]}),
        schema=multimodal.MEDIA_SCHEMA)
    r = multimodal.audio_frame_stats(media, frame_len=4,
                                     silence_thresh=10).collect()[0]
    assert (r.n_samples, r.n_frames) == (18, 5)
    assert (r.n_silent, r.max_silent_run) == (3, 2)
    assert r.peak == 1000
    assert r.energy_total == int((pcm.astype(np.int64) ** 2).sum())


def _png_media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(codecs.encode_png(arr, row_filter=rf)),
          arr.shape[1], arr.shape[0])
         for i, arr, rf in rows], multimodal.MEDIA_SCHEMA)


def test_perceptual_hash_known_gradients(spark):
    # x-increasing ramp: every left<right comparison true -> all-ones
    # bands; reversed ramp -> all-zeros. 9 columns so the 9 sample
    # columns are exactly the 9 pixel columns.
    x = np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))
    inc = np.repeat(x[:, :, None], 3, axis=2)
    dec = np.repeat((180 - x)[:, :, None].astype(np.uint8), 3, axis=2)
    out = {r.media_id: r for r in multimodal.perceptual_hash(
        _png_media(spark, [(1, inc, 0), (2, dec, 1)])).collect()}
    assert [out[1][f"b{i}"] for i in range(4)] == [65535] * 4
    assert [out[2][f"b{i}"] for i in range(4)] == [0] * 4


def test_perceptual_hash_reencode_invariant(spark):
    # The point of a perceptual hash: identical pixels under different
    # PNG row filters (different BYTES, different exact fingerprint)
    # hash identically.
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [(i, arr, rf) for i, rf in enumerate((0, 1, 2))]
    got = multimodal.perceptual_hash(_png_media(spark, rows)).collect()
    sigs = {tuple(r[f"b{i}"] for i in range(4)) for r in got}
    assert len(sigs) == 1


def test_perceptual_hash_pairs_banding_exact(spark):
    # A single-pixel edit on a sampled grid cell flips few bits: the
    # banded join must still surface the pair (exactness for
    # hamming<=3), while an unrelated random image stays unpaired.
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    near = base.copy()
    near[3, 4, :] = 255 - near[3, 4, :]
    far = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    media = _png_media(spark, [(1, base, 0), (2, near, 0), (3, far, 2)])
    hashes = {r.media_id: r for r in
              multimodal.perceptual_hash(media).collect()}
    ham12 = sum(bin(hashes[1][f"b{i}"] ^ hashes[2][f"b{i}"]).count("1")
                for i in range(4))
    pairs = {(r.a, r.b): r.hamming
             for r in multimodal.perceptual_hash_pairs(media).collect()}
    if ham12 <= 3:
        assert pairs[(1, 2)] == ham12
    assert all(h <= 3 for h in pairs.values())
