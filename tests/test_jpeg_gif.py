"""Baseline JPEG + GIF codecs (ops/jpeg.py, ops/gif.py) and the real
multimodal paths they unlock.

Validation strategy mirrors test_codecs.py's PNG approach but with a
stronger independent referee: Spark's `image` data source decodes via
Java ImageIO, a codebase that shares nothing with ours. GIF is lossless
so agreement must be bit-EXACT; JPEG decoders may legally differ by a
few counts (T.81 only bounds IDCT accuracy), so those assertions are
small-tolerance. Real-world inputs come from files the sandbox already
ships (Spark's data/mllib images, distribution GIFs) and are skipped
cleanly when absent."""

import glob
import os
import struct

import numpy as np
import pytest

from eventrelationextractor_spark.ops import codecs, gif, jpeg, multimodal

SPARK_HOME = os.environ.get("SPARK_HOME",
                            "/opt/spark-4.1.2-bin-hadoop3")
REAL_JPEGS = sorted(glob.glob(
    os.path.join(SPARK_HOME, "data/mllib/images/origin/**/*.jpg"),
    recursive=True))
REAL_GIFS = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))[:6]


# ------------------------------------------------------------------ JPEG

@pytest.mark.parametrize("nc", [1, 3])
def test_jpeg_roundtrip_smooth(nc):
    y, x = np.mgrid[0:40, 0:56]
    base = np.clip(x * 2 + y, 0, 255)
    img = (np.stack([base, 255 - base, base // 2], axis=2)[:, :, :nc]
           .astype(np.uint8))
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_roundtrip_noise_bounded_by_quantization():
    """White noise exercises every AC category/run symbol incl. ZRL;
    the reconstruction must stay within pure-quantization error of the
    ideal inverse (this is the test that caught a scan-order/raster
    dequantize mixup the smooth image hid)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    q = jpeg._scale_table(jpeg._K_LUMA, 90)
    enc = jpeg.encode_jpeg(img, quality=90)
    dec = jpeg.decode_jpeg(enc)[:, :, 0]
    # ideal decode: quantize coeffs exactly as the encoder did
    worst = 0
    for by in range(3):
        for bx in range(5):
            blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            c = jpeg._A @ (blk - 128.0) @ jpeg._A.T
            zz = np.rint(c.reshape(64)[jpeg.ZIGZAG] / q[jpeg.ZIGZAG])
            r = np.zeros(64)
            r[jpeg.ZIGZAG] = zz * q[jpeg.ZIGZAG]
            ideal = np.clip(
                np.rint(jpeg._A.T @ r.reshape(8, 8) @ jpeg._A + 128),
                0, 255)
            got = dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            worst = max(worst, np.abs(got - ideal).max())
    assert worst <= 1                        # rounding only, no desync


def test_jpeg_odd_dimensions_and_low_quality():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=10))
    assert dec.shape == img.shape            # edge-padded blocks cropped


@pytest.mark.skipif(not REAL_JPEGS, reason="no Spark mllib JPEGs on disk")
def test_jpeg_decodes_real_world_files():
    decoded = 0
    for p in REAL_JPEGS:
        payload = open(p, "rb").read()
        try:
            arr = jpeg.decode_jpeg(payload)
        except NotImplementedError:
            continue                          # progressive: documented out
        assert arr.ndim == 3 and arr.shape[2] in (1, 3)
        assert 16 < float(arr.mean()) < 240
        decoded += 1
    assert decoded >= 4                       # 5 of Spark's 6 are baseline


@pytest.mark.skipif(not REAL_JPEGS, reason="no Spark mllib JPEGs on disk")
def test_jpeg_matches_java_imageio(spark):
    """Independent-decoder agreement on real 4:2:0 camera JPEGs."""
    kittens = [p for p in REAL_JPEGS if "kittens" in p][:3]
    checked = 0
    for p in kittens:
        row = (spark.read.format("image").load(p)
               .select("image.*").collect()[0])
        if row.nChannels != 3 or row.height <= 0:
            continue
        java = (np.frombuffer(bytes(row.data), dtype=np.uint8)
                .reshape(row.height, row.width, 3)[:, :, ::-1])
        mine = jpeg.decode_jpeg(open(p, "rb").read())
        assert mine.shape == java.shape
        d = np.abs(mine.astype(int) - java.astype(int))
        # different IDCT + chroma-upsample implementations: tiny mean,
        # small p99; NOT exact by design of the format
        assert d.mean() < 1.5 and np.percentile(d, 99) <= 4
        checked += 1
    assert checked >= 2


def test_jpeg_rejects_lossless_and_garbage():
    # fabricate an SOF3 (lossless) header: still NotImplementedError
    sof3 = (b"\xff\xd8\xff\xc3" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
            + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError, match="SOF marker 0xc3"):
        jpeg.decode_jpeg(sof3)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xe0fakejpeg")


# ------------------------------------------------------- progressive JPEG

def test_progressive_decode_equals_baseline_decode():
    """encode_jpeg_progressive writes the same quantized coefficients as
    encode_jpeg, so decoding its stream must reproduce the baseline
    decode BIT-FOR-BIT - any slip in the four scan algorithms (DC/AC x
    first/refine, EOB runs, correction bits) breaks equality. Noise
    shapes exercise every AC symbol class; odd dims exercise padding."""
    rng = np.random.default_rng(7)
    shapes = [(16, 16, 1), (24, 17, 3), (8, 8, 3), (40, 33, 3)]
    for shape in shapes:
        arr = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=85))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(arr, quality=85))
        assert np.array_equal(base, prog), shape


@pytest.mark.skipif(not REAL_JPEGS, reason="no Spark mllib JPEGs on disk")
def test_progressive_real_file_matches_imageio(spark):
    """grayscale.jpg in Spark's mllib images is a REAL SOF2 progressive
    stream written by a standard encoder: our decode must agree with
    Java ImageIO within IDCT rounding."""
    prog = [p for p in REAL_JPEGS if p.endswith("grayscale.jpg")]
    if not prog:
        pytest.skip("grayscale.jpg absent")
    row = (spark.read.format("image").load(prog[0])
           .select("image.*").collect()[0])
    java = (np.frombuffer(bytes(row.data), dtype=np.uint8)
            .reshape(row.height, row.width, row.nChannels))
    mine = jpeg.decode_jpeg(open(prog[0], "rb").read())
    assert mine.shape == java.shape
    d = np.abs(mine.astype(int) - java.astype(int))
    assert d.max() <= 1 and d.mean() < 0.1


def test_progressive_stream_accepted_by_imageio(spark, tmp_path):
    """The other direction: Java ImageIO must decode OUR progressive
    streams (scan script, flat AC table, EOB-run encoding) to the same
    pixels we decode, within the usual cross-decoder tolerance."""
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:32, 0:48]
    cases = {
        "noise3.jpg": rng.integers(0, 256, size=(24, 33, 3)),
        "noise1.jpg": rng.integers(0, 256, size=(40, 16, 1)),
        "grad.jpg": np.stack([(x * 5) % 256, (y * 6) % 256,
                              (x + y) % 256], axis=2),
    }
    for name, arr in cases.items():
        arr = arr.astype(np.uint8)
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(jpeg.encode_jpeg_progressive(arr, quality=92))
        row = (spark.read.format("image").load(p)
               .select("image.*").collect()[0])
        assert row.height == arr.shape[0] and row.width == arr.shape[1]
        java = (np.frombuffer(bytes(row.data), dtype=np.uint8)
                .reshape(row.height, row.width, row.nChannels))
        if row.nChannels >= 3:
            java = java[:, :, 2::-1]          # BGR(A) -> RGB
        mine = jpeg.decode_jpeg(open(p, "rb").read())
        d = np.abs(mine[:, :, :java.shape[2]].astype(int)
                   - java.astype(int))
        assert d.max() <= 2, name


# ------------------------------------------------------------------- GIF

def test_gif_animated_roundtrip():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    frames = [rng.integers(0, 17, size=(23, 31), dtype=np.uint8)
              for _ in range(3)]
    dec = gif.decode_gif_frames(gif.encode_gif(frames, pal))
    assert len(dec) == 3
    for fi, d in zip(frames, dec):
        assert (d == pal[fi]).all()          # lossless: exact


def test_gif_interlaced_and_tiny_palette():
    rng = np.random.default_rng(2)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    f = rng.integers(0, 2, size=(9, 13), dtype=np.uint8)
    assert (gif.decode_gif_frames(
        gif.encode_gif([f], pal, interlace_first=True))[0]
        == pal[f]).all()


@pytest.mark.skipif(not REAL_GIFS, reason="no distribution GIFs on disk")
def test_gif_matches_java_imageio_exactly(spark):
    """GIF is lossless LZW: our decode must equal ImageIO's bit-for-bit
    (on opaque pixels; transparent ones are composite-policy)."""
    checked = 0
    for p in REAL_GIFS:
        row = (spark.read.format("image").load(p)
               .select("image.*").collect()[0])
        if row.height <= 0:
            continue
        nch = row.nChannels
        java = (np.frombuffer(bytes(row.data), dtype=np.uint8)
                .reshape(row.height, row.width, nch))
        mine = gif.decode_gif_frames(open(p, "rb").read())[0]
        assert mine.shape[:2] == (row.height, row.width)
        if nch == 1:
            ref, mask = np.repeat(java, 3, axis=2), None
        elif nch == 3:
            ref, mask = java[:, :, ::-1], None
        else:
            ref, mask = java[:, :, [2, 1, 0]], java[:, :, 3] > 0
        d = np.abs(mine.astype(int) - ref.astype(int)).max(axis=2)
        assert (d[mask].max() if mask is not None and mask.any()
                else d.max()) == 0
        checked += 1
    assert checked >= 3


def test_gif_real_decoder_handles_lzw_width_growth():
    """A 200-color 64x64 noise frame forces real LZW code-width growth
    (9->10->11 bits) in the decoder; round-trip through our clear-often
    encoder stays exact."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    f = rng.integers(0, 200, size=(64, 64), dtype=np.uint8)
    assert (gif.decode_gif_frames(gif.encode_gif([f], pal))[0]
            == pal[f]).all()


# ------------------------------------- multimodal operators, real paths

def _make_gif_video(n_frames=6, seed=4):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    frames = [np.full((12, 16), i * 5, dtype=np.uint8) % 32
              for i in range(n_frames)]
    return gif.encode_gif(frames, pal), pal, frames


def test_sample_frames_real_gif(spark):
    payload, pal, frames = _make_gif_video()
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None),
         (2, "image", bytearray(b"notavideo"), None, None)],
        multimodal.MEDIA_SCHEMA)
    rows = (multimodal.sample_frames(media, n_frames=3, fake=False)
            .collect())
    assert [r.media_id for r in rows] == [1, 1, 1]
    assert [r.frame_idx for r in rows] == [0, 2, 4]   # evenly spaced
    for r in rows:
        arr = codecs.decode_png(bytes(r.payload))     # re-decodable PNG
        assert (arr == pal[frames[r.frame_idx]]).all()


def test_extract_features_jpeg_and_gif(spark):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    jpg = jpeg.encode_jpeg(img, quality=95)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    gpl = gif.encode_gif([rng.integers(0, 8, size=(10, 20),
                                       dtype=np.uint8)], pal)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpg), 24, 16),
         (2, "image", bytearray(gpl), 20, 10)],
        multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r.feature for r in
             multimodal.extract_features(media, dim=8, fake=False)
             .collect()}
    assert abs(feats[1][0] - 16 / 4096) < 1e-6        # decoded height
    assert abs(feats[2][0] - 10 / 4096) < 1e-6
    assert abs(feats[2][1] - 20 / 4096) < 1e-6


def test_resize_composes_across_formats(spark):
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpeg.encode_jpeg(img, quality=95)),
          32, 32)],
        multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, 8, 8, fake=False).collect()[0]
    arr = codecs.decode_png(bytes(out.payload))       # JPEG in, PNG out
    assert arr.shape == (8, 8, 3)


def test_video_still_fails_loudly_for_real_containers():
    with pytest.raises(NotImplementedError):
        multimodal.decode_video_frame(b"\x00\x00\x00\x20ftypmp42", 0)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFF....WEBP")
