"""Pure-stdlib media codecs: PNG (zlib + the five RFC 2083 scanline
filters) and WAV (the ``wave`` module). No third-party imaging/audio
library ships in this sandbox, but PNG is just deflate over filtered
scanlines and WAV is framed PCM - both decodable with the standard
library alone. Sibling modules extend the real-decode set: ops/jpeg.py
(baseline JPEG, validated against Java ImageIO) and ops/gif.py
(GIF/LZW incl. animations - the real multi-frame path for
sample_frames). Only WebP/AVIF/progressive-JPEG and true video codecs
(H.264 etc.) remain NotImplementedError.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced - the overwhelmingly common subset. Decode is
validated against real PNGs produced by real encoders (CPython/IPython
distribution icons) in tests, not only against our own encoder, so the
filter inverses cannot silently cancel a shared bug.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """-> (height, width, channels) uint8 array."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bitdepth = colortype = interlace = None
    idat = []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                       # skip CRC
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG subset: 8-bit color types {sorted(_CHANNELS)} "
            f"non-interlaced (got depth={bitdepth} color={colortype} "
            f"interlace={interlace})")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        cur = rows[y].astype(np.uint8).copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:                               # Up
            out[y] = cur + prev
        elif f == 1:                               # Sub = per-lane cumsum
            lanes = cur.reshape(width, ch)
            out[y] = (np.cumsum(lanes.astype(np.uint64), axis=0) & 0xFF) \
                .astype(np.uint8).reshape(stride)
        elif f == 3:                               # Average
            row = cur
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:                               # Paeth
            row = cur
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                row[x] = (int(row[x]) + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, row_filter: int = 0) -> bytes:
    """(h, w, ch) uint8 -> PNG bytes. ``row_filter`` applies one filter
    type to every row (0/1/2 supported - enough to exercise the decoder
    against multiple filter paths; real encoders pick per-row)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.uint8)
    lines = []
    for y in range(h):
        row = flat[y]
        if row_filter == 0:
            lines.append(b"\x00" + row.tobytes())
        elif row_filter == 2:
            prev = flat[y - 1] if y > 0 else np.zeros_like(row)
            lines.append(b"\x02" + (row - prev).tobytes())
        elif row_filter == 1:
            shifted = np.zeros_like(row)
            shifted[ch:] = row[:-ch]
            lines.append(b"\x01" + (row - shifted).tobytes())
        else:
            raise ValueError("encode_png supports row_filter 0/1/2")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic, dependency-free
    kernel; a production stack swaps in area/Lanczos)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def decode_wav(payload: bytes):
    """-> (sample_rate, (n_frames, n_channels) float64 in [-1, 1])."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:                    # 8-bit WAV is unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    return rate, samples.reshape(-1, ch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(n, ch) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_wav_pcm16(rate: int, pcm: np.ndarray) -> bytes:
    """int16 samples (n,) or (n, ch) -> WAV bytes with NO float
    rescale: the exact inverse of ``decode_wav``'s /32768.0 (which is
    dyadic and lossless in float64), so integer sample patterns
    round-trip bit-exactly — what a SQL oracle needs to replay frame
    statistics from a closed form."""
    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(pcm.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
