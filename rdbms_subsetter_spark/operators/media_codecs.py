"""Pure-stdlib media codecs: REAL byte-level encode/decode for PNG
(grayscale, zlib + full filter reconstruction), WAV (PCM16 via the
stdlib ``wave`` module), and binary PPM (P6).

The container has no PIL/soundfile/ffmpeg, but these three formats need
nothing beyond ``zlib``/``struct``/``wave``/numpy — so the multimodal
decode path has a branch that ACTUALLY parses compressed bytes into
pixel/sample arrays in any environment (`multimodal.py`'s PIL gate
covers the jpeg/webp/mp3 world when those libs exist).  The reference
(18F/rdbms-subsetter) treats all values opaquely; this whole surface is
part of the BASELINE.json multimodal extension.

Decoders sniff magic bytes, never trust a side-channel type column —
the first thing a real ingest pipeline learns about crawled media.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG (grayscale 8-bit, non-interlaced)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a real grayscale PNG (filter 0 rows,
    one zlib-compressed IDAT)."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, w: int, h: int, bpp: int = 1) -> np.ndarray:
    """Reverse the PNG row filters (types 0-4) — the real reconstruction
    step, not a header peek."""
    stride = w * bpp + 1
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        ftype, data = row[0], row[1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(w * bpp, np.int32)
        cur = np.zeros(w * bpp, dtype=np.int32)
        if ftype == 0:  # None
            cur = data
        elif ftype == 2:  # Up
            cur = (data + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left neighbor
            for i in range(w * bpp):
                a = cur[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                if ftype == 1:  # Sub
                    cur[i] = (data[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    cur[i] = (data[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[i] = (data[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, bpp)


def decode_png(b: bytes) -> tuple[int, int, np.ndarray]:
    """Parse chunks, inflate IDAT, reverse row filters → (w, h, pixels).
    Grayscale-8 only (what our encoder and fixture corpus emit); other
    color types raise rather than mis-decode."""
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    h = bitdepth = colortype = None
    idat = b""
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or h is None:
        raise ValueError("PNG missing IHDR")
    if (bitdepth, colortype) != (8, 0):
        raise ValueError(f"unsupported PNG format: depth={bitdepth} color={colortype}")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return w, h, _unfilter(raw, w, h, bpp=1)


# ---------------------------------------------------------------------------
# WAV (PCM16 mono) via the stdlib wave module
# ---------------------------------------------------------------------------


def encode_wav_mono(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 samples as a real RIFF/WAVE file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Parse the RIFF container → (n_samples, rate, int16 samples)."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError("only PCM16 mono supported")
        rate = wf.getframerate()
        n = wf.getnframes()
        samples = np.frombuffer(wf.readframes(n), dtype="<i2")
    return n, rate, samples


# ---------------------------------------------------------------------------
# PPM (P6 binary RGB)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    if not b.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: three whitespace-separated ints after the magic
    parts, pos, vals = [], 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pix = np.frombuffer(b[pos : pos + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    return w, h, pix


# ---------------------------------------------------------------------------
# magic-byte sniffing
# ---------------------------------------------------------------------------


def sniff(b: bytes) -> str:
    """Identify the container from leading bytes (never trust metadata)."""
    if b[:8] == PNG_SIG:
        return "png"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:2] == b"P6":
        return "ppm"
    return "unknown"
