"""Pure-stdlib media codecs: byte-level encode/decode correctness,
including PNG filter reconstruction for filter types our encoder never
emits (a real decoder must handle any spec-legal stream)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rdbms_subsetter_spark.operators import media_codecs as mc


def test_png_roundtrip_gradient():
    pix = (np.add.outer(np.arange(9), np.arange(17)) % 256).astype(np.uint8)
    w, h, back = mc.decode_png(mc.encode_png_gray(pix))
    assert (w, h) == (17, 9)
    assert (back == pix).all()


def test_png_sub_and_up_filters():
    """Hand-built IDAT with filter types 1 (Sub) and 2 (Up): the decoder
    must reconstruct, not just inflate."""
    rows = [
        bytes([1]) + bytes([5] + [1] * 15),  # Sub: 5,6,...,20
        bytes([2]) + bytes([10] * 16),  # Up: prev + 10
    ]
    ihdr = struct.pack(">IIBBBBB", 16, 2, 8, 0, 0, 0, 0)
    png = (
        mc.PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + mc._png_chunk(b"IEND", b"")
    )
    w, h, dec = mc.decode_png(png)
    assert (w, h) == (16, 2)
    assert list(dec[0]) == list(range(5, 21))
    assert list(dec[1]) == [v + 10 for v in range(5, 21)]


def test_png_average_and_paeth_filters():
    rows = [
        bytes([0]) + bytes(range(8)),  # None: 0..7
        bytes([3]) + bytes([4] * 8),  # Average over (left, up)
        bytes([4]) + bytes([1] * 8),  # Paeth
    ]
    ihdr = struct.pack(">IIBBBBB", 8, 3, 8, 0, 0, 0, 0)
    png = (
        mc.PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + mc._png_chunk(b"IEND", b"")
    )
    _, _, dec = mc.decode_png(png)
    # row1 Average: cur[i] = 4 + (left + up)//2
    expect1 = []
    for i in range(8):
        a = expect1[i - 1] if i else 0
        expect1.append((4 + (a + i) // 2) & 0xFF)
    assert list(dec[1]) == expect1
    # row2 Paeth over reconstructed row1
    expect2 = []
    for i in range(8):
        a = expect2[i - 1] if i else 0
        b = expect1[i]
        c = expect1[i - 1] if i else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        expect2.append((1 + pred) & 0xFF)
    assert list(dec[2]) == expect2


def test_png_crc_rejected():
    png = bytearray(mc.encode_png_gray(np.zeros((2, 2), np.uint8)))
    png[20] ^= 0xFF  # corrupt IHDR body
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_png(bytes(png))


def test_wav_roundtrip():
    s = (np.arange(100) - 50).astype(np.int16)
    n, rate, back = mc.decode_wav(mc.encode_wav_mono(s, rate=16000))
    assert (n, rate) == (100, 16000)
    assert (back == s).all()


def test_ppm_roundtrip_and_comment_header():
    p = np.random.default_rng(0).integers(0, 255, (5, 7, 3)).astype(np.uint8)
    w, h, back = mc.decode_ppm(mc.encode_ppm(p))
    assert (w, h) == (7, 5)
    assert (back == p).all()
    # comment lines in the header are spec-legal
    with_comment = b"P6\n# a comment\n7 5\n255\n" + p.tobytes()
    w2, h2, back2 = mc.decode_ppm(with_comment)
    assert (w2, h2) == (7, 5) and (back2 == p).all()


def test_sniff():
    assert mc.sniff(mc.encode_png_gray(np.zeros((1, 1), np.uint8))) == "png"
    assert mc.sniff(mc.encode_wav_mono(np.zeros(4, np.int16))) == "wav"
    assert mc.sniff(mc.encode_ppm(np.zeros((1, 1, 3), np.uint8))) == "ppm"
    assert mc.sniff(b"\xff\xd8\xff\xe0 jpeg-ish") == "unknown"
