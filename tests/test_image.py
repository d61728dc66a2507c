"""Image codec + fidelity kernels (pure numpy, no Spark)."""

import numpy as np
import pytest

from tilecloud_chain_spark.functions import image as IMG


def test_png_roundtrip_rgb():
    img = IMG.synth_pixels(7, 40, 56)
    assert img.shape == (40, 56, 3)
    back = IMG.png_decode(IMG.png_encode(img))
    assert back.shape == (40, 56, 3)
    assert np.array_equal(back, img)


def test_png_roundtrip_rgba_and_gray():
    rgba = np.random.default_rng(1).integers(0, 256, (16, 16, 4), dtype=np.uint8)
    assert np.array_equal(IMG.png_decode(IMG.png_encode(rgba)), rgba)
    gray = np.random.default_rng(2).integers(0, 256, (10, 12), dtype=np.uint8)
    assert np.array_equal(IMG.png_decode(IMG.png_encode(gray))[:, :, 0], gray)


def test_png_decode_all_filters():
    """Decode scanline filters 1-4 (we encode filter 0; foreign PNGs use
    others). Build a tiny PNG by hand with each filter type."""
    import struct
    import zlib

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    # re-encode with per-row filters [0,1,2,3,4]
    raw = bytearray()
    prev = np.zeros(12, dtype=np.int32)
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[r].reshape(-1).astype(np.int32)
        enc = np.zeros(12, dtype=np.int32)
        for i in range(12):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                enc[i] = line[i]
            elif ftype == 1:
                enc[i] = line[i] - a
            elif ftype == 2:
                enc[i] = line[i] - b
            elif ftype == 3:
                enc[i] = line[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = line[i] - pred
        raw.append(ftype)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    data = (
        IMG._PNG_SIG
        + IMG._chunk(b"IHDR", ihdr)
        + IMG._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + IMG._chunk(b"IEND", b"")
    )
    assert np.array_equal(IMG.png_decode(data), img)


def test_qpng_lossy_psnr_above_40():
    img = IMG.synth_pixels(42, 64, 64)
    back = IMG.png_decode(IMG.qpng_encode(img))
    p = IMG.psnr(img, back)
    assert 40.0 <= p < 60.0, p


def test_psnr_identical_is_inf():
    img = IMG.synth_pixels(1, 8, 8)
    assert IMG.psnr(img, img) == float("inf")


def test_jpeg_real_codec_roundtrips():
    """fmt='jpeg' is a real engine-owned baseline codec now (was a stub);
    full conformance suite lives in tests/test_jpeg.py."""
    img = IMG.synth_pixels(1, 8, 8)
    assert IMG.psnr(img, IMG.decode(IMG.jpeg_encode(img), "jpeg")) >= 38.0


def test_phash_properties():
    a = IMG.synth_pixels(10, 64, 64)
    b = IMG.synth_pixels(11, 64, 64)
    ha, hb = IMG.phash64(a), IMG.phash64(b)
    assert ha != hb
    # deterministic
    assert IMG.phash64(a) == ha
    # statistically: lossy recompression stays much closer than distinct images
    lossy = [
        IMG.hamming64(
            IMG.phash64(IMG.synth_pixels(i, 64, 64)),
            IMG.phash64(IMG.png_decode(IMG.qpng_encode(IMG.synth_pixels(i, 64, 64)))),
        )
        for i in range(12)
    ]
    cross = [
        IMG.hamming64(
            IMG.phash64(IMG.synth_pixels(i, 64, 64)),
            IMG.phash64(IMG.synth_pixels(i + 100, 64, 64)),
        )
        for i in range(12)
    ]
    assert sum(lossy) / len(lossy) < 12 < sum(cross) / len(cross)


def test_synth_deterministic():
    assert np.array_equal(IMG.synth_pixels(5, 16, 16), IMG.synth_pixels(5, 16, 16))
    assert IMG.synth_caption("img1", 1) == IMG.synth_caption("img1", 1)
