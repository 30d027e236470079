"""Capture a REAL libwebp-encoded lossless stream as a decode fixture
(ADVICE r6 gold item: a byte-exact stream captured from libwebp, not
just our own encoder's output or a hand-built spec stream).

The container ships libwebp.so.7 (runtime only — no cwebp tool, no
headers), so the capture goes through ctypes: a deterministic 64x48
RGB image — a smooth gradient block (predictor-transform bait), a
repeated 8-color tile block (color-cache / palette bait), and an LCG
noise block — encodes with WebPEncodeLosslessRGB, and the bytes land
in tests/fixtures/libwebp_lossless.webp. The committed test
(test_webp.py::test_decode_real_libwebp_stream) regenerates the pixels
from the same formula and demands our decoder reproduce them exactly;
libwebp itself is NOT needed at test time.

Run: python tools/capture_libwebp_fixture.py
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traildb_spark.operators.webp import decode_webp  # noqa: E402

W, H = 64, 48


def fixture_pixels() -> np.ndarray:
    """Deterministic (H, W, 3) uint8 — duplicated in the test."""
    img = np.zeros((H, W, 3), np.uint8)
    # rows 0-15: smooth two-axis gradient
    for y in range(16):
        for x in range(W):
            img[y, x] = ((x * 4) & 0xFF, (y * 16) & 0xFF, ((x + y) * 2) & 0xFF)
    # rows 16-31: repeated 8-color 4px tiles
    tiles = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
             (0, 255, 255), (255, 0, 255), (32, 64, 96), (200, 150, 100)]
    for y in range(16, 32):
        for x in range(W):
            img[y, x] = tiles[((x // 4) + (y // 4)) % 8]
    # rows 32-47: LCG noise
    s = 12345
    for y in range(32, H):
        for x in range(W):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            img[y, x] = (s & 0xFF, (s >> 8) & 0xFF, (s >> 16) & 0xFF)
    return img


def palette_pixels() -> np.ndarray:
    """(25, 41) image from a 13-color palette — odd width + ≤16 colors
    pushes libwebp onto the COLOR_INDEXING transform with 4-pixel
    bundling (pack=1), the sub-byte path the main fixture skips."""
    pal = [(i * 19 % 256, i * 53 % 256, i * 97 % 256) for i in range(13)]
    img = np.zeros((25, 41, 3), np.uint8)
    for y in range(25):
        for x in range(41):
            img[y, x] = pal[(x * x + 3 * y) % 13]
    return img


def rgba_pixels() -> np.ndarray:
    """(20, 32, 4) with varying alpha — exercises the alpha prefix code
    on a real stream (the RGB fixtures keep alpha constant 255)."""
    img = np.zeros((20, 32, 4), np.uint8)
    for y in range(20):
        for x in range(32):
            img[y, x] = ((x * 8) & 0xFF, (y * 12) & 0xFF,
                         ((x ^ y) * 16) & 0xFF, 255 - ((x + y) * 3) % 128)
    return img


def _luma(img: np.ndarray) -> np.ndarray:
    return (0.299 * img[:, :, 0].astype(np.int64)
            + 0.587 * img[:, :, 1].astype(np.int64)
            + 0.114 * img[:, :, 2].astype(np.int64))


def main():
    lib = ctypes.CDLL("libwebp.so.7")
    for fn in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
        getattr(lib, fn).restype = ctypes.c_size_t
        getattr(lib, fn).argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
    fixtures = [
        ("libwebp_lossless.webp", fixture_pixels(), 3),
        ("libwebp_palette.webp", palette_pixels(), 3),
        ("libwebp_rgba.webp", rgba_pixels(), 4),
    ]
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    for name, img, ch in fixtures:
        h, w = img.shape[:2]
        out = ctypes.POINTER(ctypes.c_uint8)()
        enc = (lib.WebPEncodeLosslessRGB if ch == 3
               else lib.WebPEncodeLosslessRGBA)
        size = enc(img.tobytes(), w, h, w * ch, ctypes.byref(out))
        assert size > 0, f"libwebp encode failed for {name}"
        blob = ctypes.string_at(out, size)
        ctypes.CDLL(None).free(out)
        got = decode_webp(blob)
        assert got.shape == (h, w), name
        assert np.array_equal(got, _luma(img)), \
            f"our decoder disagrees with libwebp on {name}"
        with open(os.path.join(base, name), "wb") as f:
            f.write(blob)
        print(f"captured {size} bytes -> {name} ({h * w} pixels exact)")


if __name__ == "__main__":
    main()
