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


def main():
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    img = fixture_pixels()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGB(
        img.tobytes(), W, H, W * 3, ctypes.byref(out))
    assert size > 0, "libwebp encode failed"
    blob = ctypes.string_at(out, size)
    ctypes.CDLL(None).free(out)

    luma = (0.299 * img[:, :, 0].astype(np.int64)
            + 0.587 * img[:, :, 1].astype(np.int64)
            + 0.114 * img[:, :, 2].astype(np.int64))
    got = decode_webp(blob)
    assert got.shape == (H, W)
    assert np.array_equal(got, luma), "our decoder disagrees with libwebp"

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "libwebp_lossless.webp")
    with open(dst, "wb") as f:
        f.write(blob)
    print(f"captured {size} bytes -> {dst} (decode verified: "
          f"{H * W} pixels exact)")


if __name__ == "__main__":
    main()
