"""Real-third-party-encoder decode fixtures (captured once via
tools/capture_codec_fixtures.py from the container's libpng16 /
giflib7 / libtiff6 / libjpeg62 runtimes — the libwebp-capture pattern
from round 8, which found a real bug, extended to every codec with a
probe-able `.so`; FLAC remains tooling-blocked: no libFLAC / ffmpeg in
this container). No codec library is needed at test time: the pixel
recipes are regenerated here and our pure-python decoders must
reproduce them from the committed real streams.

Why this matters beyond our own round-trip tests: a third-party
encoder makes choices our encoder never does — libpng picks per-row
adaptive filters, giflib emits its own LZW code-size ladder, libtiff
writes multi-strip PackBits with out-of-line count arrays, libjpeg
uses its own Huffman tables and marker layout — so these streams walk
decoder paths our fixtures otherwise can't reach."""

import hashlib
import json
from pathlib import Path

import numpy as np

from traildb_spark.operators import multimodal
from traildb_spark.operators.gif import decode_gif_indices
from traildb_spark.operators.jpeg import decode_jpeg_luma

FIXTURES = Path(__file__).parent / "fixtures"


# --- pixel recipes (must stay identical to capture_codec_fixtures.py) ----

def gray_pixels(h=40, w=56):
    img = np.zeros((h, w), np.uint8)
    for y in range(h // 3):
        img[y] = [(x * 5 + y * 11) & 0xFF for x in range(w)]
    for y in range(h // 3, 2 * h // 3):
        img[y] = [((x // 4 + y // 4) % 7) * 36 for x in range(w)]
    s = 98765
    for y in range(2 * h // 3, h):
        row = []
        for x in range(w):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            row.append(s & 0xFF)
        img[y] = row
    return img


def rgb_pixels(h=32, w=48):
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = ((x * 7) & 0xFF, (y * 13) & 0xFF,
                         ((x ^ y) * 9) & 0xFF)
    return img


def gif_palette_and_indices(h=30, w=44):
    pal = np.array([[i * 17 % 256, i * 37 % 256, i * 73 % 256]
                    for i in range(16)], np.uint8)
    idx = np.fromfunction(
        lambda y, x: (x * x + 3 * y + (x // 5) * y) % 16, (h, w)
    ).astype(np.uint8)
    return pal, idx


def test_decode_real_libpng_streams():
    """libpng's adaptive per-row filter choices (our own make_png emits
    a fixed filter) must reconstruct exactly — gray and RGB→luma."""
    g = gray_pixels()
    got = multimodal._gray_pixels(
        (FIXTURES / "codec_libpng_gray.png").read_bytes())
    assert np.array_equal(np.round(got).astype(np.int64), g)

    c = rgb_pixels()
    want = np.round(
        0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    ).astype(np.int64)
    got = multimodal._gray_pixels(
        (FIXTURES / "codec_libpng_rgb.png").read_bytes())
    assert np.array_equal(np.round(got).astype(np.int64), want)


def test_decode_real_giflib_stream():
    """giflib's LZW output (its own code-size ladder and clear-code
    cadence) must decode to the exact palette-mapped pixels."""
    pal, idx = gif_palette_and_indices()
    got_pal, got_idx = decode_gif_indices(
        (FIXTURES / "codec_giflib.gif").read_bytes())
    assert got_idx.shape == idx.shape
    assert np.array_equal(got_pal[got_idx], pal[idx])


def test_decode_real_libtiff_stream():
    """libtiff PackBits multi-strip layout (rows-per-strip 7, out-of-line
    StripOffsets/ByteCounts arrays) must reconstruct exactly."""
    g = gray_pixels()
    got = multimodal.decode_tiff(
        (FIXTURES / "codec_libtiff_packbits.tif").read_bytes())
    assert np.array_equal(np.round(got).astype(np.int64), g)


def test_decode_real_libjpeg_stream():
    """Parse-compatibility with a real libjpeg stream (its Huffman
    tables and marker layout, not our encoder's). JPEG is lossy and
    IDCT implementations legitimately differ at the ULP level, so the
    contract is (a) byte-stable decode vs the capture-time pin and
    (b) the capture-time max-abs-error bound vs the source pixels — a
    desynced entropy walk would blow both by orders of magnitude."""
    expect = json.loads((FIXTURES / "codec_expect.json").read_text())
    g = gray_pixels().astype(np.float64)
    got = decode_jpeg_luma((FIXTURES / "codec_libjpeg_gray.jpg").read_bytes())
    assert got.shape == g.shape
    max_err = int(np.abs(got - g).max())
    assert max_err <= expect["jpeg_max_abs_err"], max_err
    md5 = hashlib.md5(np.round(got).astype(np.int64).tobytes()).hexdigest()
    assert md5 == expect["jpeg_decode_md5"]
