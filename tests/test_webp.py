"""VP8L (WebP lossless) codec: round-trips across every transform and
entropy-coding shape, plus honest gates."""

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from traildb_spark.operators.webp import (
    _prefix_decode_extra,
    _prefix_encode_extra,
    _LsbReader,
    _LsbWriter,
    decode_webp,
    make_webp,
)


def _rt(g, **kw):
    enc = make_webp(g, **kw)
    dec = np.round(decode_webp(enc)).astype(np.uint8)
    assert dec.shape == g.shape
    assert (dec == g).all(), kw
    return enc


def test_webp_plain_literals_roundtrip():
    rng = np.random.RandomState(9)
    for _ in range(12):
        h, w = rng.randint(1, 12), rng.randint(1, 12)
        _rt(rng.randint(0, 256, (h, w)).astype(np.uint8))


def test_webp_all_14_predictor_modes():
    rng = np.random.RandomState(13)
    g = rng.randint(0, 256, (9, 13)).astype(np.uint8)
    for mode in range(14):
        _rt(g, predictor_mode=mode, transform_bits=2)
    with pytest.raises(ValueError):
        make_webp(g, predictor_mode=14)


def test_webp_color_and_subtract_green_transforms():
    rng = np.random.RandomState(17)
    g = rng.randint(0, 256, (8, 11)).astype(np.uint8)
    _rt(g, subtract_green=True)
    _rt(g, color_transform=(0x10, 0x20, 0x08))
    # negative-signed multipliers + full stack
    _rt(g, color_transform=(0xF0, 0x85, 0x7F), subtract_green=True,
        predictor_mode=11)


def test_webp_palette_all_bundling_widths():
    rng = np.random.RandomState(19)
    _rt((rng.randint(0, 2, (5, 17)) * 255).astype(np.uint8), palette=True)
    _rt((rng.randint(0, 4, (7, 11)) * 80).astype(np.uint8), palette=True)
    _rt((rng.randint(0, 16, (6, 9)) * 16).astype(np.uint8), palette=True)
    _rt(rng.randint(0, 256, (20, 20)).astype(np.uint8), palette=True)


def test_webp_cache_backrefs_and_meta_groups():
    rng = np.random.RandomState(29)
    g = (rng.randint(0, 8, (15, 15)) * 30).astype(np.uint8)
    for cb in (1, 4, 8, 11):
        _rt(g, cache_bits=cb)
    runny = np.repeat(rng.randint(0, 256, (10, 4)).astype(np.uint8), 7, axis=1)
    n_plain = len(_rt(runny))
    n_lz = len(_rt(runny, use_backrefs=True))
    assert n_lz < n_plain  # LZ77 genuinely compresses runs
    _rt(runny, cache_bits=6, use_backrefs=True)
    big = rng.randint(0, 256, (17, 23)).astype(np.uint8)
    _rt(big, meta_bits=3)
    _rt(big, meta_bits=2, cache_bits=5, use_backrefs=True,
        subtract_green=True, predictor_mode=7)


def test_webp_prefix_value_coding_inverse():
    """The LZ77 length/distance prefix coding: exhaustive encode→decode
    identity over 1..5000."""
    for v in range(1, 5001):
        code, ev, eb = _prefix_encode_extra(v)
        w = _LsbWriter()
        w.write(ev, eb)
        r = _LsbReader(w.bytes() or b"\x00")
        assert _prefix_decode_extra(r, code) == v


def test_webp_gates():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    good = make_webp(g)
    with pytest.raises(ValueError):  # not RIFF/WEBP
        decode_webp(b"RIFX" + good[4:])
    with pytest.raises(ValueError):  # lossy VP8 is another decoder
        decode_webp(good[:12] + b"VP8 " + good[16:])
    with pytest.raises(ValueError):  # truncated stream
        decode_webp(good[:30])
    bad = bytearray(good)
    bad[20] = 0x2E  # VP8L signature byte
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))


def test_webp_through_gray_pixels_dispatch(spark):
    """RIFF/WEBP payloads route through _gray_pixels and
    image_luma_stats alongside the other containers; dims parse from
    the VP8L header."""
    from traildb_spark.operators.multimodal import (
        decode_image_size, image_luma_stats, sniff_container,
    )

    g = (np.arange(35, dtype=np.uint8) * 7 % 256).reshape(5, 7)
    payload = make_webp(g, subtract_green=True)
    assert sniff_container(payload) == "webp"
    assert decode_image_size(payload) == (7, 5)
    rows = [(1, "image", bytearray(payload), "x/image", "{}")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary,"
        " mime string, meta string")
    r = image_luma_stats(df).collect()[0]
    assert (r.width, r.height) == (7, 5)
    assert r.luma_sum == int(g.astype(np.int64).sum())


def test_webp_subimage_color_cache_bit_spec_stream():
    """RFC 9649 §5 grammar: EVERY entropy-coded image — transform
    sub-images included — starts with color-cache-info. This stream is
    hand-built bit by bit from the spec (not via make_webp), with a
    predictor sub-image that DECLARES a color cache; a decoder that
    only reads the cache flag at level 0 desyncs by 5 bits here."""
    w = _LsbWriter()
    w.write(0x2F, 8)            # VP8L signature
    w.write(1, 14)              # width - 1  (w = 2)
    w.write(0, 14)              # height - 1 (h = 1)
    w.write(0, 1)               # alpha hint
    w.write(0, 3)               # version
    w.write(1, 1)               # transform present
    w.write(0, 2)               # PREDICTOR transform
    w.write(0, 3)               # size_bits - 2 => block bits = 2 (1x1 modes)
    # --- predictor sub-image (entropy-coded image, NOT level 0) ---
    w.write(1, 1)               # color-cache-info: present  <-- the crux
    w.write(1, 4)               # cache_bits = 1
    for _ in range(3):          # green/red/blue: simple code, 1 symbol = 0
        w.write(1, 1); w.write(0, 1); w.write(0, 1); w.write(0, 1)
    w.write(1, 1); w.write(0, 1); w.write(1, 1); w.write(255, 8)  # alpha=255
    w.write(1, 1); w.write(0, 1); w.write(0, 1); w.write(0, 1)    # dist
    # single-symbol codes read 0 bits: sub-image pixel = 0xFF000000 (mode 0)
    w.write(0, 1)               # end of transforms
    # --- main image (level 0) ---
    w.write(0, 1)               # no color cache
    w.write(0, 1)               # no meta-prefix image
    for _ in range(3):          # green/red/blue: simple, 2 symbols {0, 42}
        w.write(1, 1); w.write(1, 1); w.write(0, 1)
        w.write(0, 1); w.write(42, 8)
    w.write(1, 1); w.write(0, 1); w.write(0, 1); w.write(0, 1)    # alpha=0
    w.write(1, 1); w.write(0, 1); w.write(0, 1); w.write(0, 1)    # dist
    # pixel 1: residual (a=0, r=42, g=42, b=42): canonical code for 42 is 1
    w.write(1, 1); w.write(1, 1); w.write(1, 1)
    # pixel 2: residual 0 -> inherits pixel 1 via row-0 L prediction
    w.write(0, 1); w.write(0, 1); w.write(0, 1)
    payload = w.bytes()
    pad = b"\x00" if len(payload) % 2 else b""
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload + pad
    riff = b"WEBP" + vp8l
    content = b"RIFF" + struct.pack("<I", len(riff)) + riff
    out = np.round(decode_webp(content)).astype(np.uint8)
    assert out.shape == (1, 2)
    assert (out == 42).all()


def test_webp_subimage_cache_roundtrip_all_transforms():
    """Encoder and decoder agree on the per-sub-image cache flag across
    the transform stack (each sub-image now costs one extra 0 bit)."""
    rng = np.random.RandomState(23)
    g = rng.randint(0, 256, (9, 13)).astype(np.uint8)
    _rt(g, predictor_mode=7, transform_bits=3)
    _rt(g, color_transform=(0x10, 0x20, 0x08))
    _rt((rng.randint(0, 16, (6, 9)) * 16).astype(np.uint8), palette=True)
    _rt(g, meta_bits=2, cache_bits=3)


def test_webp_riff_chunk_size_excludes_pad_byte():
    """RIFF chunk sizes must exclude the odd-length pad byte; the pad
    still counts toward the outer RIFF size."""
    import struct as _s
    seen_odd = False
    for n in range(1, 12):
        content = make_webp(np.arange(n, dtype=np.uint8).reshape(1, n))
        (riff_size,) = _s.unpack("<I", content[4:8])
        (clen,) = _s.unpack("<I", content[16:20])
        assert len(content) == 8 + riff_size
        assert len(content) == 20 + clen + (clen % 2)
        assert len(content) % 2 == 0
        if clen % 2:
            seen_odd = True
        dec = np.round(decode_webp(content)).astype(np.uint8)
        assert (dec == np.arange(n, dtype=np.uint8)).all()
    assert seen_odd, "no odd-length payload exercised the pad path"


def test_decode_real_libwebp_stream():
    """Byte-exact decode of a stream captured from ACTUAL libwebp
    (libwebp.so.7 via ctypes — tools/capture_libwebp_fixture.py), the
    gold fixture the hand-built spec streams stood in for. This caught
    a real conformance bug: our kCodeLengthCodeOrder had 16 at the end
    instead of position 8 (RFC 9649 §6.2.2) — self-consistent with our
    own encoder, desynced on any libwebp stream transmitting more than
    8 code-length codes. Pixels regenerate from the capture formula, so
    libwebp is NOT needed at test time."""
    import numpy as np

    from traildb_spark.operators.webp import decode_webp

    sys_path = str(Path(__file__).resolve().parent.parent)
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from tools.capture_libwebp_fixture import (
        _luma,
        fixture_pixels,
        palette_pixels,
        rgba_pixels,
    )

    cases = [
        ("libwebp_lossless.webp", fixture_pixels()),   # predictor+SG
        ("libwebp_palette.webp", palette_pixels()),    # color-indexing
        ("libwebp_rgba.webp", rgba_pixels()),          # real alpha code
    ]
    for name, img in cases:
        blob = (Path(__file__).parent / "fixtures" / name).read_bytes()
        got = decode_webp(blob)
        assert got.shape == img.shape[:2], name
        assert np.array_equal(got, _luma(img)), name
