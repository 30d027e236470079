"""VP8L (WebP lossless) codec: round-trips across every transform and
entropy-coding shape, plus honest gates."""

import struct

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
