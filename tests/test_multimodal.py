"""Multimodal binary-column plumbing: schemas, mapInPandas batch contract,
frame-sample explode shape. Decode kernels are deterministic stubs (libs not
in the container) — the Spark-side contract is what's under test."""

import pyspark.sql.functions as F
import pytest

from traildb_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    import numpy as np

    # real 17x2 grayscale PNG: closed-form size 2*(17+1) + 68 = 104 bytes
    png = multimodal.make_png(
        (np.arange(2 * 17, dtype=np.uint64) % 256).reshape(2, 17).astype("uint8")
    )
    rows = [
        (1, "image", png, "image/png", '{"source":"cam1"}'),
        (2, "image", b"\xff\xd8JPEG" + b"y" * 50, "image/jpeg", '{"source":"cam2"}'),
        (3, "video", b"z" * 3000, "video/mp4", '{"source":"cam1"}'),
        (4, "audio", b"a" * 10, "audio/wav", None),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_media_metadata_no_payload_read(media):
    out = multimodal.media_metadata(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 104
    assert by_id[1]["meta_source"] == "cam1"
    assert by_id[4]["meta_source"] is None


def test_extract_image_features_schema_and_determinism(media):
    out = multimodal.extract_image_features(media)
    assert out.schema == multimodal.IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}  # only kind='image'
    r1 = rows[1]
    assert r1["n_bytes"] == 104 and (r1["width"], r1["height"]) == (17, 2)
    assert len(r1["features"]) == 8
    # deterministic: second run identical
    again = {r["media_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert again[1]["phash"] == r1["phash"]


def test_sample_video_frames_shape(media):
    out = multimodal.sample_video_frames(media, every_n=1).collect()
    assert all(r["frame_idx"] >= 0 for r in out)
    # 3000 bytes -> ceil contract: (3000/1024)+1 = 3 frames at every_n=1
    assert len(out) == 3
    assert {r["media_id"] for r in out} == {3}


def test_png_roundtrip_and_size_formula():
    import numpy as np

    from traildb_spark.operators.multimodal import (
        _gray_pixels,
        decode_image_size,
        make_png,
    )

    g = (np.arange(11 * 17, dtype=np.uint64) * 37 % 256).reshape(11, 17).astype("uint8")
    png = make_png(g)
    assert decode_image_size(png) == (17, 11)
    assert len(png) == 11 * (17 + 1) + 68  # closed form the SQL oracle uses
    back = _gray_pixels(png)
    assert back.shape == (11, 17)
    assert (back == g).all()


def test_png_unfilter_all_filters():
    """Decode a PNG whose scanlines use Sub/Up/Average/Paeth (written via
    zlib level 9 through our encoder won't exercise them, so build raw
    scanlines by hand and wrap in chunks)."""
    import struct
    import zlib

    import numpy as np

    from traildb_spark.operators.multimodal import _gray_pixels, _PNG_SIG

    w, h = 6, 5
    rows = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 7
    # filter each row differently: None, Sub, Up, Average, Paeth
    enc = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y].astype(np.int32)
        line = np.zeros(w, dtype=np.int32)
        for x in range(w):
            a = cur[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        enc.append(f)
        enc.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(enc), 9))
        + chunk(b"IEND", b"")
    )
    assert (_gray_pixels(png) == rows).all()


def test_jpeg_and_gif_header_parse():
    import struct

    from traildb_spark.operators.multimodal import decode_image_size

    # minimal JPEG: SOI, APP0 segment, SOF0 with height=33 width=97
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 33, 97) + b"\x01\x11\x00"
    jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert decode_image_size(jpeg) == (97, 33)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    assert decode_image_size(gif) == (12, 34)
    with pytest.raises(ValueError):
        decode_image_size(b"not an image at all")


def test_phash_perceptual_properties():
    import numpy as np

    from traildb_spark.operators.multimodal import phash64

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(64, 64)).astype("uint8")
    base = phash64(img)
    assert phash64(img) == base  # deterministic
    # mild noise: small hamming distance
    noised = np.clip(img.astype(int) + rng.randint(-8, 9, img.shape), 0, 255)
    d_noise = bin(base ^ phash64(noised)).count("1")
    assert d_noise <= 10
    # unrelated image: large distance
    other = rng.randint(0, 256, size=(64, 64)).astype("uint8")
    d_other = bin(base ^ phash64(other)).count("1")
    assert d_other >= 16
    # constant image: all AC coefficients zero -> hash 0
    assert phash64(np.full((40, 40), 7, dtype="uint8")) == 0


def test_extract_image_features_real_png(spark):
    import numpy as np

    from traildb_spark.operators import multimodal

    g1 = (np.arange(24 * 24, dtype=np.uint64) % 256).reshape(24, 24).astype("uint8")
    rows = [
        (1, "image", multimodal.make_png(g1), "image/png", None),
        (2, "image", b"\xff\xd8garbage", "image/jpeg", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert (out[1]["width"], out[1]["height"]) == (24, 24)
    assert out[1]["phash"] == multimodal.phash64(g1)
    assert abs(sum(out[1]["features"]) - 1.0) < 1e-6  # luma histogram sums to 1
    # undecodable container: dimensions surfaced as -1, content-hash fallback
    assert (out[2]["width"], out[2]["height"]) == (-1, -1)
    assert out[2]["phash"] != 0


def test_extract_image_features_survives_malformed_payloads(spark):
    """One bit-flipped image must never abort the job: truncated JPEG SOF
    (struct.error), corrupt PNG IDAT (zlib.error), and a truncated IHDR
    all fall back to (-1, -1) + content hash instead of raising."""
    import struct
    import zlib

    import numpy as np

    from traildb_spark.operators import multimodal

    good = multimodal.make_png(np.zeros((9, 9), dtype="uint8"))
    # corrupt the IDAT payload bytes of a valid PNG (zlib.error on inflate)
    bad_idat = bytearray(good)
    bad_idat[41:49] = b"\x00" * 8
    rows = [
        (1, "image", b"\xff\xd8\xff\xc0\x00\x11\x08", "image/jpeg", None),  # truncated SOF
        (2, "image", bytes(bad_idat), "image/png", None),
        (3, "image", good[:20], "image/png", None),  # truncated IHDR
        (4, "image", good, "image/png", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert len(out) == 4
    assert (out[1]["width"], out[1]["height"]) == (-1, -1)
    assert (out[2]["width"], out[2]["height"]) == (9, 9)  # header parses
    assert out[2]["phash"] != 0  # pixels don't: content-hash fallback
    assert (out[4]["width"], out[4]["height"]) == (9, 9)
