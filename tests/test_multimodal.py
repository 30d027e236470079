"""Multimodal binary-column plumbing + the real pure-python codecs:
PNG pixel decode, baseline JPEG encode/decode, WAV PCM, Y4M video.
Schemas, mapInPandas batch contracts, and the decode kernels themselves
(round-trip, error bounds, honest gates) are all under test."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from traildb_spark.operators import jpeg, multimodal


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


def test_wav_roundtrip_and_size_formula():
    import numpy as np

    from traildb_spark.operators.multimodal import decode_wav, make_wav

    s = (np.arange(100) * 321 % 2048 - 1024).astype("int16")
    wav = make_wav(s, 16000)
    assert len(wav) == 44 + 2 * 100  # closed-form size for the oracle
    rate, channels, back = decode_wav(wav)
    assert (rate, channels) == (16000, 1)
    assert np.array_equal(back, s)


def test_decode_wav_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest as _pytest

    from traildb_spark.operators.multimodal import decode_wav, make_wav

    with _pytest.raises(ValueError):
        decode_wav(b"ID3\x03mp3 payload")
    # a perceptual-codec tag (ADPCM=2) is out of scope, surfaced as
    # ValueError; integer widths and G.711 now decode for real
    wav = bytearray(make_wav(np.zeros(4, dtype="int16"), 8000))
    wav[20:22] = struct.pack("<H", 2)
    with _pytest.raises(ValueError):
        decode_wav(bytes(wav))


def test_extract_audio_features_stats(spark):
    import numpy as np

    from traildb_spark.operators import multimodal

    s = np.array([1000, -1000, 1000, -1000, 0, 500], dtype="int16")
    rows = [
        (1, "audio", multimodal.make_wav(s, 8000), "audio/wav", None),
        (2, "audio", b"OggS not a wav", "audio/ogg", None),
        (3, "image", b"not audio", "image/png", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.extract_audio_features(media).collect()}
    assert set(out) == {1, 2}  # only kind='audio'
    r1 = out[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_samples"]) == (8000, 1, 6)
    assert r1["duration_ms"] == 6 * 1000 // 8000
    assert r1["zcr"] == 3  # strict sign flips; the 0 sample breaks the run
    assert r1["peak"] == 1000
    expected_rms = float(np.sqrt((s.astype("int64") ** 2).sum() / 6))
    assert abs(r1["rms"] - expected_rms) < 1e-9
    # undecodable codec: surfaced, not fatal; rms is a true NULL (silence
    # is a legitimate 0.0)
    assert out[2]["sample_rate"] == -1
    assert out[2]["rms"] is None


def test_resize_images_box_and_nearest(spark):
    import numpy as np

    from traildb_spark.operators import multimodal

    g = (np.arange(16 * 16, dtype=np.int64) % 256).reshape(16, 16).astype("uint8")
    rows = [
        (1, "image", multimodal.make_png(g), "image/png", None),
        (2, "image", b"\xff\xd8 jpeg no pixels", "image/jpeg", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)

    box = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 8).collect()}
    r1 = box[1]
    assert (r1["width"], r1["height"]) == (8, 8)
    assert len(r1["content"]) == 8 * (8 + 1) + 68  # closed-form resized PNG size
    # box downscale of a 2x2 block = floor of the block mean
    back = multimodal._gray_pixels(bytes(r1["content"]))
    blk = g.astype(np.float64).reshape(8, 2, 8, 2).mean(axis=(1, 3))
    assert np.array_equal(back, np.floor(blk))
    assert abs(r1["mean_luma"] - np.floor(blk).mean()) < 1e-9
    # pixel-less container -> surfaced as -1/NULL, job survives
    assert box[2]["width"] == -1 and box[2]["content"] is None

    near = {r["media_id"]: r for r in multimodal.resize_images(media, 4, 4, method="nearest").collect()}
    iy = (np.arange(4) * 16) // 4
    back_n = multimodal._gray_pixels(bytes(near[1]["content"]))
    assert np.array_equal(back_n, g[np.ix_(iy, iy)].astype(np.float64))


def test_decode_wav_stereo_duration_and_bad_fmt():
    import struct

    import numpy as np
    import pytest as _pytest

    from traildb_spark.operators.multimodal import decode_wav, make_wav

    # hand-build a stereo 16-bit PCM WAV: 4 frames @ 8000 Hz, interleaved
    frames = np.array([[100, -100], [200, -200], [300, -300], [400, -400]], dtype="<i2")
    data = frames.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, channels, s = decode_wav(wav)
    assert (rate, channels, s.size) == (8000, 2, 8)
    # zero channels must raise ValueError (a caught DECODE_ERRORS member),
    # never ZeroDivisionError downstream
    bad = bytearray(make_wav(np.zeros(4, dtype="int16"), 8000))
    bad[22:24] = struct.pack("<H", 0)
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_extract_audio_features_stereo_duration(spark):
    import struct

    import numpy as np

    from traildb_spark.operators import multimodal

    frames = np.tile(np.array([[1000, -1000]], dtype="<i2"), (8000, 1))  # 1s stereo
    data = frames.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    media = spark.createDataFrame(
        [(1, "audio", wav, "audio/wav", None)], schema=multimodal.MEDIA_SCHEMA
    )
    r = multimodal.extract_audio_features(media).first()
    assert r["channels"] == 2 and r["n_samples"] == 16000
    assert r["duration_ms"] == 1000  # frames / rate, NOT samples / rate


def test_decode_image_size_rejects_non_ihdr_first_png():
    """A valid-signature PNG whose first chunk is not IHDR (CgBI-style)
    must raise, not return garbage dims read from the wrong chunk."""
    import struct

    import numpy as np
    import pytest as _pytest

    from traildb_spark.operators import multimodal

    good = multimodal.make_png(np.zeros((4, 4), dtype="uint8"))
    cgbi = bytearray(good)
    cgbi[12:16] = b"CgBI"  # signature intact, leading chunk is not IHDR
    with _pytest.raises(ValueError):
        multimodal.decode_image_size(bytes(cgbi))
    # normal PNG still parses
    assert multimodal.decode_image_size(good) == (4, 4)


def test_gray_pixels_bounded_inflate():
    """Oversized IDAT output must surface as ValueError after at most
    expected+1 inflated bytes — never a full decompression-bomb alloc."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from traildb_spark.operators.multimodal import _PNG_SIG, _gray_pixels

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # header claims 2x2 gray, IDAT inflates to 1 MiB of zeros
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * (1 << 20), 9)
    ) + chunk(b"IEND", b"")
    with _pytest.raises(ValueError):
        _gray_pixels(bomb)


def test_phash_neardup_pairs(spark):
    """Noised copies of an image collide at small Hamming distance; an
    unrelated image does not pair with anything."""
    import numpy as np

    from traildb_spark.operators import multimodal

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(48, 48)).astype("uint8")
    noised = np.clip(img.astype(int) + rng.randint(-6, 7, img.shape), 0, 255).astype("uint8")
    other = rng.randint(0, 256, size=(48, 48)).astype("uint8")
    rows = [
        (1, "image", multimodal.make_png(img), "image/png", None),
        (2, "image", multimodal.make_png(noised), "image/png", None),
        (3, "image", multimodal.make_png(other), "image/png", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_image_features(media)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in multimodal.phash_neardup_pairs(feats, max_hamming=10).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert not any(3 in p for p in pairs)


def test_y4m_roundtrip_all_colorspaces(spark):
    """Encode→decode round-trip fuzz over EVERY colorspace the YUV4MPEG2
    spec names (Cmono, the C420 siting variants, C411, C422, C444,
    C444alpha) across random shapes/frame counts: every stored plane
    must come back bit-identical, luma-only default return included."""
    import numpy as np
    from traildb_spark.operators import multimodal as M

    rng = np.random.default_rng(7)
    cases = {
        "Cmono": None, "C420": (2, 2), "C420jpeg": (2, 2),
        "C420paldv": (2, 2), "C420mpeg2": (2, 2), "C422": (2, 1),
        "C411": (4, 1), "C444": (1, 1), "C444alpha": (1, 1),
    }
    for cs, sub in cases.items():
        for _ in range(3):
            if sub is None:
                w, h = int(rng.integers(1, 9)), int(rng.integers(1, 7))
            else:
                sx, sy = sub
                w, h = sx * int(rng.integers(1, 5)), sy * int(rng.integers(1, 4))
            n = int(rng.integers(1, 4))
            y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
            kw = {}
            if sub is not None:
                cw, ch = w // sub[0], h // sub[1]
                kw["cb"] = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
                kw["cr"] = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
            if cs == "C444alpha":
                kw["alpha"] = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
            b = M.make_y4m(y, fps=30, colorspace=cs, **kw)
            w2, h2, back = M.decode_y4m(b)  # luma-only default
            assert (w2, h2) == (w, h) and np.array_equal(back, y), cs
            w3, h3, cs3, y3, cb3, cr3, a3 = M.decode_y4m(b, planes=True)
            assert (w3, h3, cs3) == (w, h, cs)
            assert np.array_equal(y3, y)
            if sub is None:
                assert cb3 is None and cr3 is None
            else:
                assert np.array_equal(cb3, kw["cb"])
                assert np.array_equal(cr3, kw["cr"])
            if cs == "C444alpha":
                assert np.array_equal(a3, kw["alpha"])
            else:
                assert a3 is None
            # truncation anywhere in the LAST frame's plane set raises
            import pytest as _pytest
            with _pytest.raises(ValueError):
                M.decode_y4m(b[: len(b) - 1])

    import pytest as _pytest
    with _pytest.raises(ValueError):
        M.decode_y4m(b"RIFFxxxx")
    # odd dims are undefined under 2x2 subsampling
    with _pytest.raises(ValueError):
        M.decode_y4m(b"YUV4MPEG2 W3 H2 F25:1 Ip A1:1 C420\nFRAME\n" + bytes(9))
    # unknown colorspace: ValueError (sentinel path), never silent garbage
    with _pytest.raises(ValueError):
        M.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C999\nFRAME\n" + bytes(6))
    # encoder refuses mismatched plane shapes / planes Cmono can't carry
    y = np.zeros((1, 2, 2), np.uint8)
    with _pytest.raises(ValueError):
        M.make_y4m(y, colorspace="Cmono", cb=y, cr=y)
    with _pytest.raises(ValueError):
        M.make_y4m(y, colorspace="C420", cb=np.zeros((1, 2, 2), np.uint8),
                   cr=np.zeros((1, 1, 1), np.uint8))
    # header-default colorspace is C420 per spec when the C tag is absent
    dflt = b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(range(6))
    w4, h4, cs4, y4, cb4, cr4, _ = M.decode_y4m(dflt, planes=True)
    assert cs4 == "C420" and int(cb4[0, 0, 0]) == 4 and int(cr4[0, 0, 0]) == 5


def test_extract_video_chroma_stats(spark):
    """extract_video_chroma proves the chroma planes are READ, not just
    strided past: exact Cb/Cr sums for a C420 stream, NULL chroma for
    Cmono, sentinel row for a corrupt payload."""
    import numpy as np
    from traildb_spark.operators import multimodal as M

    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (3, 4, 6), dtype=np.uint8)
    cb = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    cr = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    c420 = M.make_y4m(y, colorspace="C420", cb=cb, cr=cr)
    mono = M.make_y4m(np.full((2, 2, 2), 9, np.uint8))
    rows = [
        (1, "video", bytearray(c420), "video/y4m", None),
        (2, "video", bytearray(mono), "video/y4m", None),
        (3, "video", bytearray(b"garbage"), "video/y4m", None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in M.extract_video_chroma(df, every_n=2).collect()
    }
    assert set(got) == {(1, 0), (1, 2), (2, 0), (3, -1)}
    for i in (0, 2):
        r = got[(1, i)]
        assert r["colorspace"] == "C420" and (r["width"], r["height"]) == (6, 4)
        assert r["luma_sum"] == int(y[i].astype(np.int64).sum())
        assert r["cb_sum"] == int(cb[i].astype(np.int64).sum())
        assert r["cr_sum"] == int(cr[i].astype(np.int64).sum())
    m = got[(2, 0)]
    assert m["colorspace"] == "Cmono" and m["cb_sum"] is None and m["cr_sum"] is None
    assert got[(3, -1)]["colorspace"] is None


def test_extract_video_frames_stride(spark):
    import numpy as np
    from traildb_spark.operators import multimodal as M

    fr = np.stack([np.full((2, 3), v, np.uint8) for v in (10, 20, 30, 40, 50)])
    rows = [(1, "video", bytearray(M.make_y4m(fr)), "x/video", None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {
        r["frame_idx"]: (r["n_frames"], r["luma_sum"], r["luma_max"])
        for r in M.extract_video_frames(df, every_n=2).collect()
    }
    assert set(got) == {0, 2, 4}
    assert got[0] == (5, 60, 10) and got[4] == (5, 300, 50)


# --------------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py)
# --------------------------------------------------------------------------


def test_jpeg_roundtrip_error_bounds():
    """Encode→decode at several shapes/qualities: shape preserved, error
    bounded and monotone-ish in quality (the codec is lossy by contract,
    never structurally wrong)."""
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (16, 24), (33, 41), (7, 5), (64, 40)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        out = jpeg.decode_jpeg_luma(jpeg.make_jpeg(g, 95))
        assert out.shape == shape
        rmse = float(np.sqrt(((out - g) ** 2).mean()))
        assert rmse < 8.0, (shape, rmse)
    # smooth content: high quality must beat low quality clearly
    yy, xx = np.mgrid[0:32, 0:48]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    e95 = float(np.abs(jpeg.decode_jpeg_luma(jpeg.make_jpeg(smooth, 95)) - smooth).mean())
    e20 = float(np.abs(jpeg.decode_jpeg_luma(jpeg.make_jpeg(smooth, 20)) - smooth).mean())
    assert e95 < e20


def test_jpeg_flat_blocks_exact_at_q100():
    """The q104 oracle contract: block-flat bitmaps survive quality-100
    encode/decode bit-exactly (flat tile ⇒ DC-only DCT ⇒ quant 1 exact)."""
    for doc_id in (0, 3, 6, 9, 12, 33):
        hb, wb = 1 + doc_id % 2, 1 + doc_id % 3
        by, bx = np.mgrid[0:hb, 0:wb]
        tiles = ((by * 31 + bx * 17 + doc_id) % 256).astype(np.uint8)
        canvas = np.kron(tiles, np.ones((8, 8), np.uint8))
        out = np.round(jpeg.decode_jpeg_luma(jpeg.make_jpeg(canvas, 100)))
        assert np.array_equal(out, canvas)


def test_jpeg_color_and_subsampling_luma():
    """RGB encodes decode to the BT.601 luma plane for both 4:4:4 and
    4:2:0 — chroma blocks are entropy-decoded (stream advances correctly)
    but never pollute the luma output."""
    rng = np.random.default_rng(11)
    c = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    y = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    for sub in ("444", "420"):
        out = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(c, 90, subsampling=sub))
        assert out.shape == (24, 31)
        assert float(np.abs(out - y).mean()) < 6.0


def test_jpeg_restart_markers():
    """DRI/RSTn bitstreams decode identically to the unrestarted encode
    (predictors reset, pad bits discarded, markers consumed)."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    with_rst = jpeg.encode_jpeg(g, 85, restart_interval=3)
    without = jpeg.encode_jpeg(g, 85)
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert np.array_equal(
        jpeg.decode_jpeg_luma(with_rst), jpeg.decode_jpeg_luma(without)
    )


def test_jpeg_honest_gates_and_corruption():
    """Unsupported frame types (lossless/arithmetic) and malformed
    streams raise DECODE_ERRORS members — one bad payload degrades to a
    sentinel row, never a failed task."""
    g = np.full((16, 16), 128, np.uint8)
    good = jpeg.make_jpeg(g, 90)
    # SOF3 (lossless) and SOF9 (arithmetic) stay honest gates
    for sof in (b"\xff\xc3", b"\xff\xc9"):
        with pytest.raises(ValueError, match="sequential"):
            jpeg.decode_jpeg_luma(good.replace(b"\xff\xc0", sof, 1))
    # a sequential stream mislabeled SOF2 has an illegal progressive
    # scan header (interleaved full-band) — rejected, not misdecoded
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_luma(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_luma(b"\xff\xd8\xff\xd9")  # no frame at all
    with pytest.raises(multimodal.DECODE_ERRORS):
        jpeg.decode_jpeg_luma(good[: len(good) // 2])  # truncated entropy data
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_luma(b"not a jpeg")


def test_jpeg_progressive_equals_sequential():
    """Progressive encode→decode is BIT-IDENTICAL to sequential for the
    same input and quality (both carry the same quantized coefficients;
    any scan-machinery disagreement surfaces as a pixel diff): DC coarse
    + DC refinement + per-component AC first/refinement scans, grayscale
    and color, 4:4:4 and 4:2:0, odd shapes."""
    rng = np.random.default_rng(9)
    for shape, q in [((16, 16), 90), ((33, 41), 95), ((8, 8), 50),
                     ((40, 56), 100), ((7, 5), 80)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        seq = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(g, q))
        prog = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(g, q, progressive=True))
        assert np.array_equal(seq, prog), (shape, q)
    c = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        seq = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(c, 90, subsampling=sub))
        prog = jpeg.decode_jpeg_luma(
            jpeg.encode_jpeg(c, 90, subsampling=sub, progressive=True)
        )
        assert np.array_equal(seq, prog), sub


def test_jpeg_progressive_eob_runs_and_sparse_blocks():
    """A mostly-flat image with isolated detail forces multi-block EOB
    runs (EOBn, r > 0) and long zero-history runs in the refinement scan
    — the progressive paths a dense random image never exercises."""
    g = np.full((64, 64), 100, np.uint8)
    g[5, 7] = 240   # one detailed block among many flat ones
    g[40:44, 40:44] = 30
    for q in (85, 50):
        seq = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(g, q))
        prog = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(g, q, progressive=True))
        assert np.array_equal(seq, prog), q
    # and through the multimodal layer: progressive payloads now decode
    gray = multimodal._gray_pixels(jpeg.encode_jpeg(g, 90, progressive=True))
    assert gray.shape == (64, 64)


def test_jpeg_phash_is_perceptual_across_containers():
    """The same bitmap through PNG (lossless) and JPEG q95 (lossy) must
    land within a few pHash bits — the retired byte-content fallback
    would differ by ~32 — while an unrelated image stays far."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    other = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    ph_png = multimodal.phash64(multimodal._gray_pixels(multimodal.make_png(base)))
    ph_jpg = multimodal.phash64(multimodal._gray_pixels(jpeg.make_jpeg(base, 95)))
    ph_other = multimodal.phash64(other.astype(np.float64))
    assert bin(ph_png ^ ph_jpg).count("1") <= 8
    assert bin(ph_png ^ ph_other).count("1") >= 16


def test_image_luma_stats_operator(spark):
    """image_luma_stats over a mixed PNG/JPEG/corrupt media table: exact
    integers for both real codecs, -1 sentinels for the rest."""
    tiles = np.array([[10, 250], [100, 37]], np.uint8)
    canvas = np.kron(tiles, np.ones((8, 8), np.uint8))
    png_img = (np.arange(4 * 6) % 256).astype(np.uint8).reshape(4, 6)
    rows = [
        (1, "image", bytearray(jpeg.make_jpeg(canvas, 100)), "image/jpeg", None),
        (2, "image", bytearray(multimodal.make_png(png_img)), "image/png", None),
        (3, "image", b"garbage", "image/gif", None),
        (4, "audio", b"skipped", "audio/wav", None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.image_luma_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert (r1["width"], r1["height"]) == (16, 16)
    assert r1["luma_sum"] == 64 * int(tiles.sum())
    assert (r1["luma_min"], r1["luma_max"]) == (10, 250)
    r2 = got[2]
    assert (r2["width"], r2["height"]) == (6, 4)
    assert r2["luma_sum"] == int(png_img.sum())
    assert got[3]["width"] == -1 and got[3]["luma_sum"] == -1


def test_resize_and_features_decode_jpeg_payloads(spark):
    """resize_images and extract_image_features now decode JPEG payloads
    for real (r3's biggest honest gate): dimensions from the header,
    pHash/histogram/resize from actual pixels."""
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    rows = [(1, "image", bytearray(jpeg.make_jpeg(g, 95)), "image/jpeg", None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_image_features(df).collect()[0]
    assert (feat["width"], feat["height"]) == (40, 32)
    expected_ph = multimodal.phash64(jpeg.decode_jpeg_luma(bytes(rows[0][2])))
    assert feat["phash"] == expected_ph
    rz = multimodal.resize_images(df, 8, 8, method="box").collect()[0]
    assert (rz["width"], rz["height"]) == (8, 8)
    assert rz["content"] is not None and rz["mean_luma"] is not None
    # the resized mean tracks the source mean within quantization error
    assert abs(rz["mean_luma"] - float(g.mean())) < 8.0


# --------------------------------------------------------------------------
# GIF codec (operators/gif.py)
# --------------------------------------------------------------------------


def test_gif_roundtrip_exact():
    """GIF is lossless: encode→decode is the identity on (palette,
    indices) across shapes and palette sizes, including images large
    enough to force LZW table rebuilds (the 4096-code clear path)."""
    from traildb_spark.operators import gif

    rng = np.random.default_rng(1)
    for shape, ncol in [((1, 1), 2), ((7, 5), 4), ((33, 41), 16), ((128, 100), 256)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, shape, dtype=np.uint8)
        p2, i2 = gif.decode_gif_indices(gif.make_gif(idx, pal))
        assert np.array_equal(i2, idx) and np.array_equal(p2[:ncol], pal)


def test_gif_interlace_and_luma():
    from traildb_spark.operators import gif

    rng = np.random.default_rng(2)
    idx = rng.integers(0, 8, (21, 13), dtype=np.uint8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    _, i2 = gif.decode_gif_indices(gif.make_gif(idx, pal, interlace=True))
    assert np.array_equal(i2, idx)
    # gray palette → luma equals the palette value exactly
    gray = np.stack([np.arange(0, 256, 16, dtype=np.uint8)] * 3, axis=1)
    gidx = rng.integers(0, 16, (9, 11), dtype=np.uint8)
    lum = np.round(gif.decode_gif_luma(gif.make_gif(gidx, gray)))
    assert np.array_equal(lum, gray[gidx][:, :, 0])


def test_gif_gray_pixels_and_features(spark):
    """_gray_pixels and the feature extractors decode GIF payloads for
    real now — the content-hash fallback is gone for all three common
    containers (PNG, JPEG, GIF)."""
    from traildb_spark.operators import gif

    pal = np.stack([np.arange(0, 256, 4, dtype=np.uint8)] * 3, axis=1)
    idx = (np.arange(24 * 24) % 64).astype(np.uint8).reshape(24, 24)
    payload = gif.make_gif(idx, pal)
    gray = multimodal._gray_pixels(payload)
    assert gray.shape == (24, 24)
    rows = [(1, "image", bytearray(payload), "image/gif", None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_image_features(df).collect()[0]
    assert (feat["width"], feat["height"]) == (24, 24)
    assert feat["phash"] == multimodal.phash64(gray)
    stats = multimodal.image_luma_stats(df).collect()[0]
    assert stats["luma_sum"] == int(np.round(gray).sum())


def test_gif_corruption_gates():
    from traildb_spark.operators import gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    good = gif.make_gif(np.array([[0, 1], [1, 0]], np.uint8), pal)
    for bad in (b"GIF89a", good[:10], good[:-4], b"GIF89a" + b"\x00" * 20,
                b"not a gif"):
        with pytest.raises(ValueError):
            gif.decode_gif_indices(bad)
    with pytest.raises(ValueError):
        gif.make_gif(np.array([[5]], np.uint8), pal)  # index beyond palette


def test_png_palette_subbyte_and_16bit():
    """The PNG decoder covers the remaining real-corpus shapes: palette
    (PLTE) at 8- and 4-bit, 1-bit grayscale (scaled to 0/255), and
    16-bit gray/RGB (high byte, the spec's own 8-bit reduction); missing
    PLTE and Adam7 raise ValueError."""
    import struct
    import zlib

    from traildb_spark.operators.multimodal import _PNG_SIG, _gray_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(width, height, depth, color, raw, plte=None):
        ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
        body = _PNG_SIG + chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        return body + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)

    def luma(rgb):
        f = rgb.astype(np.float64)
        return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]

    # palette 8-bit
    idx = rng.integers(0, 16, (7, 11), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    assert np.allclose(_gray_pixels(png(11, 7, 8, 3, raw, pal)), luma(pal[idx]))

    # palette 4-bit (2 px/byte, MSB-first)
    idx4 = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    rows = []
    for y in range(5):
        bits = np.unpackbits(idx4[y][:, None], axis=1)[:, 4:].ravel()
        bits = np.concatenate([bits, np.zeros((-len(bits)) % 8, np.uint8)])
        rows.append(b"\x00" + np.packbits(bits).tobytes())
    assert np.allclose(
        _gray_pixels(png(7, 5, 4, 3, b"".join(rows), pal)), luma(pal[idx4])
    )

    # 1-bit grayscale scales to {0, 255}
    bw = rng.integers(0, 2, (6, 10), dtype=np.uint8)
    rows = [
        b"\x00" + np.packbits(
            np.concatenate([bw[y], np.zeros((-10) % 8, np.uint8)])
        ).tobytes()
        for y in range(6)
    ]
    assert np.allclose(_gray_pixels(png(10, 6, 1, 0, b"".join(rows))), bw * 255.0)

    # 16-bit gray and RGB keep the high byte
    g16 = rng.integers(0, 65536, (4, 6), dtype=np.uint16)
    raw = b"".join(b"\x00" + g16[y].byteswap().tobytes() for y in range(4))
    assert np.array_equal(_gray_pixels(png(6, 4, 16, 0, raw)), (g16 >> 8))
    c16 = rng.integers(0, 65536, (3, 5, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + c16[y].byteswap().tobytes() for y in range(3))
    assert np.allclose(_gray_pixels(png(5, 3, 16, 2, raw)), luma(c16 >> 8))

    with pytest.raises(ValueError):  # palette image without PLTE
        _gray_pixels(png(4, 4, 8, 3, b"\x00" * 20))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)  # Adam7
    with pytest.raises(ValueError):
        _gray_pixels(
            _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
        )


def test_wav_format_tags_all_decode_to_int16():
    """decode_wav covers the raw-audio corpus shapes beyond 16-bit PCM:
    8-bit unsigned PCM, 32-bit PCM (high 16 bits), IEEE float32
    (clipped/scaled), G.711 A-law/mu-law (exact ITU table expansion),
    and WAVE_FORMAT_EXTENSIBLE SubFormat resolution; perceptual codecs
    stay an honest ValueError gate."""
    import struct

    from traildb_spark.operators.multimodal import _g711_expand, decode_wav

    def wav(tag, bits, rate, ch, data, extensible=False):
        base = struct.pack(
            "<HHIIHH", 0xFFFE if extensible else tag, ch, rate,
            rate * ch * bits // 8, ch * bits // 8, bits,
        )
        if extensible:
            fmt = base + struct.pack("<HHI", 22, bits, 0xF) + struct.pack("<H", tag) + b"\x00" * 14
        else:
            fmt = base
        return (
            b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, 50, dtype=np.uint8)
    _, _, back = decode_wav(wav(1, 8, 8000, 1, u8.tobytes()))
    assert np.array_equal(back, (u8.astype(np.int16) - 128) << 8)

    i32 = rng.integers(-(2**31), 2**31, 30, dtype=np.int64).astype("<i4")
    _, _, back = decode_wav(wav(1, 32, 44100, 2, i32.tobytes()))
    assert np.array_equal(back, (i32.astype(np.int64) >> 16).astype(np.int16))

    f = (rng.random(40) * 2.2 - 1.1).astype("<f4")  # includes clipping
    _, _, back = decode_wav(wav(3, 32, 16000, 1, f.tobytes()))
    want = np.clip(np.round(f.astype(np.float64) * 32767.0), -32768, 32767)
    assert np.array_equal(back, want.astype(np.int16))

    # G.711 standard fixed points: mu-law code 0xFF is 0, full-scale
    # magnitudes are 32124 (mu) and 32256 (A)
    mu = _g711_expand(bytes(range(256)), alaw=False)
    al = _g711_expand(bytes(range(256)), alaw=True)
    assert mu[255] == 0 and mu.max() == 32124 and mu.min() == -32124
    assert al.max() == 32256 and al.min() == -32256
    _, _, back = decode_wav(wav(7, 8, 8000, 1, bytes(range(256))))
    assert np.array_equal(back, mu)
    _, _, back = decode_wav(wav(6, 8, 8000, 1, bytes(range(256))))
    assert np.array_equal(back, al)

    s = np.arange(-50, 50, dtype=np.int16)
    r, _, back = decode_wav(wav(1, 16, 8000, 1, s.tobytes(), extensible=True))
    assert r == 8000 and np.array_equal(back, s)

    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(wav(2, 4, 8000, 1, b"\x00" * 8))  # ADPCM: honest gate


def test_png_adam7_interlaced():
    """Adam7 decode: the 7 sub-images are independently filtered and
    scattered back — gray, RGB, and palette, including dims < 8 where
    some passes are empty; last PNG gate closed."""
    import struct
    import zlib

    from traildb_spark.operators.multimodal import _PNG_SIG, _gray_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

    def adam7(img, color=0, plte=None):
        h, w = img.shape[:2]
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for y in range(sub.shape[0]):
                raw += b"\x00" + sub[y].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        body = _PNG_SIG + chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        return body + chunk(b"IDAT", zlib.compress(bytes(raw), 6)) + chunk(b"IEND", b"")

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 2), (7, 5), (17, 23)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(_gray_pixels(adam7(g)), g), shape
    c = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    want = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    assert np.allclose(_gray_pixels(adam7(c, color=2)), want)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (11, 6), dtype=np.uint8)
    p = pal[idx].astype(float)
    assert np.allclose(
        _gray_pixels(adam7(idx, color=3, plte=pal)),
        0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2],
    )


def test_ima_adpcm_roundtrip_and_gates():
    """IMA/DVI ADPCM (WAV tag 0x11): the 4:1 compressed codec decodes
    for real — smooth signals round-trip above 25 dB SNR, the header
    predictor is the exact first sample, block padding is benign, and
    corrupt step indices / stereo raise the honest gate."""
    import struct

    from traildb_spark.operators.multimodal import decode_wav, make_adpcm_wav

    t = np.arange(3000)
    sig = (8000 * np.sin(t / 20.0) + 2000 * np.sin(t / 7.0)).astype(np.int16)
    r, ch, back = decode_wav(make_adpcm_wav(sig, 16000))
    assert (r, ch) == (16000, 1) and len(back) >= len(sig)
    assert back[0] == sig[0]
    err = back[: len(sig)].astype(np.int64) - sig.astype(np.int64)
    snr = 10 * np.log10(
        (sig.astype(np.int64) ** 2).mean() / max((err**2).mean(), 1)
    )
    assert snr > 25.0, snr

    bad = bytearray(make_adpcm_wav(np.array([1, 2, 3], np.int16), 8000))
    bad[bad.find(b"data") + 8 + 2] = 200  # step index out of range
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    stereo = bytearray(make_adpcm_wav(sig[:100], 8000))
    fmt_off = stereo.find(b"fmt ") + 8
    stereo[fmt_off + 2 : fmt_off + 4] = struct.pack("<H", 2)  # channels=2
    with pytest.raises(ValueError, match="mono IMA"):
        decode_wav(bytes(stereo))


def test_jpeg_anisotropic_subsampling():
    """4:2:2 and 4:4:0 (one-axis chroma subsampling) exercise the
    decoder's generic Hi x Vi MCU walk — luma identical across all four
    modes, progressive == sequential for the new factors too."""
    rng = np.random.default_rng(21)
    c = rng.integers(0, 256, (23, 29, 3), dtype=np.uint8)
    y = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    for sub in ("444", "420", "422", "440"):
        out = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(c, 90, subsampling=sub))
        assert out.shape == (23, 29)
        assert float(np.abs(out - y).mean()) < 6.0, sub
    for sub in ("422", "440"):
        seq = jpeg.decode_jpeg_luma(jpeg.encode_jpeg(c, 85, subsampling=sub))
        prog = jpeg.decode_jpeg_luma(
            jpeg.encode_jpeg(c, 85, subsampling=sub, progressive=True)
        )
        assert np.array_equal(seq, prog), sub


def test_animated_gif_video_frames(spark):
    """extract_video_frames decodes animated GIFs for real: full-frame
    and patch-composited animations (GIF89a rectangles + GCE) produce
    the frames a viewer would see, with exact integer luma stats; Y4M
    payloads keep working side by side."""
    from traildb_spark.operators import gif

    rng = np.random.default_rng(8)
    pal = np.stack([np.arange(0, 256, 16, dtype=np.uint8)] * 3, axis=1)
    base = rng.integers(0, 16, (10, 12), dtype=np.uint8)
    fr = [base.copy()]
    rects = [(0, 0)]
    for i in range(1, 4):
        nf = fr[-1].copy()
        nf[1:9, i : i + 8] = rng.integers(0, 16, (8, min(8, 12 - i)), np.uint8)
        fr.append(nf)
        rects.append((i, 1))
    frames = np.stack(fr)
    payload = gif.make_animated_gif(frames, pal, rects=rects)
    y4m = multimodal.make_y4m(
        np.stack([np.full((4, 6), v, np.uint8) for v in (10, 20)])
    )
    rows = [
        (1, "video", bytearray(payload), "image/gif", None),
        (2, "video", bytearray(y4m), "video/y4m", None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in multimodal.extract_video_frames(df, every_n=1).collect()
    }
    want_luma = pal[frames][:, :, :, 0].astype(np.int64)
    for i in range(4):
        r = got[(1, i)]
        assert (r["width"], r["height"], r["n_frames"]) == (12, 10, 4)
        assert r["luma_sum"] == int(want_luma[i].sum())
        assert r["luma_max"] == int(want_luma[i].max())
    assert got[(2, 0)]["luma_sum"] == 240 and got[(2, 1)]["luma_sum"] == 480


def test_gif_animation_disposal_and_transparency():
    """GIF89a composition semantics the fixture encoder never emits:
    disposal 2 restores the frame's rectangle to the background color,
    disposal 3 restores the pre-frame canvas, and GCE-transparent patch
    pixels leave the canvas untouched."""
    import struct

    from traildb_spark.operators.gif import _lzw_encode, decode_gif_frames

    def build(frames_spec, sw, sh, pal, bg=0):
        bits = max(1, (pal.shape[0] - 1).bit_length())
        pf = np.zeros((1 << bits, 3), np.uint8)
        pf[: pal.shape[0]] = pal
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), bg, 0)
        out += pf.tobytes()
        mc = max(2, bits)
        for left, top, patch, disp, trans in frames_spec:
            tflag = 1 if trans is not None else 0
            out += b"\x21\xf9\x04" + bytes(
                [(disp << 2) | tflag, 0, 0, trans or 0]
            ) + b"\x00"
            h, w = patch.shape
            out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            out.append(mc)
            data = _lzw_encode(patch, mc)
            for j in range(0, len(data), 255):
                out.append(len(data[j : j + 255]))
                out += data[j : j + 255]
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    pal = np.stack([np.arange(0, 256, 64, dtype=np.uint8)] * 3, axis=1)
    f1 = np.full((4, 6), 1, np.uint8)
    p2 = np.full((2, 2), 3, np.uint8)
    p3 = np.full((1, 1), 2, np.uint8)

    _, _, lum = decode_gif_frames(
        build([(0, 0, f1, 0, None), (2, 1, p2, 2, None), (0, 0, p3, 0, None)], 6, 4, pal)
    )
    lum = np.round(lum).astype(int)
    assert (lum[0] == 64).all()
    assert lum[1][1, 2] == 192 and lum[1][0, 0] == 64
    assert lum[2][1, 2] == 0 and lum[2][2, 3] == 0   # rect -> background
    assert lum[2][0, 0] == 128 and lum[2][3, 5] == 64

    _, _, lum = decode_gif_frames(
        build([(0, 0, f1, 0, None), (2, 1, p2, 3, None), (0, 0, p3, 0, None)], 6, 4, pal)
    )
    lum = np.round(lum).astype(int)
    assert lum[1][1, 2] == 192
    assert lum[2][1, 2] == 64  # restored to the PRE-frame canvas, not bg
    assert lum[2][0, 0] == 128

    pt = np.array([[3, 0], [0, 3]], np.uint8)  # index 0 transparent
    _, _, lum = decode_gif_frames(
        build([(0, 0, f1, 0, None), (1, 1, pt, 0, 0)], 6, 4, pal)
    )
    lum = np.round(lum).astype(int)
    assert lum[1][1, 1] == 192 and lum[1][1, 2] == 64
    assert lum[1][2, 1] == 64 and lum[1][2, 2] == 192


def test_lzw_fast_equals_spec_procedure():
    """The vectorized LZW production path (bulk code extraction + output
    back-references) must agree byte-for-byte with the literal GIF-spec
    table-of-strings procedure on streams that exercise width growth,
    table-full rebuilds (CLEAR), KwKwK, and interlacing — and raise the
    same errors on truncation."""
    import numpy as np
    import pytest as _pytest

    from traildb_spark.operators import gif as G

    def lzw_body(content):
        pos = 13 + 3 * (2 << (content[10] & 7)) + 10
        mcs = content[pos]
        data, _ = G._read_blocks(content, pos + 1)
        return data, mcs

    rng = np.random.default_rng(41)
    for trial in range(24):
        if trial % 6 == 0:  # big enough to force 12-bit codes + rebuild
            h, w = 300, int(rng.integers(200, 400))
        else:
            h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        ncol = int(rng.integers(2, 17))
        if trial % 2:
            idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        else:  # long runs → long back-reference strings
            idx = (
                np.add.outer(np.arange(h) // 7, np.arange(w) // 11) % ncol
            ).astype(np.uint8)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        b = G.make_gif(idx, pal, interlace=bool(trial % 4 == 1))
        data, mcs = lzw_body(b)
        fast = G._lzw_decode(data, mcs, h * w)
        ref = G._lzw_decode_ref(data, mcs, h * w)
        assert np.array_equal(fast, ref) and np.array_equal(
            fast.reshape(-1), G.decode_gif_indices(b)[1].reshape(-1)
            if not (trial % 4 == 1) else fast.reshape(-1)
        )
        if len(data) > 6:
            for f in (G._lzw_decode, G._lzw_decode_ref):
                with _pytest.raises(ValueError):
                    f(data[:3], mcs, h * w)


def test_jpeg_lut_decode_equals_spec_walk():
    """The 16-bit-prefix LUT Huffman decode must agree with the literal
    F.2.2.3 per-bit DECODE walk (_BitReaderSpec) symbol-for-symbol on
    random canonical tables × random bitstreams."""
    import numpy as np

    from traildb_spark.operators import jpeg as J

    rng = np.random.default_rng(17)
    for trial in range(15):
        # random canonical table: random symbol count per length, capped
        # so the kraft sum stays feasible
        nsym = int(rng.integers(4, 40))
        syms = rng.choice(256, nsym, replace=False).tolist()
        # build lengths greedily: kraft-feasible canonical assignment
        bits = [0] * 16
        remaining = nsym
        code_space = 1.0
        for length in range(1, 17):
            if remaining == 0:
                break
            cap = int(code_space * (1 << length)) - (
                0 if length == 16 else 1
            )  # leave room unless last level
            take = min(remaining, max(0, cap), int(rng.integers(0, remaining + 1)) if length < 16 else remaining)
            bits[length - 1] = take
            remaining -= take
            code_space = (code_space - take / (1 << length))
        if remaining:
            continue  # infeasible draw; skip
        _, dec = J._build_canonical(bits, syms)
        # random symbol sequence → encode with the canonical codes
        enc = J._build_canonical(bits, syms)[0]
        seq = rng.choice(syms, 500).tolist()
        bw = J._BitWriter()
        for s in seq:
            code, length = enc[s]
            bw.write(code, length)
        bw.flush()
        data = bytes(bw.out)
        fast = J._BitReader(data, 0)
        spec = J._BitReaderSpec(data, 0)
        for s in seq:
            a = fast.decode(dec)
            b = spec.decode(dec)
            assert a == b == s, f"trial {trial}: {a} {b} {s}"


def test_fast_image_decoder_hook(spark):
    """FAST_IMAGE_DECODER is the single production swap point: when set,
    every image operator routes through it; returning None falls back to
    the built-in codecs per payload; unset restores pure-python."""
    import numpy as np

    from traildb_spark.operators import multimodal as M

    png = M.make_png(np.full((4, 4), 7, np.uint8))
    calls = []

    def fake(content):
        calls.append(len(content))
        if len(calls) == 1:
            return None  # first call falls back to the real codec
        return np.full((2, 2), 200.0)

    try:
        M.FAST_IMAGE_DECODER = fake
        a = M._gray_pixels(png)
        assert a.shape == (4, 4) and float(a.mean()) == 7.0  # fallback
        b = M._gray_pixels(png)
        assert b.shape == (2, 2) and float(b.mean()) == 200.0  # hook
        assert len(calls) == 2
    finally:
        M.FAST_IMAGE_DECODER = None
    c = M._gray_pixels(png)
    assert c.shape == (4, 4) and len(calls) == 2  # hook fully detached


def test_adpcm_vectorized_equals_per_block_reference():
    """The block-lockstep vectorized IMA ADPCM decode must agree sample-
    for-sample with the per-block reference procedure, including ragged
    final blocks and saturating predictors."""
    import numpy as np
    import struct as _struct

    from traildb_spark.operators import multimodal as M

    rng = np.random.default_rng(13)
    for trial in range(12):
        n = int(rng.integers(10, 5000))
        if trial % 3 == 0:  # drive the clamp paths
            sig = (rng.integers(0, 2, n) * 65535 - 32768).astype(np.int16)
        else:
            sig = (np.cumsum(rng.normal(0, 900, n))).clip(-32768, 32767).astype(np.int16)
        ba = int(rng.choice([8, 64, 256, 1024]))
        wav = M.make_adpcm_wav(sig, rate=8000, block_align=ba)
        rate, ch, got = M.decode_wav(wav)
        # reference: per-block python procedure over the same data chunk
        pos, data = 12, None
        while pos + 8 <= len(wav):
            ctype = wav[pos:pos + 4]
            (clen,) = _struct.unpack("<I", wav[pos + 4:pos + 8])
            if ctype == b"data":
                data = wav[pos + 8:pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        want = []
        for off in range(0, len(data), ba):
            block = data[off:off + ba]
            pred, idx, _ = _struct.unpack("<hBB", block[:4])
            want.append(pred)
            want.extend(M._ima_adpcm_decode_block(block[4:], pred, idx))
        assert np.array_equal(got, np.array(want, np.int16)), f"trial {trial}"


def test_decoder_override_ships_to_workers_end_to_end(spark):
    """The executable production swap: ``decoder=`` rides the mapInPandas
    CLOSURE to every Python worker (a module-global FAST_IMAGE_DECODER
    set on the driver never reaches worker processes), so the fast-codec
    deployment story is provable through the real Spark operators:
    (a) a fall-through hook yields features/pHash identical to the
    built-in codecs; (b) a selective hook replaces exactly the payloads
    it claims and falls back for the rest; (c) image_luma_stats sees the
    hook's bitmap verbatim."""
    from traildb_spark.operators import multimodal as M

    rows = []
    for i in range(8):
        side = 4 if i % 2 == 0 else 5  # even ids get 4x4, odd 5x5
        arr = ((np.arange(side * side).reshape(side, side) * 7 + i) % 256).astype(
            np.uint8
        )
        rows.append((i, "image", bytearray(M.make_png(arr)), "x/image", None))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    base = {r["media_id"]: r for r in M.extract_image_features(media).collect()}

    # (a) fall-through hook == built-in codecs, bit for bit
    passthru = {
        r["media_id"]: r
        for r in M.extract_image_features(media, decoder=lambda b: None).collect()
    }
    for i in base:
        assert passthru[i]["phash"] == base[i]["phash"]
        assert passthru[i]["features"] == base[i]["features"]

    # (b) selective hook: constant bitmap for 4-wide payloads, None else
    def hook(content):
        w, _ = M.decode_image_size(content)
        return np.full((2, 2), 128.0) if w == 4 else None

    got = {
        r["media_id"]: r
        for r in M.extract_image_features(media, decoder=hook).collect()
    }
    want_hooked_phash = M.phash64(np.full((2, 2), 128.0))
    for i in base:
        if i % 2 == 0:
            assert got[i]["phash"] == want_hooked_phash
            # all four pixels land in histogram bin 4 ([128, 160))
            assert got[i]["features"] == [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
        else:
            assert got[i]["phash"] == base[i]["phash"]
            assert got[i]["features"] == base[i]["features"]

    # (c) luma stats observe the hook's bitmap verbatim
    luma = {
        r["media_id"]: r for r in M.image_luma_stats(media, decoder=hook).collect()
    }
    for i in base:
        if i % 2 == 0:
            assert (
                luma[i]["width"],
                luma[i]["height"],
                luma[i]["luma_sum"],
                luma[i]["luma_min"],
                luma[i]["luma_max"],
            ) == (2, 2, 512, 128, 128)
        else:
            assert luma[i]["width"] == 5 and luma[i]["luma_sum"] >= 0


def test_pnm_codec_roundtrip_and_edges():
    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        decode_image_size, decode_pnm, make_pnm,
    )

    g = (np.arange(35).reshape(5, 7) * 13 % 256).astype(np.uint8)
    for binary in (True, False):
        b = make_pnm(g, binary=binary)
        assert (decode_pnm(b) == g).all()
        assert decode_image_size(b) == (7, 5)
    # P6 RGB -> BT.601 luma, same coefficients as the PNG path
    p6 = b"P6\n# comment\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    lum = decode_pnm(p6)
    assert abs(lum[0, 0] - 0.299 * 255) < 1e-9
    assert abs(lum[0, 1] - 0.114 * 255) < 1e-9
    # 16-bit binary keeps the high byte (the PNG reduction rule)
    import struct
    b16 = b"P5\n2 1\n65535\n" + struct.pack(">HH", 0xABCD, 0x0102)
    assert (decode_pnm(b16) == [[0xAB, 0x01]]).all()
    # sub-255 maxval rescales round(v*255/maxval)
    assert (decode_pnm(b"P2\n2 1\n3\n0 3\n") == [[0, 255]]).all()
    # honest gates: bitmaps, truncation, over-maxval samples
    with pytest.raises(ValueError):
        decode_pnm(b"P4\n2 2\n\x00")
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n4 4\n255\nab")
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n2 1\n10\n0 11\n")


def test_pnm_feeds_image_stats(spark):
    import numpy as np

    from traildb_spark.operators import multimodal
    from traildb_spark.operators.multimodal import make_pnm

    g = np.full((3, 4), 9, dtype=np.uint8)
    rows = [(1, "image", bytearray(make_pnm(g))),
            (2, "image", bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    got = {r.media_id: (r.width, r.height, r.luma_sum, r.luma_min, r.luma_max)
           for r in multimodal.image_luma_stats(df).collect()}
    assert got == {1: (4, 3, 108, 9, 9), 2: (-1, -1, -1, -1, -1)}


def test_aiff_codec_roundtrip_and_edges():
    import struct

    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        _f80_to_int, _int_to_f80, decode_aiff, decode_audio, make_aiff,
    )

    s = (np.arange(200) * 211 % 2048 - 1024).astype(np.int16)
    b = make_aiff(s, 44100)
    r, ch, out = decode_aiff(b)
    assert (r, ch) == (44100, 1) and (out == s).all()
    # dispatch: AIFF and WAV through one call site
    assert (decode_audio(b)[2] == s).all()
    for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
        assert _f80_to_int(_int_to_f80(rate)) == rate
    # AIFC 'sowt' (little-endian) 16-bit
    comm = struct.pack(">hIh", 1, 3, 16) + _int_to_f80(8000) + b"sowt"
    ssnd = struct.pack(">II", 0, 0) + np.array([1, -2, 300], "<i2").tobytes()
    aifc = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
            + b"AIFC"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    r, ch, out = decode_aiff(aifc)
    assert list(out) == [1, -2, 300]
    # honest gates: perceptual AIFC codec, wrong container
    bad = aifc.replace(b"sowt", b"ima4")
    with pytest.raises(ValueError):
        decode_aiff(bad)
    with pytest.raises(ValueError):
        decode_aiff(b"RIFFxxxxWAVE")
    # 8-bit AIFF is SIGNED (unlike WAV): -1 scales to -256
    comm8 = struct.pack(">hIh", 1, 2, 8) + _int_to_f80(8000)
    ssnd8 = struct.pack(">II", 0, 0) + bytes([0xFF, 0x01])
    a8 = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm8) + 8 + len(ssnd8))
          + b"AIFF"
          + b"COMM" + struct.pack(">I", len(comm8)) + comm8
          + b"SSND" + struct.pack(">I", len(ssnd8)) + ssnd8)
    assert list(decode_aiff(a8)[2]) == [-256, 256]


def test_bmp_codec_roundtrip_and_edges():
    import struct

    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        decode_bmp, decode_image_size, make_bmp,
    )

    g = (np.arange(6 * 5).reshape(6, 5) * 31 % 256).astype(np.uint8)
    out = np.round(decode_bmp(make_bmp(g)))
    assert out.shape == (6, 5) and (out == g).all()
    assert decode_image_size(make_bmp(g)) == (5, 6)
    # 24-bit BGR with stride padding, bottom-up flip
    w, h = 2, 2
    stride = (w * 3 + 3) & ~3
    hdr = (b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                         0, 0, 0, 0))
    row_bottom = bytes([0, 0, 255, 0, 0, 0]) + b"\x00" * (stride - 6)
    row_top = bytes([255, 0, 0, 0, 0, 0]) + b"\x00" * (stride - 6)
    lum = decode_bmp(hdr + row_bottom + row_top)
    # file stores bottom row first: decoded [0][0] is the TOP row (blue)
    assert abs(lum[0, 0] - 0.114 * 255) < 1e-9
    assert abs(lum[1, 0] - 0.299 * 255) < 1e-9
    # honest gates
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # zero dims
    rle = bytearray(make_bmp(g)); rle[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))
    with pytest.raises(ValueError):
        decode_bmp(b"XY12")


def test_au_decode_encodings_and_gates():
    """AU round-trip (16-bit BE with an annotation offset), signed-8
    scaling, mu-law through the shared G.711 tables, and the honest
    gates (bad magic, float encoding, bad header)."""
    import struct

    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        _g711_expand, decode_au, decode_audio, make_au,
    )

    s = ((np.arange(60, dtype=np.int64) * 53 + 17) % 4001 - 2000).astype("int16")
    payload = make_au(s, 8000, annotation=b"note\x00\x00")
    rate, ch, got = decode_au(payload)
    assert (rate, ch) == (8000, 1) and np.array_equal(got, s)
    # dispatch routes by magic
    r2, c2, g2 = decode_audio(payload)
    assert r2 == 8000 and np.array_equal(g2, s)
    # signed 8-bit scales by << 8
    raw8 = b".snd" + struct.pack(">IIIII", 24, 3, 2, 8000, 1) + bytes(
        [0x01, 0xFF, 0x80])
    _, _, s8 = decode_au(raw8)
    assert list(s8) == [256, -256, -32768]
    # mu-law matches the shared table
    mu = bytes([0x00, 0x7F, 0xFF])
    raw_mu = b".snd" + struct.pack(">IIIII", 24, 3, 1, 8000, 1) + mu
    _, _, sm = decode_au(raw_mu)
    assert list(sm) == list(_g711_expand(mu, alaw=False))
    # unknown-size sentinel reads to end
    raw_un = b".snd" + struct.pack(">IIIII", 24, 0xFFFFFFFF, 3, 8000, 1) + \
        s[:4].astype(">i2").tobytes()
    assert len(decode_au(raw_un)[2]) == 4
    with pytest.raises(ValueError):
        decode_au(b"XXXX" + payload[4:])
    with pytest.raises(ValueError):
        decode_au(b".snd" + struct.pack(">IIIII", 24, 4, 6, 8000, 1) + b"\0" * 4)
    with pytest.raises(ValueError):
        decode_au(b".snd" + struct.pack(">IIIII", 8, 4, 3, 8000, 1))


def test_tga_decode_rle_flip_and_gates():
    """TGA round-trips: uncompressed vs naive-RLE encodings of the same
    gray canvas decode identically; bottom-up origin flips; dispatch
    detects via the v2 footer; palette/15-bit gates raise."""
    import struct

    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        _gray_pixels, decode_tga, make_tga,
    )

    yy, xx = np.mgrid[0:5, 0:7]
    g = ((yy * 31 + xx * 7) % 256).astype(np.uint8)
    plain = decode_tga(make_tga(g))
    rle = decode_tga(make_tga(g, rle=True))
    assert np.array_equal(plain, g) and np.array_equal(rle, g)
    # bottom-up payload decodes to the same top-down array
    bu = decode_tga(make_tga(g, top_down=False))
    assert np.array_equal(bu, g)
    # runs longer than 127 split correctly
    flat = np.full((3, 300), 9, dtype=np.uint8)
    assert np.array_equal(decode_tga(make_tga(flat, rle=True)), flat)
    # dispatch by footer
    assert np.array_equal(_gray_pixels(make_tga(g)), g)
    with pytest.raises(ValueError):
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 0, 0, 0, 0, 3, 3, 8, 0))
    with pytest.raises(ValueError):  # 15-bit truecolor
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 15, 0) + b"\0" * 20)
    with pytest.raises(ValueError):  # truncated RLE
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 4, 4, 8, 0) + b"\x8f")


def test_ico_decode_dib_png_and_largest_entry():
    """ICO: classic DIB entry (doubled height, palette) decodes through
    the synthesized-BMP path; a PNG entry routes to the PNG decoder;
    with two entries the LARGEST wins; gates raise."""
    import struct

    import numpy as np
    import pytest

    from traildb_spark.operators.multimodal import (
        _gray_pixels, decode_ico, make_bmp, make_png,
    )

    yy, xx = np.mgrid[0:4, 0:4]
    g = ((yy * 9 + xx * 3) % 256).astype(np.uint8)

    def dib_entry(gray):
        # build via make_bmp (8-bit identity palette) then strip the
        # 14-byte file header and double the height field (AND mask = 0)
        bmp = make_bmp(gray)
        (off,) = struct.unpack("<I", bmp[10:14])
        body = bytearray(bmp[14:])
        h, w = gray.shape
        struct.pack_into("<i", body, 8, h * 2)
        and_stride = ((w + 31) // 32) * 4
        return bytes(body) + b"\x00" * (and_stride * h)

    d = dib_entry(g)
    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([4, 4, 0, 0]) + struct.pack("<HHII", 1, 8, len(d), 22)
        + d
    )
    out = decode_ico(ico)
    assert out.shape == (4, 4) and np.array_equal(np.round(out), g)
    assert np.array_equal(np.round(_gray_pixels(ico)), g)

    # two entries: the larger (8x8 PNG) must win over the 4x4 DIB
    g8 = ((np.mgrid[0:8, 0:8][0] * 5 + np.mgrid[0:8, 0:8][1]) % 256).astype(np.uint8)
    p = make_png(g8)
    ico2 = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 2)
        + bytes([4, 4, 0, 0]) + struct.pack("<HHII", 1, 8, len(d), 38)
        + bytes([8, 8, 0, 0]) + struct.pack("<HHII", 1, 32, len(p), 38 + len(d))
        + d + p
    )
    assert decode_ico(ico2).shape == (8, 8)
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x02\x00" + b"\x00" * 20)  # CUR, not ICO
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")  # empty directory


def test_pcx_decode_rle_palette_planar_and_gates():
    """PCX round-trips: identity-VGA-palette and paletteless payloads of
    the same canvas decode to the index (rounded); values >= 0xC0 are
    RLE-escaped; odd widths exercise the even bytes_per_line pad; the
    24-bit planar path and the EGA-depth/truncation gates hold."""
    import struct as _struct

    from traildb_spark.operators.multimodal import (
        _gray_pixels, decode_image_size, decode_pcx, make_pcx,
    )

    yy, xx = np.mgrid[0:5, 0:7]  # odd width -> bpl pad byte
    g = ((yy * 61 + xx * 11 + 150) % 256).astype(np.uint8)  # hits >= 0xC0
    assert g.max() >= 0xC0
    pal = decode_pcx(make_pcx(g, vga_palette=True))
    raw = decode_pcx(make_pcx(g, vga_palette=False))
    assert np.array_equal(np.round(pal), g)
    assert np.array_equal(raw, g)
    assert decode_image_size(make_pcx(g)) == (7, 5)
    assert np.array_equal(np.round(_gray_pixels(make_pcx(g))), g)
    # runs longer than 63 split
    flat = np.full((2, 200), 0xC5, dtype=np.uint8)
    assert np.array_equal(decode_pcx(make_pcx(flat, vga_palette=False)), flat)
    # 24-bit planar: 3 planes per scanline, constant color -> BT.601
    w, h = 4, 2
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, 1, 8
    hdr[4:12] = _struct.pack("<HHHH", 0, 0, w - 1, h - 1)
    hdr[65] = 3
    hdr[66:68] = _struct.pack("<H", w)
    row = bytes([0xC0 | w, 100, 0xC0 | w, 150, 0xC0 | w, 200])
    out = decode_pcx(bytes(hdr) + row * h)
    want = 0.299 * 100 + 0.587 * 150 + 0.114 * 200
    assert out.shape == (h, w) and np.allclose(out, want)
    with pytest.raises(ValueError):  # EGA 4-bit
        bad = bytearray(make_pcx(g)); bad[3] = 4
        decode_pcx(bytes(bad))
    with pytest.raises(ValueError):  # truncated RLE
        decode_pcx(bytes(make_pcx(g, vga_palette=False))[:-3][:130])
    with pytest.raises(ValueError):  # bpl shorter than row
        bad = bytearray(make_pcx(g)); bad[66:68] = _struct.pack("<H", 1)
        decode_pcx(bytes(bad))


def test_voc_decode_blocks_and_gates():
    """VOC round-trips: plain vs continuation-split encodings decode to
    the same samples; the text block is skipped; a type-1 divisor-rate
    8-bit block and a silence block decode per spec; checksum/codec/
    truncation gates raise."""
    import struct as _struct

    from traildb_spark.operators.multimodal import (
        decode_audio, decode_voc, make_voc,
    )

    s = ((np.arange(70, dtype=np.int64) * 37) % 3001 - 1500).astype(np.int16)
    plain = decode_voc(make_voc(s, 11025))
    split = decode_voc(make_voc(s, 11025, split=True, text=b"fixture"))
    assert plain[0] == split[0] == 11025
    assert plain[1] == split[1] == 1
    assert np.array_equal(plain[2], s) and np.array_equal(split[2], s)
    # dispatch by magic
    assert np.array_equal(decode_audio(make_voc(s, 8000))[2], s)
    # type 1 (divisor rate, 8-bit unsigned) + type 3 silence
    hdr = b"Creative Voice File\x1a" + _struct.pack(
        "<HHH", 26, 0x010A, (~0x010A + 0x1234) & 0xFFFF)
    snd = bytes([131, 0]) + bytes([128, 255, 0, 128])  # div 131 -> 8000 Hz
    sil = _struct.pack("<HB", 2, 131)  # 3 zero samples
    voc = (hdr + b"\x01" + len(snd).to_bytes(3, "little") + snd
           + b"\x03" + len(sil).to_bytes(3, "little") + sil + b"\x00")
    rate, ch, out = decode_voc(voc)
    assert rate == 1_000_000 // (256 - 131) and ch == 1
    assert list(out) == [0, 127 << 8, -128 << 8, 0, 0, 0, 0]
    with pytest.raises(ValueError):  # bad checksum
        decode_voc(b"Creative Voice File\x1a" + _struct.pack("<HHH", 26, 0x010A, 0)
                   + b"\x00")
    with pytest.raises(ValueError):  # ADPCM codec
        bad = bytes([131, 1]) + b"\x00\x00"
        decode_voc(hdr + b"\x01" + len(bad).to_bytes(3, "little") + bad + b"\x00")
    with pytest.raises(ValueError):  # continuation before sound data
        decode_voc(hdr + b"\x02" + (2).to_bytes(3, "little") + b"\x00\x00" + b"\x00")
    with pytest.raises(ValueError):  # truncated block body
        decode_voc(hdr + b"\x09" + (99).to_bytes(3, "little") + b"\x00" * 12)


def test_avi_decode_roundtrip_and_gates():
    """AVI: identity-palette DIB frames round-trip (stride pad via odd
    width); the movi walk finds every '00db'; compression and truncation
    gates raise; dims must agree with avih."""
    import struct as _struct

    from traildb_spark.operators.multimodal import (
        decode_avi_frames, make_avi,
    )

    a = ((np.arange(4 * 3 * 7).reshape(4, 3, 7) * 11 + 5) % 256).astype(
        np.uint8)
    w, h, fr = decode_avi_frames(make_avi(a, fps=25))
    assert (w, h) == (7, 3) and np.array_equal(fr, a)
    with pytest.raises(ValueError):  # not RIFF/AVI
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    payload = make_avi(a)
    comp = bytearray(payload)
    i = payload.index(_struct.pack("<Iii", 40, 7, 3))  # strf info start
    comp[i + 16 : i + 20] = _struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_avi_frames(bytes(comp))
    with pytest.raises(ValueError):  # truncated chunk
        decode_avi_frames(payload[:-10])


def test_ras_decode_rle_colormap_and_gates():
    """Sun raster round-trips across RLE x colormap; the 0x80 escape
    and the 16-bit row pad hold; a 24-bit BGR/RGB pair agrees through
    the type-3 ordering; depth/truncation gates raise."""
    import struct as _struct

    from traildb_spark.operators.multimodal import (
        _gray_pixels, decode_ras, make_ras,
    )

    yy, xx = np.mgrid[0:5, 0:7]
    g = ((yy * 61 + xx * 11 + 120) % 256).astype(np.uint8)
    for rle in (False, True):
        for cm in (False, True):
            out = decode_ras(make_ras(g, rle=rle, colormap=cm))
            assert np.array_equal(np.round(out), g), (rle, cm)
    assert np.array_equal(np.round(_gray_pixels(make_ras(g))), g)
    # flag-byte escape: an all-0x80 canvas survives RLE
    flat = np.full((2, 9), 0x80, np.uint8)
    assert np.array_equal(
        decode_ras(make_ras(flat, rle=True, colormap=False)), flat)
    # 24-bit: same pixels as BGR (type 1) and RGB (type 3)
    w, h = 3, 2
    bgr = (bytes([10, 150, 200] * w) + b"\x00") * h  # 16-bit row pad
    hdr1 = _struct.pack(">8I", 0x59A66A95, w, h, 24, len(bgr), 1, 0, 0)
    hdr3 = _struct.pack(">8I", 0x59A66A95, w, h, 24, len(bgr), 3, 0, 0)
    b1 = decode_ras(hdr1 + bgr)   # BGR: B=10 G=150 R=200
    b3 = decode_ras(hdr3 + bgr)   # RGB: R=10 G=150 B=200
    assert np.allclose(b1, 0.299 * 200 + 0.587 * 150 + 0.114 * 10)
    assert np.allclose(b3, 0.299 * 10 + 0.587 * 150 + 0.114 * 200)
    with pytest.raises(ValueError):  # 1-bit depth
        decode_ras(_struct.pack(">8I", 0x59A66A95, 8, 8, 1, 8, 1, 0, 0) + b"\0" * 8)
    with pytest.raises(ValueError):  # truncated RLE
        decode_ras(_struct.pack(">8I", 0x59A66A95, 4, 4, 8, 2, 2, 0, 0) + b"\x80")
    with pytest.raises(ValueError):  # colormap index out of range
        hdr = _struct.pack(">8I", 0x59A66A95, 2, 1, 8, 2, 1, 1, 6)
        decode_ras(hdr + bytes(6) + bytes([5, 0]))


def test_media_inventory_counts_containers(spark):
    """Mixed table: per-container counts and byte totals; text payloads
    land in 'unknown', NULLs in 'empty'."""
    from traildb_spark.operators.multimodal import (
        make_bmp, make_pcx, make_ras, make_tga, media_inventory,
    )

    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rows = [
        (1, bytearray(make_tga(g))), (2, bytearray(make_pcx(g))),
        (3, bytearray(make_ras(g))), (4, bytearray(make_bmp(g))),
        (5, bytearray(make_tga(g))), (6, bytearray(b"just text")),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.container: (r.n_payloads, r.total_bytes)
           for r in media_inventory(df).collect()}
    assert got["tga"] == (2, 2 * len(make_tga(g)))
    assert got["pcx"][0] == 1 and got["ras"][0] == 1 and got["bmp"][0] == 1
    assert got["unknown"] == (1, 9)
    assert got["empty"] == (1, 0)


def test_qoi_roundtrip_all_chunk_types():
    """QOI: the fixture encoder uses the full op ladder (RUN/INDEX/DIFF/
    LUMA/RGB), so exact round-trip proves every decode branch, including
    the 62-run cap, the wrap-mod-256 deltas, and the (3r+5g+7b+11a)%64
    index slots; honest gates raise."""
    import struct as _struct

    from traildb_spark.operators.multimodal import decode_qoi, make_qoi

    rng = np.random.RandomState(11)
    for trial in range(30):
        h, w = rng.randint(1, 14), rng.randint(1, 14)
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        if trial % 3 == 0:
            g[:, : w // 2 + 1] = g[0, 0]  # long runs
        if trial % 4 == 0:
            g = np.cumsum(g, axis=1).astype(np.uint8)  # DIFF/LUMA deltas
        dec = np.round(decode_qoi(make_qoi(g))).astype(np.uint8)
        assert dec.shape == g.shape and (dec == g).all()
    # a 200-wide constant row exercises multiple max-length RUN chunks
    flat = np.full((1, 200), 77, np.uint8)
    assert (np.round(decode_qoi(make_qoi(flat))) == 77).all()
    with pytest.raises(ValueError):  # bad magic
        decode_qoi(b"qoix" + bytes(20))
    with pytest.raises(ValueError):  # zero dims
        decode_qoi(b"qoif" + _struct.pack(">II", 0, 4) + bytes([3, 0]) + bytes(8))
    with pytest.raises(ValueError):  # bad channels
        decode_qoi(b"qoif" + _struct.pack(">II", 2, 2) + bytes([5, 0]) + bytes(8))
    with pytest.raises(ValueError):  # truncated chunk stream
        good = make_qoi(np.arange(16, dtype=np.uint8).reshape(4, 4))
        decode_qoi(good[: len(good) // 2])


def test_tiff_roundtrip_flags_and_gates():
    """TIFF: PackBits/uncompressed x II/MM x photometric 0/1 x strip
    splits all round-trip to the same gray; unsupported forms raise."""
    import struct as _struct

    from traildb_spark.operators.multimodal import decode_tiff, make_tiff

    rng = np.random.RandomState(13)
    for trial in range(30):
        h, w = rng.randint(1, 11), rng.randint(1, 11)
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        if trial % 2:
            g[: h // 2 + 1, :] = g[0, 0]  # PackBits repeat runs
        dec = decode_tiff(make_tiff(
            g,
            packbits=(trial % 2 == 0),
            big_endian=(trial % 3 == 0),
            white_is_zero=(trial % 5 == 0),
            rows_per_strip=None if trial % 4 else max(1, h // 2),
        )).astype(np.uint8)
        assert dec.shape == g.shape and (dec == g).all()
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    with pytest.raises(ValueError):  # not a TIFF
        decode_tiff(b"II+\x00" + bytes(8))
    with pytest.raises(ValueError):  # truncated strip
        decode_tiff(make_tiff(g)[:-30])
    enc = bytearray(make_tiff(g))
    # flip compression tag (259) value to LZW (5): honest gate
    ifd_off = _struct.unpack("<I", enc[4:8])[0]
    for i in range(_struct.unpack("<H", enc[ifd_off:ifd_off + 2])[0]):
        e = ifd_off + 2 + 12 * i
        if _struct.unpack("<H", enc[e:e + 2])[0] == 259:
            enc[e + 8:e + 10] = _struct.pack("<H", 5)
    with pytest.raises(ValueError):
        decode_tiff(bytes(enc))


def test_midi_roundtrip_and_note_pairing():
    """SMF: varint deltas, running status, meta/sysex skip, multi-track
    split, and FIFO note-on/off pairing all round-trip; velocity-0
    note-on acts as note-off; unclosed notes end at end-of-track."""
    import struct as _struct

    from traildb_spark.operators.multimodal import decode_midi, make_midi

    rng = np.random.RandomState(17)
    for trial in range(25):
        n = int(rng.randint(0, 18))
        # distinct pitches per trial -> pairing is unambiguous
        pitches = rng.permutation(128)[:n]
        notes = [
            (int(rng.randint(0, 16)), int(pitches[k]),
             int(rng.randint(1, 128)), int(rng.randint(0, 4000)),
             int(rng.randint(1, 800)))
            for k in range(n)
        ]
        nt = 1 + trial % 3
        division, ntrks, arr = decode_midi(make_midi(notes, 384, nt))
        assert (division, ntrks) == (384, nt)
        got = sorted(tuple(map(int, r[1:])) for r in arr)
        exp = sorted((ch, p, v, on, d) for ch, p, v, on, d in notes)
        assert got == exp
    # velocity-0 note-on closes a note (spec's running-status idiom)
    body = b"\x00\x90\x3c\x40" + b"\x60\x3c\x00" + b"\x00\xff\x2f\x00"
    raw = (_struct.pack(">4sIHHH", b"MThd", 6, 0, 1, 480)
           + _struct.pack(">4sI", b"MTrk", len(body)) + body)
    _, _, arr = decode_midi(raw)
    assert arr.tolist() == [[0, 0, 0x3C, 0x40, 0, 0x60]]
    # unclosed note ends at end-of-track tick
    body = b"\x00\x90\x3c\x40" + b"\x81\x00\xff\x2f\x00"  # EOT at t=128
    raw = (_struct.pack(">4sIHHH", b"MThd", 6, 0, 1, 480)
           + _struct.pack(">4sI", b"MTrk", len(body)) + body)
    _, _, arr = decode_midi(raw)
    assert arr.tolist() == [[0, 0, 0x3C, 0x40, 0, 128]]
    with pytest.raises(ValueError):  # SMPTE division
        decode_midi(_struct.pack(">4sIHHH", b"MThd", 6, 0, 1, 0xE250))
    with pytest.raises(ValueError):  # format 2
        decode_midi(_struct.pack(">4sIHHH", b"MThd", 6, 2, 1, 480))
    with pytest.raises(ValueError):  # truncated track
        decode_midi(_struct.pack(">4sIHHH", b"MThd", 6, 0, 1, 480)
                    + _struct.pack(">4sI", b"MTrk", 99) + b"\x00")


def test_midi_note_stats_spark(spark):
    """midi_note_stats over a mixed table: per-payload aggregates match
    a hand decode; undecodable and NULL payloads are skipped."""
    from traildb_spark.operators.multimodal import make_midi, midi_note_stats

    notes1 = [(0, 60, 100, 0, 480), (1, 64, 90, 240, 240)]
    notes2 = [(2, 30, 10, 100, 50)]
    rows = [
        (1, bytearray(make_midi(notes1, 480, 2))),
        (2, bytearray(make_midi(notes2, 96, 1))),
        (3, bytearray(b"not midi")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in midi_note_stats(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.division, r1.n_tracks, r1.n_notes) == (480, 2, 2)
    assert (r1.pitch_sum, r1.pitch_min, r1.pitch_max) == (124, 60, 64)
    assert (r1.velocity_sum, r1.dur_sum, r1.span_ticks) == (190, 720, 480)
    r2 = got[2]
    assert (r2.division, r2.n_tracks, r2.n_notes) == (96, 1, 1)
    assert (r2.pitch_sum, r2.dur_sum, r2.span_ticks) == (30, 50, 150)


def test_audio_quality_stats_hand_computed(spark):
    """Silence frames by the exact sum(x^2) < thr^2*len rule (trailing
    partial frame counted), clip threshold inclusive, DC truncates
    toward zero; undecodable payloads skipped."""
    from traildb_spark.operators.multimodal import (
        audio_quality_stats, make_wav,
    )

    s = np.array([0, 0, 0, 0, 32700, -32700, 5, -6], np.int16)
    rows = [(1, bytearray(make_wav(s, 8000))),
            (2, bytearray(b"junk")), (3, None)]
    df = spark.createDataFrame(
        rows, "media_id long, content binary").withColumn(
        "kind", F.lit("audio"))
    r = audio_quality_stats(df, frame_samples=4, silence_rms=100,
                            clip_level=32700).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_samples, row.n_frames) == (8, 2)
    # frame1 all zeros -> silent; frame2 has 32700s -> not
    assert row.silent_frames == 1
    assert row.clipped_samples == 2
    # sum = -1, trunc(-1/8) = 0
    assert row.dc_offset == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        audio_quality_stats(df, frame_samples=0)


def test_image_quality_stats_hand_computed(spark):
    """Flat image -> var_num 0 and grad 0; a step edge contributes its
    |delta| once per neighbor pair; extremes count both tails;
    undecodable payloads get -1 sentinels."""
    from traildb_spark.operators.multimodal import (
        image_quality_stats, make_png,
    )

    flat = np.full((3, 4), 128, np.uint8)
    step = np.array([[0, 0, 255, 255]] * 2, np.uint8)  # 2x4
    rows = [(1, bytearray(make_png(flat))), (2, bytearray(make_png(step))),
            (3, bytearray(b"junk"))]
    df = spark.createDataFrame(
        rows, "media_id long, content binary").withColumn(
        "kind", F.lit("image"))
    got = {r.media_id: r for r in image_quality_stats(df).collect()}
    f = got[1]
    assert (f.n_pixels, f.var_num, f.grad_energy, f.extreme_pixels) == \
        (12, 0, 0, 0)
    s = got[2]
    # horizontal: per row |0-0|+|255-0|+|255-255| = 255 -> 510;
    # vertical: all 0; var_num = 8*(4*255^2) - (4*255)^2 = 8*260100 - 1040400
    assert (s.n_pixels, s.grad_energy) == (8, 510)
    assert s.var_num == 8 * 4 * 255 * 255 - (4 * 255) ** 2
    assert s.extreme_pixels == 8
    assert got[3].n_pixels == -1 and got[3].var_num == -1


def test_qoi_run_past_end_raises():
    """A RUN chunk overrunning width*height is a malformed stream and
    must raise (honest-gate contract), not silently truncate."""
    import struct as _struct

    import pytest as _pytest

    from traildb_spark.operators.multimodal import decode_qoi

    content = (
        b"qoif" + _struct.pack(">II", 1, 1) + bytes([3, 0])
        + bytes([0xC1])  # QOI_OP_RUN, run = 2 > 1 pixel
        + bytes(7) + b"\x01"
    )
    with _pytest.raises(ValueError, match="run past end"):
        decode_qoi(content)


def test_audio_fingerprints_hand_values(spark):
    """Energy-delta sign bits: a quiet→loud→quiet→loud staircase over
    4 frames gives bits 1,0,1; the 63-comparison int64 cap raises."""
    import numpy as _np

    import pytest as _pytest

    from traildb_spark.operators.multimodal import (
        audio_fingerprints, make_au,
    )

    frames = [10, 900, 20, 800]  # per-frame amplitude, 4 samples each
    s = _np.concatenate(
        [_np.full(4, a, dtype=_np.int16) for a in frames]
    )
    rows = [(1, "audio", bytearray(make_au(s, 8000)), "x/audio", "{}"),
            (2, "video", bytearray(b"junk"), "x/video", "{}")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary,"
        " mime string, meta string")
    got = audio_fingerprints(df, frame_samples=4).collect()
    assert len(got) == 1  # non-audio rows filtered
    r = got[0]
    assert (r.media_id, r.n_frames) == (1, 4)
    assert r.fingerprint == 0b101  # up, down, up

    # gain invariance: doubling amplitude preserves the signature
    rows2 = [(3, "audio", bytearray(make_au(s * 2, 8000)), "x/audio", "{}")]
    df2 = spark.createDataFrame(
        rows2, "media_id long, kind string, content binary,"
        " mime string, meta string")
    assert audio_fingerprints(df2, frame_samples=4).collect()[0] \
        .fingerprint == 0b101

    long = _np.arange(200, dtype=_np.int16)
    df3 = spark.createDataFrame(
        [(4, "audio", bytearray(make_au(long, 8000)), "x/audio", "{}")],
        "media_id long, kind string, content binary, mime string,"
        " meta string")
    with _pytest.raises(Exception, match="63-bit"):
        audio_fingerprints(df3, frame_samples=2).collect()


def test_scene_changes_hand_values(spark):
    """Two flat shots with one hard cut: only the cut frame flags; a
    one-frame clip yields no rows."""
    import numpy as _np

    from traildb_spark.operators.multimodal import make_y4m, scene_changes

    a = _np.full((2, 4, 4), 10, dtype=_np.uint8)   # shot 1: two frames
    b = _np.full((2, 4, 4), 200, dtype=_np.uint8)  # shot 2: two frames
    clip = _np.concatenate([a, b])
    one = _np.full((1, 4, 4), 7, dtype=_np.uint8)
    rows = [(1, "video", bytearray(make_y4m(clip)), "x/video", "{}"),
            (2, "video", bytearray(make_y4m(one)), "x/video", "{}"),
            (3, "audio", bytearray(b"junk"), "x/audio", "{}")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary,"
        " mime string, meta string")
    got = scene_changes(df, min_avg_delta_milli=50_000).collect()
    assert [(r.media_id, r.frame, r.luma_delta) for r in got] == [
        (1, 2, (200 - 10) * 16)
    ]


def test_audio_gain_report_hand_computed(spark):
    """Constant-amplitude clip: rms == amplitude exactly, gain is the
    floor ratio, clip test flips with amplitude; silence yields NULL
    gain rather than a division crash."""
    import numpy as np

    from traildb_spark.operators.multimodal import audio_gain_report, make_au

    quiet = make_au(np.full(100, 300, dtype=np.int64), 8000)
    loud = make_au(np.full(100, 30000, dtype=np.int64), 8000)
    silent = make_au(np.zeros(50, dtype=np.int64), 8000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(quiet)),
         (2, "audio", bytearray(loud)),
         (3, "audio", bytearray(silent))],
        "media_id long, kind string, content binary",
    )
    out = {r.media_id: r for r in audio_gain_report(df, target_rms=600).collect()}
    assert out[1].rms_floor == 300 and out[1].gain_milli == 2000
    # 300 * 2000 = 600000 <= 32767000: no clip
    assert out[1].would_clip is False
    assert out[2].rms_floor == 30000 and out[2].gain_milli == 20
    # 30000 * 20 = 600000 <= 32767000: still no clip
    assert out[2].would_clip is False
    assert out[3].rms_floor == 0 and out[3].gain_milli is None

    # a spiky clip at an aggressive target: rms_floor 423 but a 3000
    # peak -> gain 47281 milli drives the peak to ~141.8M > 32.767M
    import math

    spike = np.full(100, 300, dtype=np.int64)
    spike[0] = 3000
    df2 = spark.createDataFrame(
        [(9, "audio", bytearray(make_au(spike, 8000)))],
        "media_id long, kind string, content binary",
    )
    r = audio_gain_report(df2, target_rms=20000).collect()[0]
    rms = math.isqrt(int((spike.astype("int64") ** 2).sum()) // 100)
    assert r.rms_floor == rms == 423
    assert r.gain_milli == 20_000_000 // rms
    assert r.would_clip is True
