"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star surface).

Image decode is REAL pure-python for all three common containers: a
complete PNG pixel decoder (every spec shape — gray/RGB/RGBA/gray+alpha
at 8/16-bit, palette and sub-byte depths, Adam7 interlacing), a complete
JPEG pixel decoder (:mod:`.jpeg` — baseline, extended-sequential, AND
progressive frames; Huffman entropy decode, dequant, IDCT, any YCbCr
sampling, restart markers), a complete GIF decoder (:mod:`.gif` — LZW,
local/global palettes, interlacing), and matching deterministic
encoders for fixtures, plus a numpy DCT perceptual hash over the
decoded bitmap. Audio is REAL for RIFF/WAVE integer PCM (8/16/32-bit),
IEEE float, G.711 A-law/μ-law, and mono IMA ADPCM (a genuinely
compressed codec). Remaining honest gates — lossless/arithmetic JPEG,
perceptual audio codecs (mp3/aac/opus), compressed video — fall back to
marked byte-content paths; swap `_gray_pixels`/`decode_wav` for
PIL/soundfile in one place each if they ever matter.

At 100 TB the rules encoded here: binaries ride in their own column so
column pruning skips them unless asked; feature extraction is
``mapInPandas`` (streaming Arrow batches, constant memory) rather than
``collect``-anything; partition count follows bytes not rows
(``repartition`` before heavy decode so one task ≈ one core-minute).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("content", BinaryType()),     # opaque payload
        StructField("mime", StringType()),
        StructField("meta", StringType()),        # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# every way a malformed payload can fail the pure-python decoders:
# struct.unpack on truncated headers raises struct.error, a corrupt IDAT
# raises zlib.error — callers treating "undecodable" as a value, not a
# crash, must catch all three (one bit-flipped image must never abort a
# 100 TB job)
DECODE_ERRORS = (ValueError, struct.error, zlib.error)


def decode_image_size(content: bytes) -> tuple[int, int]:
    """(width, height) from the container header — pure python, no image
    library. PNG: IHDR at a fixed offset. JPEG: walk the marker stream to
    the first SOF0–SOF15 frame header. GIF: logical screen descriptor.
    Raises ValueError for anything else (callers decide the fallback)."""
    if content.startswith(_PNG_SIG) and len(content) >= 24:
        # verify the first chunk IS IHDR: CgBI-style PNGs (valid signature,
        # different leading chunk) would otherwise yield garbage dims read
        # from the wrong chunk's body — silently, with no exception
        if content[12:16] != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h)
    if content[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 4 <= len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            # SOFn (C0–CF except the huffman/arithmetic tables C4, C8, CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
        raise ValueError("JPEG: no SOF frame header found")
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return int(w), int(h)
    if content[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        _, w, h, _, _ = _pnm_header(content)
        return int(w), int(h)
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return int(w), int(abs(h))
    if (
        len(content) >= 128
        and content[0] == 0x0A
        and content[2] == 1
        and content[1] in (0, 2, 3, 4, 5)
    ):
        xmin, ymin, xmax, ymax = struct.unpack("<HHHH", content[4:12])
        return xmax - xmin + 1, ymax - ymin + 1
    if (
        len(content) >= 25
        and content[:4] == b"RIFF"
        and content[8:12] == b"WEBP"
        and content[12:16] == b"VP8L"
        and content[20] == 0x2F
    ):
        b0, b1, b2, b3 = content[21:25]
        w = 1 + (b0 | ((b1 & 0x3F) << 8))
        h = 1 + ((b1 >> 6) | (b2 << 2) | ((b3 & 0x0F) << 10))
        return w, h
    raise ValueError("unrecognized image container")


# Pluggable fast-codec hook: the ONE swap point for production image
# decode. Set to a callable (content: bytes) -> np.ndarray (H, W) gray
# float, or -> None to fall through to the built-in pure-python codecs
# for that payload. Exceptions propagate as decode failures (the
# extractors' sentinel-row contract applies). Typical deployment:
#   import PIL.Image, io, numpy as np
#   multimodal.FAST_IMAGE_DECODER = lambda b: np.asarray(
#       PIL.Image.open(io.BytesIO(b)).convert("L"), float)
# Module-level so mapInPandas workers pick it up via the module import;
# set it in a worker-initialized module (or sitecustomize), not only on
# the driver.
FAST_IMAGE_DECODER = None


def _gray_pixels_with(content: bytes, decoder) -> np.ndarray:
    """``_gray_pixels`` with a per-operator decoder override. The image
    operators accept ``decoder=`` and close over it, so cloudpickle ships
    the callable INSIDE the mapInPandas closure to every Python worker —
    the deployment path that needs no worker-side module setup (the
    module-global ``FAST_IMAGE_DECODER`` only reaches workers when set in
    a worker-initialized module, e.g. sitecustomize). Same contract as
    the global hook: return an (H, W) gray float array, or None to fall
    through to the built-in codecs for that payload."""
    if decoder is not None:
        fast = decoder(content)
        if fast is not None:
            return np.asarray(fast, dtype=np.float64)
    return _gray_pixels(content)


def _gray_pixels(content: bytes) -> np.ndarray:
    """Decode an image payload to a grayscale float array (H, W).

    PNG: full pure-stdlib decode — chunk walk → IDAT zlib inflate →
    per-scanline unfilter (None/Sub/Up/Average/Paeth) → sample unpack →
    ITU-R 601 luma. Covers every PNG shape: gray / gray+alpha / RGB /
    RGBA at depths 8 and 16 (16-bit keeps the high byte — the spec's
    own 8-bit reduction), palette (color type 3, PLTE) at depths
    1/2/4/8, sub-byte grayscale (1/2/4) rescaled to [0, 255], and Adam7
    interlacing (7 independently-filtered sub-images scattered back).
    JPEG: real pixel decode for baseline, extended-sequential, AND
    progressive frames via the pure-numpy codec in
    :mod:`traildb_spark.operators.jpeg` (the luma plane IS the grayscale
    bitmap — JPEG stores YCbCr). GIF: real LZW decode of the first frame
    via :mod:`traildb_spark.operators.gif` (palette → BT.601 luma).
    Remaining honest gates: lossless/arithmetic JPEG. At 100 TB, point
    ``FAST_IMAGE_DECODER`` at a codec library — this function is the
    single call site the whole image surface funnels through; the
    pure-python codecs stay as the dependency-free differential
    reference (throughput numbers in SCALE.md)."""
    if FAST_IMAGE_DECODER is not None:
        fast = FAST_IMAGE_DECODER(content)
        if fast is not None:
            return np.asarray(fast, dtype=np.float64)
    if content[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_luma

        return decode_jpeg_luma(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif_luma

        return decode_gif_luma(content)
    if content[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return decode_pnm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[-18:] == _TGA_FOOTER:
        return decode_tga(content)
    if content[:4] == b"\x00\x00\x01\x00":
        return decode_ico(content)
    if (
        len(content) >= 128
        and content[0] == 0x0A
        and content[2] == 1
        and content[1] in (0, 2, 3, 4, 5)
        and content[3] in (1, 2, 4, 8)
    ):
        return decode_pcx(content)
    if content[:4] == b"\x59\xa6\x6a\x95":
        return decode_ras(content)
    if content[:4] == b"qoif":
        return decode_qoi(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp(content)
    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, width, height, channels = 8, None, None, None
    depth, color = 8, 0
    palette = None
    idat = b""
    while pos + 8 <= len(content):
        (clen,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if interlace not in (0, 1):
                raise ValueError(f"PNG: unknown interlace method {interlace}")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"PNG: unsupported color type {color}")
            allowed = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color, (8, 16))
            if depth not in allowed:
                raise ValueError(f"PNG: depth {depth} invalid for color {color}")
        elif ctype == b"PLTE":
            if clen % 3:
                raise ValueError("PNG: malformed PLTE")
            palette = np.frombuffer(data[: clen // 3 * 3], np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    if width == 0 or height == 0:
        # a zero-dim bitmap would make downstream phash64 indexing raise
        # IndexError, which is not a DECODE_ERRORS member
        raise ValueError("PNG: zero-dimension image")
    if color == 3 and palette is None:
        raise ValueError("PNG: palette image without PLTE")
    bpp = max(1, channels * depth // 8)

    def sub_image_layout(w: int, h: int):
        # filtering operates on BYTES: stride is the packed scanline
        # width, Sub/Paeth left-neighbor offset is bytes-per-pixel
        stride = (w * channels * depth + 7) // 8
        return stride, h * (stride + 1)

    # Adam7 sub-images (x0, y0, dx, dy per the PNG spec); interlace 0 is
    # the single full-frame "pass"
    passes = (
        [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if interlace
        else [(0, 0, 1, 1)]
    )
    layout = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = -(-(width - x0) // dx) if width > x0 else 0
        ph = -(-(height - y0) // dy) if height > y0 else 0
        if pw == 0 or ph == 0:
            layout.append((x0, y0, dx, dy, 0, 0, 0))
            continue
        stride, nbytes = sub_image_layout(pw, ph)
        layout.append((x0, y0, dx, dy, pw, ph, stride))
        expected += nbytes
    # bound the inflate to the size IHDR promises (+1 to detect overrun):
    # an unbounded zlib.decompress would allocate a decompression bomb's
    # full output BEFORE the size check — MemoryError is not a
    # DECODE_ERRORS member and would fail the task, not the row
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected + 1)
    if len(raw) != expected or d.unconsumed_tail:
        raise ValueError("PNG: unexpected scanline payload size")

    def unfilter(buf: bytes, off: int, h: int, stride: int) -> np.ndarray:
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            row = np.frombuffer(
                buf, dtype=np.uint8, count=stride, offset=off + y * (stride + 1) + 1
            ).astype(np.int32)
            f = buf[off + y * (stride + 1)]
            if f == 0:  # None
                cur = row
            elif f == 2:  # Up
                cur = (row + prev) & 0xFF
            else:  # Sub / Average / Paeth need the left neighbor: in order
                cur = np.zeros(stride, dtype=np.int32)
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    elif f == 4:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    else:
                        raise ValueError(f"PNG: bad filter {f}")
                    cur[x] = (row[x] + pred) & 0xFF
            out[y] = cur
            prev = cur
        return out

    def unpack(filtered: np.ndarray, w: int, h: int, stride: int) -> np.ndarray:
        # filtered bytes -> (h, w, channels) samples
        if depth == 8:
            return filtered.reshape(h, w, channels)
        if depth == 16:
            # high byte = the spec's sample-depth rescale to 8 bits
            return filtered.reshape(h, stride)[:, 0::2].reshape(h, w, channels)
        bits = np.unpackbits(filtered, axis=1)[:, : w * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (
            bits.reshape(h, w, depth) * weights[None, None, :]
        ).sum(axis=2)[:, :, None]

    samples = np.zeros((height, width, channels), dtype=np.int64)
    off = 0
    for x0, y0, dx, dy, pw, ph, stride in layout:
        if pw == 0 or ph == 0:
            continue
        sub = unpack(unfilter(raw, off, ph, stride), pw, ph, stride)
        samples[y0::dy, x0::dx] = sub
        off += ph * (stride + 1)
    px = samples.astype(np.float64)
    if color == 3:
        idx = samples[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        rgb = palette[idx].astype(np.float64)
        return 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    if depth in (1, 2, 4):
        px = px * (255.0 / ((1 << depth) - 1))
    if channels in (1, 2):
        return px[:, :, 0]
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def make_png(gray: np.ndarray) -> bytes:
    """Deterministic 8-bit grayscale PNG encoder (fixture generator):
    filter-0 scanlines, zlib level 0 (stored blocks), so the byte size is
    the CLOSED FORM H*(W+1) + 68 for raw payloads <= 64 KiB — which lets
    SQL oracles predict n_bytes of real image binaries."""
    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 0))
        + chunk(b"IEND", b"")
    )


def phash64(gray: np.ndarray) -> int:
    """64-bit DCT perceptual hash of a grayscale bitmap: nearest-neighbor
    resample to 32×32, orthonormal DCT-II (one matrix multiply each side),
    keep the top-left 8×8 low-frequency block minus DC, threshold at the
    median. Near-identical images land within a few bits of Hamming
    distance; unrelated images ~32."""
    g = np.asarray(gray, dtype=np.float64)
    small = _resample(g, 32, 32, "nearest")
    n = 32
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    dct = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    dct[0, :] = np.sqrt(1.0 / n)
    freq = dct @ small @ dct.T
    # round before comparing: float noise (~1e-13) in the DCT of a flat
    # image must not flip bits above an exactly-zero median
    vals = np.round(freq[:8, :8].ravel()[1:], 6)
    med = np.median(vals)
    bits = vals > med
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def _content_hash64(content: bytes) -> int:
    """Fallback 64-bit CONTENT hash for payloads whose pixels we cannot
    decode in pure python (lossless/arithmetic-coded JPEG, containers
    outside PNG/JPEG/GIF): deterministic, but byte-level — NOT
    perceptual. Kept distinct so deployments know to swap a codec into
    :func:`_gray_pixels`."""
    import hashlib

    return (
        int.from_bytes(
            hashlib.blake2b(content, digest_size=8).digest(), "big", signed=False
        )
        >> 1
    )


def extract_image_features(
    df: DataFrame, batch_size: int = 256, decoder=None
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow-batched).

    Input: MEDIA_SCHEMA rows with kind='image'. Output:
    IMAGE_FEATURES_SCHEMA. Dimensions come from real container header
    parsing (PNG/JPEG/GIF); pHash and the luma-histogram features come
    from the real decoded bitmap for PNGs AND baseline JPEGs, with a
    marked byte-content fallback for containers whose pixel decode still
    needs a codec library (lossless/arithmetic JPEG, non-PNG/JPEG/GIF).
    The iterator contract keeps memory bounded to one Arrow batch
    regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over the two columns, not iterrows: row materialization
            # costs ~100µs/row of pandas overhead the decode loop feels
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                content = bytes(payload) if payload is not None else b""
                try:
                    w, h = decode_image_size(content)
                except DECODE_ERRORS:
                    w, h = -1, -1  # unknown/corrupt container: surface, don't fail the job
                try:
                    gray = _gray_pixels_with(content, decoder)
                    ph = phash64(gray)
                    # 8-dim luma-histogram embedding from the DECODED bitmap
                    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
                    feats = (hist / max(gray.size, 1)).astype(float).tolist()
                except DECODE_ERRORS:
                    ph = _content_hash64(content) if content else 0
                    feats = [
                        float((content[i] if i < len(content) else 0)) / 255.0
                        for i in range(8)
                    ]
                out.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "phash": ph,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    imgs = df.filter(F.col("kind") == "image").select(
        "media_id", "content"
    )
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_n: int = 30, bytes_per_frame: int = 1024
) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame.

    STUB decode for opaque/compressed payloads (real formats:
    ``extract_video_frames`` decodes actual YUV4MPEG2): frame count =
    ``ceil(len / bytes_per_frame)`` (partial final frame counts, exact
    multiples do NOT grow a phantom frame), and frame i's bytes are
    payload slice ``[i·bytes_per_frame, (i+1)·bytes_per_frame)`` — the
    slice stride IS ``bytes_per_frame``, so frame_bytes corresponds to
    the frame's own payload region. Deterministic arithmetic → the whole
    explode/slice path is differentially checkable (q77). Empty payloads
    emit no frames.
    """
    bpf = int(bytes_per_frame)
    n_frames = F.expr(f"(length(content) + {bpf - 1}) div {bpf}")
    idx = F.sequence(F.lit(0), (n_frames - 1).cast("int"), F.lit(every_n))
    vids = df.filter((F.col("kind") == "video") & (F.length("content") > 0))
    return (
        vids.withColumn("frame_idx", F.explode(idx))
        .select(
            "media_id",
            "frame_idx",
            # STUB: the frame's own payload slice stands in for decode
            F.substring(
                F.col("content"), F.col("frame_idx") * bpf + 1, bpf
            ).alias("frame_bytes"),
        )
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("zcr", LongType()),
        StructField("peak", LongType()),
    ]
)

RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def make_wav(samples: np.ndarray, rate: int) -> bytes:
    """Deterministic RIFF/WAVE encoder for fixtures: canonical 44-byte
    header + 16-bit little-endian mono PCM. Byte size has the closed form
    44 + 2*n, so SQL oracles can predict n_bytes of real audio binaries
    (the audio analog of :func:`make_png`)."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _g711_expand(data: bytes, alaw: bool) -> np.ndarray:
    """G.711 μ-law / A-law → linear int16 (ITU-T G.711 public spec) —
    the telephony-corpus WAV shapes (format tags 6/7). Pure numpy table
    expansion, exact per the standard decode formulas."""
    codes = np.arange(256, dtype=np.int64)
    if alaw:
        c = codes ^ 0x55
        sign = np.where(c & 0x80, 1, -1)
        exp = (c >> 4) & 0x07
        mant = c & 0x0F
        mag = np.where(
            exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1)
        )
        table = (sign * mag).astype(np.int16)
    else:
        c = ~codes & 0xFF
        sign = np.where(c & 0x80, -1, 1)
        exp = (c >> 4) & 0x07
        mant = c & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        table = (sign * mag).astype(np.int16)
    return table[np.frombuffer(data, dtype=np.uint8)]


# IMA/DVI ADPCM tables (public IMA spec, 1992)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_IMA_STEP = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    dtype=np.int64,
)


# precomputed (step_index × nibble) transition tables: signed delta and
# next step index — turns the per-sample recursion into two 2-D gathers
_IMA_GRID_IDX = np.arange(89)[:, None]
_IMA_GRID_NIB = np.arange(16)[None, :]
_IMA_SDIFF = (
    (_IMA_STEP[_IMA_GRID_IDX] >> 3)
    + np.where(_IMA_GRID_NIB & 1, _IMA_STEP[_IMA_GRID_IDX] >> 2, 0)
    + np.where(_IMA_GRID_NIB & 2, _IMA_STEP[_IMA_GRID_IDX] >> 1, 0)
    + np.where(_IMA_GRID_NIB & 4, _IMA_STEP[_IMA_GRID_IDX], 0)
) * np.where(_IMA_GRID_NIB & 8, -1, 1)
_IMA_NEXT = np.clip(_IMA_GRID_IDX + _IMA_INDEX[_IMA_GRID_NIB & 7], 0, 88)


def _ima_adpcm_decode_all(data: bytes, block_align: int) -> np.ndarray:
    """Decode a whole mono IMA ADPCM stream VECTORIZED ACROSS BLOCKS:
    every block carries its own (predictor, step index) header, so
    blocks are independent — the inherently-sequential sample recursion
    runs once per sample POSITION with numpy operating on all blocks in
    lock-step (~60× over the per-sample Python loop; rates in SCALE.md).
    A ragged final block falls back to the per-block reference decoder
    ``_ima_adpcm_decode_block``, which doubles as the differential
    oracle in tests."""
    n_full = len(data) // block_align
    out_parts = []
    if n_full:
        blocks = np.frombuffer(
            data[: n_full * block_align], np.uint8
        ).reshape(n_full, block_align)
        pred = (
            blocks[:, :2].copy().view("<i2")[:, 0].astype(np.int64)
        )
        idx = blocks[:, 2].astype(np.int64)
        if int(idx.max(initial=0)) > 88:
            raise ValueError("WAV: bad ADPCM step index")
        body = blocks[:, 4:].astype(np.int64)
        n_nibs = body.shape[1] * 2
        nibs = np.empty((n_full, n_nibs), np.int64)
        nibs[:, 0::2] = body & 0x0F
        nibs[:, 1::2] = body >> 4
        out = np.empty((n_full, 1 + n_nibs), np.int64)
        out[:, 0] = pred  # the header predictor IS the first sample
        for j in range(n_nibs):
            nib = nibs[:, j]
            pred = pred + _IMA_SDIFF[idx, nib]
            np.clip(pred, -32768, 32767, out=pred)
            idx = _IMA_NEXT[idx, nib]
            out[:, j + 1] = pred
        out_parts.append(out.reshape(-1))
    tail = data[n_full * block_align :]
    if tail:
        if len(tail) < 4:
            raise ValueError("WAV: truncated ADPCM block header")
        pred_t, idx_t, _rsv = struct.unpack("<hBB", tail[:4])
        if idx_t > 88:
            raise ValueError("WAV: bad ADPCM step index")
        out_parts.append(
            np.array(
                [pred_t] + _ima_adpcm_decode_block(tail[4:], pred_t, idx_t),
                np.int64,
            )
        )
    if not out_parts:
        return np.empty(0, np.int16)
    return np.concatenate(out_parts).astype(np.int16)


def _ima_adpcm_decode_block(data: bytes, pred: int, idx: int) -> list[int]:
    """One mono IMA ADPCM block body (nibble stream, low nibble first) →
    linear int16 samples, standard reconstruction arithmetic."""
    out = []
    for byte in data:
        for nib in (byte & 0x0F, byte >> 4):
            step = int(_IMA_STEP[idx])
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
            out.append(pred)
    return out


def _ima_adpcm_encode(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Mono IMA ADPCM encoder (fixture generator): standard greedy
    nibble quantization with decoder-mirrored state update; the stream
    pads to whole blocks (decode length = ceil-to-block samples)."""
    s = np.asarray(samples, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    out = bytearray()
    pos = 0
    pred, idx = 0, 0
    while pos < len(s):
        block = s[pos : pos + spb]
        pred = int(block[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for v in block[1:]:
            step = int(_IMA_STEP[idx])
            diff = int(v) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            rec = step >> 3
            if diff >= step:
                nib |= 4
                diff -= step
                rec += step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
                rec += step >> 1
            if diff >= step >> 2:
                nib |= 1
                rec += step >> 2
            pred = pred - rec if nib & 8 else pred + rec
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
            nibbles.append(nib)
        nibbles += [0] * (spb - 1 - len(nibbles))  # pad the final block
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
        pos += spb
    return bytes(out)


def make_adpcm_wav(samples: np.ndarray, rate: int, block_align: int = 256) -> bytes:
    """Mono IMA ADPCM RIFF/WAVE fixture encoder (format tag 0x11)."""
    data = _ima_adpcm_encode(samples, block_align)
    spb = (block_align - 4) * 2 + 1
    fmt = struct.pack(
        "<HHIIHH", 0x11, 1, rate, rate * block_align // spb, block_align, 4
    ) + struct.pack("<HH", 2, spb)  # cbSize=2, samples-per-block
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE payload → (sample_rate, channels, samples int16).

    Real pure-stdlib decode of the formats that dominate raw-audio
    corpora: chunk walk over RIFF, `fmt ` for params, `data` for frames.
    Decoded sample shapes — all normalized to int16:

    * tag 1 (integer PCM) at 16-bit (native), 8-bit (unsigned, shifted
      and scaled up), and 32-bit (high 16 bits kept);
    * tag 3 (IEEE float) at 32-bit, clipped to [-1, 1] and scaled;
    * tags 6/7 (G.711 A-law / μ-law) via exact table expansion;
    * tag 0x11 (IMA/DVI ADPCM, mono) via the standard step/index-table
      reconstruction — a real COMPRESSED audio codec (4:1), block
      headers carrying (predictor, step index) per the IMA spec;
    * tag 0xFFFE (EXTENSIBLE) resolves through its SubFormat GUID.

    Perceptual codecs (mp3/aac/opus) and multi-channel ADPCM need a real
    decoder — swap for soundfile/ffmpeg in one place. Raises
    ValueError/struct.error on malformed input (DECODE_ERRORS)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, channels, bits, tag, data = 12, None, None, None, None, None
    block_align = 0
    while pos + 8 <= len(content):
        ctype = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            # a payload truncated in transit would otherwise decode to a
            # plausible-looking shorter clip instead of the corrupt-row
            # sentinel
            raise ValueError("WAV: truncated chunk")
        if ctype == b"fmt ":
            tag, channels, rate, _br, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: the real format is the first
                # two bytes of the SubFormat GUID at offset 24
                if clen < 40:
                    raise ValueError("WAV: truncated EXTENSIBLE fmt")
                (tag,) = struct.unpack("<H", body[24:26])
            if channels < 1 or rate < 1:
                # a zero here would surface later as ZeroDivisionError,
                # which is not a DECODE_ERRORS member
                raise ValueError("WAV: invalid channel count or sample rate")
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    if tag == 1 and bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif tag == 1 and bits == 8:
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
        samples = ((u - 128) << 8).astype(np.int16)
    elif tag == 1 and bits == 32:
        samples = (
            np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4") >> 16
        ).astype(np.int16)
    elif tag == 3 and bits == 32:
        f = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4")
        samples = np.clip(np.round(f.astype(np.float64) * 32767.0), -32768, 32767).astype(np.int16)
    elif tag == 6 and bits == 8:
        samples = _g711_expand(data, alaw=True)
    elif tag == 7 and bits == 8:
        samples = _g711_expand(data, alaw=False)
    elif tag == 0x11 and bits == 4:
        if channels != 1:
            raise ValueError("WAV: only mono IMA ADPCM supported")
        if block_align < 5:
            raise ValueError("WAV: bad ADPCM block align")
        samples = _ima_adpcm_decode_all(data, block_align)
    else:
        raise ValueError(f"WAV: unsupported format tag {tag} at {bits} bits")
    return int(rate), int(channels), samples


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas (Arrow-batched).

    Input: MEDIA_SCHEMA rows with kind='audio'. Output:
    AUDIO_FEATURES_SCHEMA — sample rate / channel count / duration from
    the real WAV header, and numpy signal stats over the decoded PCM:
    RMS energy, zero-crossing count (strict sign flips), peak amplitude.
    Multi-channel PCM is decoded but the signal stats treat the
    interleaved stream as one signal (exact for mono — the fixture and
    dominant corpus shape; de-interleave before the stats if per-channel
    numbers matter). Undecodable payloads surface as -1 dims rather than
    failing the job
    (one corrupt clip must never abort a 100 TB pass). At scale the same
    rules as images apply: binaries in their own pruned column,
    ``repartition`` by bytes before the decode stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                content = bytes(payload) if payload is not None else b""
                try:
                    rate, channels, s = decode_audio(content)
                    n = int(s.size)
                    x = s.astype(np.int64)
                    rms = float(np.sqrt((x * x).sum() / n)) if n else 0.0
                    zcr = int(np.count_nonzero(x[1:] * x[:-1] < 0)) if n > 1 else 0
                    peak = int(np.abs(x).max()) if n else 0
                    out.append(
                        {
                            "media_id": media_id,
                            "sample_rate": rate,
                            "channels": channels,
                            "n_samples": n,
                            # duration follows FRAMES (interleaved samples
                            # / channels), not raw sample count — a stereo
                            # clip is not twice as long
                            "duration_ms": (n // channels) * 1000 // rate,
                            "rms": rms,
                            "zcr": zcr,
                            "peak": peak,
                        }
                    )
                except DECODE_ERRORS:
                    out.append(
                        {
                            "media_id": media_id,
                            "sample_rate": -1,
                            "channels": -1,
                            "n_samples": -1,
                            "duration_ms": -1,
                            # NULL, not 0.0: silence is a legitimate rms
                            # (same contract as resize's mean_luma)
                            "rms": None,
                            "zcr": -1,
                            "peak": -1,
                        }
                    )
            pdf_out = pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )
            # keep corrupt-row rms a true NULL: in a plain float64 column
            # pandas coerces None -> NaN, which Arrow transmits as NaN
            pdf_out["rms"] = pd.array(pdf_out["rms"], dtype="Float64")
            yield pdf_out

    auds = df.filter(F.col("kind") == "audio").select("media_id", "content")
    return auds.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def _resample(gray: np.ndarray, width: int, height: int, method: str) -> np.ndarray:
    """Resample a float bitmap to (height, width). ``'nearest'`` picks the
    phash64 grid sample; ``'box'`` area-averages each source block via an
    integral image. Upscaling makes some target blocks empty under pure
    floor arithmetic — those are clamped to at least one source pixel
    (edge repeat), never a 0/0."""
    hh, ww = gray.shape
    if method == "nearest":
        iy = (np.arange(height) * hh) // height
        ix = (np.arange(width) * ww) // width
        return gray[np.ix_(iy, ix)]
    ey = (np.arange(height + 1) * hh) // height
    ex = (np.arange(width + 1) * ww) // width
    # clamp empty blocks (target dim > source dim) to one source pixel
    y0 = np.minimum(ey[:-1], hh - 1)
    x0 = np.minimum(ex[:-1], ww - 1)
    y1 = np.maximum(ey[1:], y0 + 1)
    x1 = np.maximum(ex[1:], x0 + 1)
    csum = np.zeros((hh + 1, ww + 1))
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return (
        csum[np.ix_(y1, x1)]
        - csum[np.ix_(y0, x1)]
        - csum[np.ix_(y1, x0)]
        + csum[np.ix_(y0, x0)]
    ) / area


def resize_images(
    df: DataFrame, width: int = 8, height: int = 8, method: str = "box",
    decoder=None,
) -> DataFrame:
    """Resize image payloads via mapInPandas: decode PNG pixels, resample
    to (width, height), re-encode as deterministic grayscale PNG.

    ``method='box'`` averages each source block (area interpolation — the
    right default for downscaling before a vision encoder); ``'nearest'``
    picks the top-left sample of each block, matching :func:`phash64`'s
    grid so oracles can recompute pixels in closed form. Output carries the
    resized binary plus ``mean_luma`` of the resized bitmap (a brightness
    stat downstream quality filters use). Undecodable payloads → width -1,
    NULL content. PNG, JPEG (baseline AND progressive) and GIF decode for
    real; the undecodable bucket is now only lossless/arithmetic-coded
    JPEG and containers outside PNG/JPEG/GIF (swap a codec into
    :func:`_gray_pixels` to extend)."""
    if method not in ("box", "nearest"):
        raise ValueError(f"resize_images: unknown method {method!r}")
    if width < 1 or height < 1:
        raise ValueError("resize_images: target dimensions must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                content = bytes(payload) if payload is not None else b""
                try:
                    gray = _gray_pixels_with(content, decoder)
                    small = _resample(gray, width, height, method)
                    small_u8 = np.clip(np.floor(small), 0, 255).astype(np.uint8)
                    out.append(
                        {
                            "media_id": media_id,
                            "width": width,
                            "height": height,
                            "content": make_png(small_u8),
                            "mean_luma": float(small_u8.mean()),
                        }
                    )
                except DECODE_ERRORS:
                    out.append(
                        {
                            "media_id": media_id,
                            "width": -1,
                            "height": -1,
                            "content": None,
                            "mean_luma": None,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_IMAGE_SCHEMA.fields]
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(run, schema=RESIZED_IMAGE_SCHEMA)


IMAGE_LUMA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("luma_sum", LongType()),
        StructField("luma_min", IntegerType()),
        StructField("luma_max", IntegerType()),
    ]
)


def image_luma_stats(df: DataFrame, decoder=None) -> DataFrame:
    """Exact integer brightness stats from REAL pixel decode (PNG and
    baseline JPEG): per image-kind row, the decoded bitmap's dimensions
    and integer luma sum/min/max — the brightness signal a pretraining
    quality filter thresholds on (all-black/all-white frames, washed-out
    scans), and a closed-form differential target: for block-flat
    fixtures JPEG quality-100 decode is EXACT, so a SQL oracle can
    recompute every output from the pattern (q104). Undecodable payloads
    → -1 sentinels. Arrow-batched mapInPandas; only fixed-width stats
    leave the worker, never bitmaps."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                content = bytes(payload) if payload is not None else b""
                try:
                    gray = np.round(_gray_pixels_with(content, decoder)).astype(np.int64)
                    h, w = gray.shape
                    out.append(
                        {
                            "media_id": media_id,
                            "width": w,
                            "height": h,
                            "luma_sum": int(gray.sum()),
                            "luma_min": int(gray.min()),
                            "luma_max": int(gray.max()),
                        }
                    )
                except DECODE_ERRORS:
                    out.append(
                        {
                            "media_id": media_id,
                            "width": -1,
                            "height": -1,
                            "luma_sum": -1,
                            "luma_min": -1,
                            "luma_max": -1,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_LUMA_SCHEMA.fields]
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(run, schema=IMAGE_LUMA_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata pass that never touches the binary column's bytes
    beyond length — column pruning keeps the payload out of the scan when
    only meta/mime are selected."""
    return df.select(
        "media_id",
        "kind",
        "mime",
        F.length(F.col("content")).alias("n_bytes"),
        F.get_json_object(F.col("meta"), "$.source").alias("meta_source"),
    )


def phash_neardup_pairs(
    features: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the visual analog of ``dedup.simhash_pairs`` over the output of
    :func:`extract_image_features` (re-encodes, resizes, and mild edits
    land within a few bits of the 64-bit DCT pHash; unrelated images ~32).

    Same candidate generation as the text path (the shared
    ``dedup.hamming_neardup_pairs`` kernel): block-permutation join
    while blocks stay wide, two-block agreement past radius 4 (the
    default d=6 would otherwise join on 9-bit / 512-value keys — a
    near-cross-join on any large image corpus). Only (id, phash) rows
    move; image bytes never enter the join. Returns (id_a, id_b,
    hamming), id_a < id_b.
    """
    from .dedup import hamming_neardup_pairs

    return hamming_neardup_pairs(
        features, hash_col=hash_col, id_col=id_col, max_hamming=max_hamming
    )


# --------------------------------------------------------------------------
# video: YUV4MPEG2 (Y4M) — a real headered stream format, pure-python
# --------------------------------------------------------------------------

# chroma subsampling factors (sx, sy) per YUV4MPEG2 colorspace tag; the
# C420 siting variants (jpeg/paldv/mpeg2) differ only in sample POSITION,
# which does not change plane sizes or byte layout
_Y4M_SUBSAMPLE = {
    "C420": (2, 2),
    "C420jpeg": (2, 2),
    "C420paldv": (2, 2),
    "C420mpeg2": (2, 2),
    "C422": (2, 1),
    "C411": (4, 1),
    "C444": (1, 1),
}


def _y4m_plane_dims(colorspace: str, w: int, h: int):
    """(chroma_w, chroma_h, has_alpha) for a colorspace; None chroma for
    Cmono. Raises ValueError for dims not divisible by the subsampling
    (the spec's plane math is undefined there) and for unknown tags."""
    if colorspace == "Cmono":
        return None, None, False
    if colorspace == "C444alpha":
        return w, h, True
    sub = _Y4M_SUBSAMPLE.get(colorspace)
    if sub is None:
        raise ValueError(f"unknown Y4M colorspace {colorspace}")
    sx, sy = sub
    if w % sx or h % sy:
        raise ValueError(
            f"Y4M {colorspace}: dimensions {w}x{h} not divisible by "
            f"the {sx}x{sy} chroma subsampling"
        )
    return w // sx, h // sy, False


def make_y4m(
    frames: np.ndarray,
    fps: int = 25,
    colorspace: str = "Cmono",
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    alpha: np.ndarray | None = None,
) -> bytes:
    """Encode uint8 planes as a real YUV4MPEG2 stream. ``frames`` is the
    (n, h, w) luma; chroma-carrying colorspaces (C420 and its siting
    variants, C411, C422, C444, C444alpha) take matching (n, ch, cw)
    ``cb``/``cr`` stacks (and (n, h, w) ``alpha`` for C444alpha) sized
    per the subsampling. Complements ``make_png``/``make_wav``: every
    media kind round-trips through an actual container format, so the
    decoder is testable against hand-built streams of every spec
    colorspace."""
    if frames.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = frames.shape
    cw, ch, has_alpha = _y4m_plane_dims(colorspace, w, h)
    parts = [f"YUV4MPEG2 W{w} H{h} F{int(fps)}:1 Ip A1:1 {colorspace}\n".encode()]
    if cw is None:
        if cb is not None or cr is not None or alpha is not None:
            raise ValueError("Cmono carries no chroma/alpha planes")
        planes = [np.asarray(frames, np.uint8)]
    else:
        if cb is None or cr is None:
            raise ValueError(f"{colorspace} requires cb and cr planes")
        cb = np.asarray(cb, np.uint8)
        cr = np.asarray(cr, np.uint8)
        if cb.shape != (n, ch, cw) or cr.shape != (n, ch, cw):
            raise ValueError(
                f"{colorspace} chroma must be {(n, ch, cw)}, got "
                f"{cb.shape} / {cr.shape}"
            )
        planes = [np.asarray(frames, np.uint8), cb, cr]
        if has_alpha:
            if alpha is None or np.asarray(alpha).shape != (n, h, w):
                raise ValueError("C444alpha requires an (n, h, w) alpha plane")
            planes.append(np.asarray(alpha, np.uint8))
        elif alpha is not None:
            raise ValueError(f"{colorspace} carries no alpha plane")
    for i in range(n):
        parts.append(b"FRAME\n")
        for pl in planes:
            parts.append(pl[i].tobytes())
    return b"".join(parts)


def decode_y4m(content: bytes, planes: bool = False):
    """Parse a YUV4MPEG2 stream: header params, then FRAME-delimited
    plane sets. Every colorspace the spec names decodes — Cmono, the
    C420 siting variants, C411, C422, C444, C444alpha (plane sizes per
    ``_y4m_plane_dims``); unknown tags raise ValueError.

    Default return is the luma surface ``(width, height, y[n, h, w])`` —
    the Y plane IS the luma in Y'CbCr, no conversion needed. With
    ``planes=True`` returns ``(width, height, colorspace, y, cb, cr,
    alpha)`` where cb/cr are the RAW subsampled stacks (n, ch, cw) and
    cb/cr/alpha are None when the colorspace lacks them — callers that
    want RGB or chroma stats get the exact stored samples."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420"  # the format's default when absent
    for tok in content[:nl].split(b" ")[1:]:
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "C":
            colorspace = "C" + val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    cw, ch, has_alpha = _y4m_plane_dims(colorspace, w, h)
    y_sz = w * h
    c_sz = (cw * ch) if cw is not None else 0
    frame_sz = y_sz + 2 * c_sz + (y_sz if has_alpha else 0)
    ys, cbs, crs, als = [], [], [], []
    pos = nl + 1
    n_ = len(content)
    while pos < n_:
        fnl = content.find(b"\n", pos)
        if fnl < 0 or not content[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        start = fnl + 1
        if start + frame_sz > n_:
            raise ValueError("truncated Y4M frame")
        ys.append(
            np.frombuffer(content[start : start + y_sz], np.uint8).reshape(h, w)
        )
        pos = start + y_sz
        if c_sz:
            cbs.append(
                np.frombuffer(content[pos : pos + c_sz], np.uint8).reshape(ch, cw)
            )
            crs.append(
                np.frombuffer(
                    content[pos + c_sz : pos + 2 * c_sz], np.uint8
                ).reshape(ch, cw)
            )
            pos += 2 * c_sz
        if has_alpha:
            als.append(
                np.frombuffer(content[pos : pos + y_sz], np.uint8).reshape(h, w)
            )
            pos += y_sz
    y = np.stack(ys) if ys else np.empty((0, h, w), np.uint8)
    if not planes:
        return w, h, y
    cb = np.stack(cbs) if cbs else (np.empty((0, ch, cw), np.uint8) if c_sz else None)
    cr = np.stack(crs) if crs else (np.empty((0, ch, cw), np.uint8) if c_sz else None)
    al = np.stack(als) if als else (np.empty((0, h, w), np.uint8) if has_alpha else None)
    return w, h, colorspace, y, cb, cr, al


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("luma_sum", LongType()),
        StructField("luma_max", IntegerType()),
    ]
)


def extract_video_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling: decode Y4M streams AND animated GIFs
    (composited per the GIF89a disposal/transparency rules,
    :func:`traildb_spark.operators.gif.decode_gif_frames`), keep every
    ``every_n``-th frame, emit exact integer luma stats per kept frame —
    the decode→frame-sample→feature contract of a training-data video
    pipeline with actual codecs behind it (``sample_video_frames``
    remains the format-agnostic stub-arithmetic plumbing for opaque
    payloads). Arrow-batched mapInPandas; only fixed-width stats leave
    the worker, never pixel planes."""
    from .gif import decode_gif_frames

    every_n = int(every_n)  # normalized: range() below needs a real int
    if every_n < 1:
        raise ValueError("extract_video_frames: every_n must be >= 1")
    vids = df.filter(F.col("kind") == "video").select("media_id", "content")

    def decode(content: bytes):
        if content[:6] in (b"GIF87a", b"GIF89a"):
            w, h, luma = decode_gif_frames(content)
            return w, h, np.round(luma).astype(np.uint8)
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            return decode_avi_frames(content)
        return decode_y4m(content)

    def run(batches):
        for pdf in batches:
            ids, fidx, ws, hs, ns, sums, maxs = [], [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    w, h, frames = decode(bytes(content))
                except DECODE_ERRORS:
                    # corrupt / non-Y4M payload → sentinel row, never a
                    # failed task (same contract as the image and audio
                    # extractors); chroma-carrying streams decode for
                    # real (luma = the Y plane)
                    ids.append(int(mid))
                    fidx.append(-1)
                    ws.append(-1)
                    hs.append(-1)
                    ns.append(-1)
                    sums.append(0)
                    maxs.append(-1)
                    continue
                n = int(frames.shape[0])
                for i in range(0, n, every_n):
                    f = frames[i]
                    ids.append(int(mid))
                    fidx.append(i)
                    ws.append(w)
                    hs.append(h)
                    ns.append(n)
                    sums.append(int(f.astype(np.int64).sum()))
                    maxs.append(int(f.max()) if f.size else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "luma_sum": pd.Series(sums, dtype="int64"),
                    "luma_max": pd.Series(maxs, dtype="int32"),
                }
            )

    return vids.mapInPandas(run, VIDEO_FRAMES_SCHEMA)


VIDEO_CHROMA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("colorspace", StringType()),
        StructField("luma_sum", LongType()),
        StructField("cb_sum", LongType()),
        StructField("cr_sum", LongType()),
    ]
)


def extract_video_chroma(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Full-plane Y4M decode: per kept frame, exact integer sums of the
    Y plane AND the RAW subsampled Cb/Cr planes, plus the stream's
    colorspace tag — the proof the chroma path reads the stored chroma
    SAMPLES, not just strides past them (a stride-only decoder gets
    luma_sum right and cb_sum/cr_sum wrong). Cmono streams report NULL
    chroma sums; corrupt/non-Y4M payloads emit the frame_idx -1 sentinel
    row like :func:`extract_video_frames`. Arrow-batched mapInPandas;
    only fixed-width stats leave the worker, never pixel planes."""
    every_n = int(every_n)  # normalized: range() below needs a real int
    if every_n < 1:
        raise ValueError("extract_video_chroma: every_n must be >= 1")
    vids = df.filter(F.col("kind") == "video").select("media_id", "content")

    def run(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                f.name: [] for f in VIDEO_CHROMA_SCHEMA.fields
            }

            def emit(mid, fi, w, h, n, cs, ls, cbs_, crs_):
                rows["media_id"].append(int(mid))
                rows["frame_idx"].append(fi)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(n)
                rows["colorspace"].append(cs)
                rows["luma_sum"].append(ls)
                rows["cb_sum"].append(cbs_)
                rows["cr_sum"].append(crs_)

            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    w, h, cs, y, cb, cr, _ = decode_y4m(
                        bytes(content), planes=True
                    )
                except DECODE_ERRORS:
                    emit(mid, -1, -1, -1, -1, None, 0, None, None)
                    continue
                n = int(y.shape[0])
                for i in range(0, n, every_n):
                    emit(
                        mid, i, w, h, n, cs,
                        int(y[i].astype(np.int64).sum()),
                        int(cb[i].astype(np.int64).sum()) if cb is not None else None,
                        int(cr[i].astype(np.int64).sum()) if cr is not None else None,
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "colorspace": pd.Series(rows["colorspace"], dtype="object"),
                    "luma_sum": pd.Series(rows["luma_sum"], dtype="int64"),
                    "cb_sum": pd.Series(rows["cb_sum"], dtype="Int64"),
                    "cr_sum": pd.Series(rows["cr_sum"], dtype="Int64"),
                }
            )

    return vids.mapInPandas(run, VIDEO_CHROMA_SCHEMA)


# --------------------------------------------------------------------------
# netpbm (PGM/PPM) — the uncompressed interchange family
# --------------------------------------------------------------------------

def _pnm_header(content: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a netpbm header: (magic, width, height, maxval, data_offset).
    Token grammar per the spec: magic, then whitespace-separated decimal
    tokens with ``#``-to-EOL comments allowed anywhere between them;
    binary sample data begins after EXACTLY ONE whitespace byte following
    maxval. P1/P4 (bitmaps) have no maxval token."""
    magic = content[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise ValueError("not a netpbm payload")
    want = 2 if magic in (b"P1", b"P4") else 3
    vals = []
    i = 2
    n = len(content)
    while len(vals) < want:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if i < n and content[i : i + 1] == b"#":
            while i < n and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and content[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("netpbm: malformed header token")
        vals.append(int(content[i:j]))
        i = j
    if magic in (b"P1", b"P4"):
        vals.append(1)
    else:
        i += 1  # exactly one whitespace byte separates maxval from data
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (1 <= maxval <= 65535):
        raise ValueError("netpbm: bad dimensions or maxval")
    return magic, w, h, maxval, i


def decode_pnm(content: bytes) -> np.ndarray:
    """Decode netpbm P2/P3 (ASCII) and P5/P6 (binary) to float gray
    (H, W) — the zero-compression interchange family every tool can
    write, and the simplest REAL container in the codec suite. Gray
    formats pass samples through (so fixtures are closed-form exact);
    RGB reduces by the same ITU-R 601 luma as the PNG/GIF paths.
    maxval > 255 means two-byte big-endian samples, reduced to the high
    byte exactly like the PNG 16-bit rule; maxval < 255 rescales to
    [0, 255] by round(v * 255 / maxval) (the spec's own brightness
    normalization). P1/P4 bitmaps are rejected (no luma content worth a
    decoder — honest gate, documented like arithmetic JPEG)."""
    magic, w, h, maxval, off = _pnm_header(content)
    if magic in (b"P1", b"P4"):
        raise ValueError("netpbm: P1/P4 bitmaps not supported")
    ch = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * ch
    if magic in (b"P2", b"P3"):
        toks = content[off:].split()
        if len(toks) < count:
            raise ValueError("netpbm: truncated ASCII samples")
        vals = np.array([int(t) for t in toks[:count]], dtype=np.int64)
    else:
        if maxval > 255:
            raw = content[off : off + 2 * count]
            if len(raw) < 2 * count:
                raise ValueError("netpbm: truncated binary samples")
            vals = np.frombuffer(raw, dtype=">u2").astype(np.int64)
        else:
            raw = content[off : off + count]
            if len(raw) < count:
                raise ValueError("netpbm: truncated binary samples")
            vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    if (vals > maxval).any():
        raise ValueError("netpbm: sample exceeds maxval")
    if maxval > 255:
        vals = vals >> 8  # high byte — the PNG 16-bit reduction rule
    elif maxval < 255:
        vals = np.round(vals * 255.0 / maxval).astype(np.int64)
    if ch == 3:
        rgb = vals.reshape(h, w, 3).astype(np.float64)
        return (
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        )
    return vals.reshape(h, w).astype(np.float64)


def make_pnm(
    gray: np.ndarray, binary: bool = True, comment: str | None = "fixture"
) -> bytes:
    """Deterministic 8-bit grayscale netpbm encoder (fixture generator):
    P5 (binary) or P2 (ASCII), optional header comment so tests exercise
    the comment-skipping branch of the parser."""
    a = np.asarray(gray, dtype=np.uint8)
    h, w = a.shape
    c = f"# {comment}\n" if comment else ""
    if binary:
        return f"P5\n{c}{w} {h}\n255\n".encode() + a.tobytes()
    body = "\n".join(" ".join(str(v) for v in row) for row in a.tolist())
    return f"P2\n{c}{w} {h}\n255\n{body}\n".encode()


# --------------------------------------------------------------------------
# AIFF / AIFF-C — the big-endian PCM container (Mac/pro-audio corpora)
# --------------------------------------------------------------------------

def _f80_to_int(b: bytes) -> int:
    """IEEE 754 80-bit extended float → integer (AIFF sampleRate field).
    Integer-exact for every real-world rate: value = mantissa scaled by
    2^(e - 16383 - 63) with the explicit leading-bit 64-bit mantissa."""
    if len(b) != 10:
        raise ValueError("AIFF: bad extended float")
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:])[0]
    if se & 0x8000:
        raise ValueError("AIFF: negative sample rate")
    e = se & 0x7FFF
    if e == 0 and mant == 0:
        return 0
    shift = 16383 + 63 - e
    if shift < 0:
        raise ValueError("AIFF: sample rate overflow")
    return mant >> shift if shift <= 63 else 0


def _int_to_f80(v: int) -> bytes:
    if v <= 0:
        raise ValueError("rate must be positive")
    e = v.bit_length() - 1
    mant = v << (63 - e)
    return struct.pack(">H", 16383 + e) + struct.pack(">Q", mant)


def decode_aiff(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an AIFF / AIFF-C payload → (sample_rate, channels, samples
    int16) — the big-endian sibling of :func:`decode_wav`, same
    normalization contract. Chunk walk over FORM; COMM carries channel
    count, frame count, bit depth, and the sample rate as an 80-bit
    extended float (parsed integer-exactly); SSND carries the frames.
    Depths: 16 native, 8 (SIGNED in AIFF, unlike WAV's unsigned —
    scaled up), 24/32 keep the high 16 bits. AIFF-C compression types
    ``NONE`` (big-endian) and ``sowt`` (the little-endian Mac variant)
    are handled; perceptual AIFC codecs raise (the decode_wav honest-
    gate contract). Odd-length chunks consume their spec pad byte."""
    if content[:4] != b"FORM" or content[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF container")
    pos = 12
    rate = channels = bits = frames = None
    little = False
    data = None
    while pos + 8 <= len(content):
        ctype = content[pos : pos + 4]
        (clen,) = struct.unpack(">I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if ctype == b"COMM":
            channels, frames, bits = struct.unpack(">hIh", body[:8])
            rate = _f80_to_int(body[8:18])
            if len(body) >= 22:  # AIFC: compressionType 4CC
                comp = body[18:22]
                if comp == b"sowt":
                    little = True
                elif comp != b"NONE":
                    raise ValueError(f"AIFF-C compression {comp!r} needs a codec")
        elif ctype == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            data = body[8 + off :]
        pos += 8 + clen + (clen & 1)  # chunks pad to even length
    if None in (rate, channels, bits) or data is None:
        raise ValueError("AIFF: missing COMM or SSND")
    if rate <= 0 or channels <= 0:
        raise ValueError("AIFF: bad rate or channels")
    end = "<" if little else ">"
    if bits == 16:
        s = np.frombuffer(data[: (len(data) // 2) * 2], dtype=f"{end}i2").astype(
            np.int16
        )
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.int8).astype(np.int16)) << 8
    elif bits in (24, 32):
        step = bits // 8
        usable = (len(data) // step) * step
        raw = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, step)
        hi = (
            raw[:, :2] if not little else raw[:, step - 2 :][:, ::-1]
        )
        s = ((hi[:, 0].astype(np.int32) << 8) | hi[:, 1]).astype(np.uint16).view(
            np.int16
        )
    else:
        raise ValueError(f"AIFF: unsupported sample size {bits}")
    if frames is not None:
        s = s[: frames * channels]
    return int(rate), int(channels), s


def make_aiff(samples: np.ndarray, rate: int) -> bytes:
    """Deterministic mono 16-bit AIFF encoder (fixture generator) —
    exercises the 80-bit extended rate field and big-endian frames."""
    s = np.asarray(samples, dtype=np.int16)
    comm = struct.pack(">hIh", 1, len(s), 16) + _int_to_f80(int(rate))
    ssnd = struct.pack(">II", 0, 0) + s.astype(">i2").tobytes()
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def decode_ico(content: bytes) -> np.ndarray:
    """Decode a Windows ICO container to float gray (H, W) — favicon
    processing for web corpora (public ICONDIR spec): pick the LARGEST
    entry, then dispatch its payload — PNG-compressed entries (Vista+)
    go through the PNG path; classic DIB entries are a BITMAPINFOHEADER
    with DOUBLED height (XOR + AND masks) and no file header — decoded
    by synthesizing the BMP header the plain decoder expects and
    dropping the AND mask rows. 8/24/32-bit DIBs supported; 1/4-bit
    raise (honest gate)."""
    if len(content) < 6 or content[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    (n_img,) = struct.unpack("<H", content[4:6])
    if n_img == 0:
        raise ValueError("ICO: empty icon directory")
    best = None
    for i in range(n_img):
        e = content[6 + 16 * i : 22 + 16 * i]
        if len(e) < 16:
            raise ValueError("ICO: truncated directory")
        w, h = e[0] or 256, e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0]:
            best = (w * h, size, off)
    _, size, off = best
    payload = content[off : off + size]
    if payload[:8] == _PNG_SIG:
        return _gray_pixels(payload)
    # classic DIB: BITMAPINFOHEADER with height = 2x (XOR + AND mask)
    if len(payload) < 40:
        raise ValueError("ICO: truncated DIB")
    (hdr_size,) = struct.unpack("<I", payload[:4])
    w, h2 = struct.unpack("<ii", payload[4:12])
    bits = struct.unpack("<H", payload[14:16])[0]
    h = abs(h2) // 2
    # synthesize the file header decode_bmp expects, with the height
    # halved (mask rows dropped) and data offset past the palette
    n_colors = 0
    if bits == 8:
        (stored,) = struct.unpack("<I", payload[32:36])
        n_colors = stored or 256
    data_off = 14 + hdr_size + 4 * n_colors
    fixed = bytearray(payload)
    struct.pack_into("<i", fixed, 8, h if h2 > 0 else -h)
    xor_rows = ((w * bits + 31) // 32) * 4 * h
    body = bytes(fixed[: hdr_size + 4 * n_colors + xor_rows])
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + len(body), 0, 0, data_off)
        + body
    )
    return decode_bmp(bmp)


_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def decode_tga(content: bytes) -> np.ndarray:
    """Decode a Truevision TGA payload to float gray (H, W) — the
    classic game/texture format (public TGA 2.0 spec): 18-byte
    little-endian header, optional image ID, pixels bottom-up unless
    descriptor bit 5 sets top-down. Image types: 2 uncompressed
    truecolor (24/32-bit BGR(A), BT.601 luma like the BMP path), 3
    uncompressed 8-bit grayscale, and their RLE forms 10/11 (packet
    walk: high bit = run, low 7 bits = count-1). Color-mapped types
    (1/9) and 15/16-bit depths raise — the honest-gate contract."""
    if len(content) < 18:
        raise ValueError("not a TGA payload")
    id_len = content[0]
    cmap_type = content[1]
    dtype = content[2]
    w, h = struct.unpack("<HH", content[12:16])
    bpp = content[16]
    desc = content[17]
    if cmap_type != 0 or dtype in (1, 9):
        raise ValueError("TGA: color-mapped images need a palette decoder")
    if dtype not in (2, 3, 10, 11):
        raise ValueError(f"TGA: image type {dtype} not supported")
    if w == 0 or h == 0:
        raise ValueError("TGA: bad dimensions")
    step = bpp // 8
    if (dtype in (2, 10) and bpp not in (24, 32)) or (
        dtype in (3, 11) and bpp != 8
    ):
        raise ValueError(f"TGA: depth {bpp} unsupported for type {dtype}")
    data = content[18 + id_len :]
    n_px = w * h
    if dtype in (2, 3):  # uncompressed
        need = n_px * step
        if len(data) < need:
            raise ValueError("TGA: truncated pixel data")
        px = np.frombuffer(data[:need], dtype=np.uint8).reshape(n_px, step)
    else:  # RLE packet walk
        out = np.empty((n_px, step), dtype=np.uint8)
        pos = filled = 0
        while filled < n_px:
            if pos >= len(data):
                raise ValueError("TGA: truncated RLE stream")
            hdr = data[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            count = min(count, n_px - filled)
            if hdr & 0x80:  # run packet: one pixel repeated
                v = np.frombuffer(data[pos : pos + step], dtype=np.uint8)
                if len(v) < step:
                    raise ValueError("TGA: truncated RLE run")
                out[filled : filled + count] = v
                pos += step
            else:  # raw packet
                need = count * step
                if pos + need > len(data):
                    raise ValueError("TGA: truncated RLE raw packet")
                out[filled : filled + count] = np.frombuffer(
                    data[pos : pos + need], dtype=np.uint8
                ).reshape(count, step)
                pos += need
            filled += count
        px = out
    px = px.reshape(h, w, step)
    if not desc & 0x20:  # origin bottom-left: flip to top-down
        px = px[::-1]
    if step == 1:
        return px[:, :, 0].astype(np.float64)
    # BGR(A) like BMP
    return 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]


def make_tga(gray: np.ndarray, rle: bool = False, top_down: bool = True) -> bytes:
    """Deterministic 8-bit grayscale TGA encoder (fixture generator) —
    type 3 (or 11 with a naive per-row RLE), v2 footer appended so the
    image dispatch can detect the format (TGA has no header magic)."""
    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    dtype = 11 if rle else 3
    desc = 0x20 if top_down else 0
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, dtype, 0, 0, 0, 0, 0, w, h, 8, desc
    )
    rows = g if top_down else g[::-1]
    if not rle:
        body = rows.tobytes()
    else:
        parts = []
        for row in rows:
            i = 0
            while i < len(row):
                j = i
                while j + 1 < len(row) and row[j + 1] == row[i] and j - i < 126:
                    j += 1
                if j > i:  # run of (j - i + 1)
                    parts.append(bytes([0x80 | (j - i), row[i]]))
                    i = j + 1
                else:
                    k = i
                    while (
                        k + 1 < len(row)
                        and row[k + 1] != row[k]
                        and k - i < 126
                    ):
                        k += 1
                    parts.append(bytes([k - i]) + row[i : k + 1].tobytes())
                    i = k + 1
        body = b"".join(parts)
    footer = b"\x00" * 8 + _TGA_FOOTER
    return hdr + body + footer


def decode_au(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a Sun/NeXT .au payload → (sample_rate, channels, samples
    int16) — the third classic PCM container next to WAV and AIFF
    (public next/sun audio file format spec): 24-byte big-endian header
    ``magic '.snd', data_offset, data_size, encoding, rate, channels``
    with an optional annotation up to data_offset. Encodings: 1 G.711
    μ-law and 27 A-law (shared :func:`_g711_expand` tables), 2 signed
    8-bit (scaled up), 3 native 16-bit BE, 4/5 24/32-bit keeping the
    high 16; floats (6/7) and ADPCM raise — the honest-gate contract.
    data_size 0xFFFFFFFF ("unknown") reads to end of payload."""
    if content[:4] != b".snd" or len(content) < 24:
        raise ValueError("not an AU payload")
    off, size, enc, rate, channels = struct.unpack(">IIIII", content[4:24])
    if off < 24 or rate <= 0 or channels <= 0:
        raise ValueError("AU: bad header")
    data = content[off:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    if enc == 1:
        s = _g711_expand(data, alaw=False)
    elif enc == 27:
        s = _g711_expand(data, alaw=True)
    elif enc == 2:
        s = (np.frombuffer(data, dtype=np.int8).astype(np.int16)) << 8
    elif enc == 3:
        s = np.frombuffer(data[: (len(data) // 2) * 2], dtype=">i2").astype(
            np.int16
        )
    elif enc in (4, 5):
        step = 3 if enc == 4 else 4
        usable = (len(data) // step) * step
        raw = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, step)
        s = ((raw[:, 0].astype(np.int32) << 8) | raw[:, 1]).astype(
            np.uint16
        ).view(np.int16)
    else:
        raise ValueError(f"AU: encoding {enc} needs a codec")
    return int(rate), int(channels), s


def make_au(samples: np.ndarray, rate: int, annotation: bytes = b"") -> bytes:
    """Deterministic mono 16-bit-BE AU encoder (fixture generator) —
    exercises the data_offset field via an optional annotation."""
    s = np.asarray(samples, dtype=np.int16).astype(">i2").tobytes()
    off = 24 + len(annotation)
    return (
        b".snd"
        + struct.pack(">IIIII", off, len(s), 3, int(rate), 1)
        + annotation
        + s
    )


def decode_audio(content: bytes) -> tuple[int, int, np.ndarray]:
    """Container dispatch for the audio surface: RIFF/WAVE →
    :func:`decode_wav`, FORM/AIFF(-C) → :func:`decode_aiff`, '.snd' →
    :func:`decode_au`, 'fLaC' → :func:`~.flac.decode_flac`. One call
    site for the extractors, same (rate, channels, int16) contract."""
    if content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(content)
    if content[:4] == b".snd":
        return decode_au(content)
    if content[:20] == _VOC_MAGIC:
        return decode_voc(content)
    if content[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(content)
    return decode_wav(content)


# --------------------------------------------------------------------------
# BMP (Windows bitmap) — uncompressed BI_RGB
# --------------------------------------------------------------------------

def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) Windows bitmap to float gray
    (H, W): BITMAPFILEHEADER + BITMAPINFOHEADER (or the larger V4/V5
    headers — size field tells), bottom-up row order (negative height =
    top-down), rows padded to 4 bytes. Depths: 24-bit BGR and 32-bit
    BGRX via BT.601 luma (same coefficients as the PNG/GIF/PNM paths),
    8-bit through the BGRX palette. RLE compression and 1/4/16-bit
    depths raise — the honest-gate contract (swap FAST_IMAGE_DECODER
    for full coverage)."""
    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise ValueError("BMP: core/OS2 headers not supported")
    w, h_raw = struct.unpack("<ii", content[18:26])
    planes, bits = struct.unpack("<HH", content[26:30])
    (comp,) = struct.unpack("<I", content[30:34])
    if comp != 0:
        raise ValueError(f"BMP: compression {comp} needs a codec")
    if w <= 0 or h_raw == 0:
        raise ValueError("BMP: bad dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bits == 8:
        (n_colors,) = struct.unpack("<I", content[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            content[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)
        if len(pal) < n_colors:
            raise ValueError("BMP: truncated palette")
        pal_luma = (
            0.299 * pal[:, 2] + 0.587 * pal[:, 1] + 0.114 * pal[:, 0]
        )  # palette entries are BGRX
        step = 1
    elif bits in (24, 32):
        step = bits // 8
    else:
        raise ValueError(f"BMP: {bits}-bit depth needs a codec")
    stride = ((w * step) + 3) & ~3
    need = stride * h
    raw = content[data_off : data_off + need]
    if len(raw) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * step]
    if not top_down:
        rows = rows[::-1]
    if bits == 8:
        idx = rows.astype(np.int64)
        if (idx >= len(pal_luma)).any():
            raise ValueError("BMP: palette index out of range")
        return pal_luma[idx]
    px = rows.reshape(h, w, step).astype(np.float64)
    # BGR(X) order
    return 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]


def make_bmp(gray: np.ndarray) -> bytes:
    """Deterministic 8-bit grayscale BMP encoder (fixture generator):
    identity gray palette, bottom-up rows, spec padding — so decoded
    luma equals the input exactly."""
    a = np.asarray(gray, dtype=np.uint8)
    h, w = a.shape
    stride = (w + 3) & ~3
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w] = a[::-1]
    data_off = 14 + 40 + 256 * 4
    size = data_off + stride * h
    file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h, 2835, 2835, 256, 0)
    return file_hdr + info + pal.tobytes() + body.tobytes()


def decode_pcx(content: bytes) -> np.ndarray:
    """Decode a ZSoft PCX payload to float gray (H, W) — the DOS-era
    paint format still common in legacy/game corpora (public ZSoft PCX
    technical reference): 128-byte little-endian header, byte-oriented
    RLE (two high bits set = run of ``byte & 0x3F``, next byte the
    value; anything < 0xC0 is a literal), ``bytes_per_line`` even
    padding per plane per scanline. Supported rasters: 8-bit single
    plane (VGA palette trailer ``0x0C + 768 bytes`` → BT.601 luma on
    the palette RGB; no trailer → indices ARE gray), and 24-bit as 3
    planes per scanline (R row, G row, B row → BT.601). 1/2/4-bit EGA
    depths raise — the honest-gate contract."""
    if len(content) < 128 or content[0] != 0x0A:
        raise ValueError("not a PCX payload")
    version, encoding, bpp = content[1], content[2], content[3]
    if encoding != 1:
        raise ValueError(f"PCX: unknown encoding {encoding}")
    xmin, ymin, xmax, ymax = struct.unpack("<HHHH", content[4:12])
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if w <= 0 or h <= 0:
        raise ValueError("PCX: bad dimensions")
    nplanes = content[65]
    (bpl,) = struct.unpack("<H", content[66:68])
    if bpp != 8 or nplanes not in (1, 3):
        raise ValueError(
            f"PCX: {bpp}-bit x {nplanes}-plane rasters need an EGA decoder"
        )
    if bpl < w:
        raise ValueError("PCX: bytes_per_line shorter than the row")
    data = content[128:]
    total = h * nplanes * bpl
    out = np.empty(total, dtype=np.uint8)
    pos = filled = 0
    n = len(data)
    while filled < total:
        if pos >= n:
            raise ValueError("PCX: truncated RLE stream")
        b = data[pos]
        pos += 1
        if b >= 0xC0:
            if pos >= n:
                raise ValueError("PCX: truncated RLE run")
            count = min(b & 0x3F, total - filled)
            out[filled : filled + count] = data[pos]
            pos += 1
            filled += count
        else:
            out[filled] = b
            filled += 1
    if nplanes == 1:
        idx = out.reshape(h, bpl)[:, :w]
        # VGA palette trailer: version 5 files append 0x0C + 256 RGB
        if version == 5 and len(content) >= 128 + 769 and content[-769] == 0x0C:
            pal = np.frombuffer(content[-768:], dtype=np.uint8).reshape(256, 3)
            rgb = pal[idx].astype(np.float64)
            return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return idx.astype(np.float64)
    planes = out.reshape(h, 3, bpl)[:, :, :w].astype(np.float64)
    return (
        0.299 * planes[:, 0] + 0.587 * planes[:, 1] + 0.114 * planes[:, 2]
    )


def make_pcx(gray: np.ndarray, vga_palette: bool = True) -> bytes:
    """Deterministic 8-bit single-plane PCX encoder (fixture generator):
    spec RLE (values >= 0xC0 always escaped, runs capped at 63, never
    crossing scanlines), even ``bytes_per_line`` padding, optional
    identity VGA palette trailer — either way decoded luma rounds to
    the input index exactly."""
    a = np.asarray(gray, dtype=np.uint8)
    h, w = a.shape
    bpl = w + (w & 1)
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, 1, 8
    hdr[4:12] = struct.pack("<HHHH", 0, 0, w - 1, h - 1)
    hdr[12:16] = struct.pack("<HH", 72, 72)
    hdr[65] = 1
    hdr[66:68] = struct.pack("<H", bpl)
    hdr[68:70] = struct.pack("<H", 1)
    rows = np.zeros((h, bpl), dtype=np.uint8)
    rows[:, :w] = a
    parts = []
    for row in rows:
        i = 0
        while i < len(row):
            j = i
            while j + 1 < len(row) and row[j + 1] == row[i] and j - i < 62:
                j += 1
            count = j - i + 1
            if count > 1 or row[i] >= 0xC0:
                parts.append(bytes([0xC0 | count, row[i]]))
            else:
                parts.append(bytes([row[i]]))
            i = j + 1
    body = b"".join(parts)
    tail = b""
    if vga_palette:
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
        tail = b"\x0c" + pal.tobytes()
    return bytes(hdr) + body + tail


_VOC_MAGIC = b"Creative Voice File\x1a"


def decode_voc(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a Creative Voice (.voc) payload → (sample_rate, channels,
    samples int16) — the fourth classic PCM container (public Creative
    Voice File format spec): 26-byte header with a ones-complement
    version checksum, then typed blocks with 24-bit little-endian
    lengths. Blocks: 1 sound data (rate divisor ``1e6/(256-div)``,
    codec byte), 2 continuation (previous block's codec), 3 silence
    (zero samples appended), 4 marker / 5 text (skipped), 9 extended
    sound data (explicit u32 rate, bits, channels, u16 codec), 0
    terminator. Codecs: 8-bit unsigned PCM (scaled to int16 like WAV's)
    and 16-bit signed LE; ADPCM variants raise — the honest-gate
    contract."""
    if content[:20] != _VOC_MAGIC or len(content) < 26:
        raise ValueError("not a VOC payload")
    (hdr_size, version, check) = struct.unpack("<HHH", content[20:26])
    if hdr_size < 26 or ((~version + 0x1234) & 0xFFFF) != check:
        raise ValueError("VOC: bad header size or version checksum")

    def pcm(data: bytes, codec: int) -> np.ndarray:
        if codec == 0:  # 8-bit unsigned
            return (
                np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
            ) << 8
        if codec == 4:  # 16-bit signed LE
            return np.frombuffer(
                data[: (len(data) // 2) * 2], dtype="<i2"
            ).astype(np.int16)
        raise ValueError(f"VOC: codec {codec} needs an ADPCM decoder")

    pos = hdr_size
    rate: int | None = None
    channels = 1
    codec: int | None = None
    parts: list[np.ndarray] = []
    while pos < len(content):
        btype = content[pos]
        if btype == 0:
            break
        if pos + 4 > len(content):
            raise ValueError("VOC: truncated block header")
        blen = int.from_bytes(content[pos + 1 : pos + 4], "little")
        data = content[pos + 4 : pos + 4 + blen]
        if len(data) < blen:
            raise ValueError("VOC: truncated block body")
        if btype == 1:
            if blen < 2:
                raise ValueError("VOC: short sound-data block")
            div, codec = data[0], data[1]
            if rate is None:
                rate = 1_000_000 // (256 - div)
            parts.append(pcm(data[2:], codec))
        elif btype == 2:
            if codec is None:
                raise ValueError("VOC: continuation before sound data")
            parts.append(pcm(data, codec))
        elif btype == 3:
            if blen < 3:
                raise ValueError("VOC: short silence block")
            n = struct.unpack("<H", data[:2])[0] + 1
            if rate is None:
                rate = 1_000_000 // (256 - data[2])
            parts.append(np.zeros(n, dtype=np.int16))
        elif btype in (4, 5):  # marker / text: metadata, no samples
            pass
        elif btype == 9:
            if blen < 12:
                raise ValueError("VOC: short extended sound-data block")
            r, bits, ch, cod = struct.unpack("<IBBH", data[:8])
            if bits not in (8, 16) or (bits == 8) != (cod == 0):
                raise ValueError(
                    f"VOC: bits {bits} / codec {cod} mismatch"
                )
            rate, channels, codec = int(r), int(ch), int(cod)
            parts.append(pcm(data[12:], codec))
        else:
            raise ValueError(f"VOC: block type {btype} not supported")
        pos += 4 + blen
    if rate is None or not parts:
        raise ValueError("VOC: no sound data")
    return int(rate), int(channels), np.concatenate(parts)


def make_voc(
    samples: np.ndarray,
    rate: int,
    split: bool = False,
    text: bytes = b"",
) -> bytes:
    """Deterministic mono 16-bit-LE VOC encoder (fixture generator):
    correct version checksum, optional leading text block (proves the
    skip walk), type 9 extended sound data, optionally split across a
    type 2 continuation (proves codec carry-over), terminator."""
    s = np.asarray(samples, dtype=np.int16).astype("<i2").tobytes()
    hdr = _VOC_MAGIC + struct.pack(
        "<HHH", 26, 0x010A, (~0x010A + 0x1234) & 0xFFFF
    )
    blocks = b""
    if text:
        body = text + b"\x00"
        blocks += b"\x05" + len(body).to_bytes(3, "little") + body
    cut = (len(s) // 4) * 2 if split else len(s)
    head = struct.pack("<IBBH", int(rate), 16, 1, 4) + b"\x00" * 4 + s[:cut]
    blocks += b"\x09" + len(head).to_bytes(3, "little") + head
    if split and cut < len(s):
        rest = s[cut:]
        blocks += b"\x02" + len(rest).to_bytes(3, "little") + rest
    return hdr + blocks + b"\x00"


def decode_avi_frames(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed ('DIB ') AVI payload → (width, height,
    frames uint8 (N, H, W) luma) — the RIFF video container (public
    AVI/RIFF and BITMAPINFOHEADER specs): word-aligned chunk walk to
    LIST hdrl (``avih`` dims, ``strf`` = BITMAPINFOHEADER + palette)
    and LIST movi ('00db'/'00dc' frame chunks). Each frame is a
    bottom-up BI_RGB DIB raster, decoded by synthesizing a BMP file
    header in front of the stream's own ``strf`` block — the ICO DIB
    route (:func:`decode_ico`), so 8-bit palette / 24 / 32-bit depths
    all ride the tested :func:`decode_bmp` path. Compressed streams
    (biCompression != 0) raise — the honest-gate contract."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            (sz,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            if pos + 8 + sz > end:
                raise ValueError("AVI: truncated chunk")
            yield cid, pos + 8, pos + 8 + sz
            pos += 8 + sz + (sz & 1)

    width = height = None
    strf = None
    frames_raw: list[bytes] = []
    for cid, s, e in walk(12, len(content)):
        if cid != b"LIST":
            continue
        ltype = content[s : s + 4]
        if ltype == b"hdrl":
            for cid2, s2, e2 in walk(s + 4, e):
                if cid2 == b"avih":
                    width, height = struct.unpack(
                        "<II", content[s2 + 32 : s2 + 40]
                    )
                elif cid2 == b"LIST" and content[s2 : s2 + 4] == b"strl":
                    for cid3, s3, e3 in walk(s2 + 4, e2):
                        if cid3 == b"strf" and strf is None:
                            strf = content[s3:e3]
        elif ltype == b"movi":
            for cid2, s2, e2 in walk(s + 4, e):
                if cid2[2:4] in (b"db", b"dc"):
                    frames_raw.append(content[s2:e2])
    if width is None or strf is None:
        raise ValueError("AVI: missing hdrl headers")
    if len(strf) < 40:
        raise ValueError("AVI: short BITMAPINFOHEADER")
    (comp,) = struct.unpack("<I", strf[16:20])
    if comp != 0:
        raise ValueError(f"AVI: compression {comp} needs a codec")
    if not frames_raw:
        raise ValueError("AVI: no frame chunks in movi")
    frames = []
    for fr in frames_raw:
        data_off = 14 + len(strf)
        bmp = (
            b"BM"
            + struct.pack("<IHHI", data_off + len(fr), 0, 0, data_off)
            + strf
            + fr
        )
        frames.append(np.round(decode_bmp(bmp)).astype(np.uint8))
    stacked = np.stack(frames)
    if stacked.shape[1:] != (height, width):
        raise ValueError("AVI: frame dims disagree with avih")
    return int(width), int(height), stacked


def make_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Deterministic 8-bit grayscale AVI encoder (fixture generator):
    identity gray palette in ``strf``, bottom-up '00db' DIB frames with
    4-byte stride padding — decoded rounded luma equals the input
    indices exactly (the BMP identity-palette discipline)."""
    a = np.asarray(frames, dtype=np.uint8)
    n, h, w = a.shape
    stride = (w + 3) & ~3
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h, 2835, 2835, 256, 0
    )
    strf_body = info + pal.tobytes()

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, stride * h, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, stride * h, 0, 0,
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf_body)),
    )
    movi_body = b""
    for f in a:
        raster = np.zeros((h, stride), dtype=np.uint8)
        raster[:, :w] = f[::-1]
        movi_body += chunk(b"00db", raster.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


_RAS_MAGIC = 0x59A66A95


def decode_ras(content: bytes) -> np.ndarray:
    """Decode a Sun Raster (.ras/.sun) payload to float gray (H, W) —
    the SunOS screendump format (public rasterfile.h layout): eight
    big-endian u32 header words, optional equal-RGB colormap stored as
    three planes (all reds, all greens, all blues), rows padded to
    16-bit boundaries. Types: 1 standard, 2 byte-run RLE (``0x80, n,
    v`` = n+1 copies of v; ``0x80, 0`` = one literal 0x80), 3 RGB
    ordering. Depths: 8-bit (colormap → BT.601 luma, or raw gray
    without one) and 24-bit (BGR, type 3 = RGB). 1/32-bit rasters
    raise — the honest-gate contract."""
    if len(content) < 32:
        raise ValueError("not a Sun raster payload")
    (magic, w, h, depth, _length, rtype, maptype, maplen) = struct.unpack(
        ">8I", content[:32]
    )
    if magic != _RAS_MAGIC:
        raise ValueError("not a Sun raster payload")
    if rtype not in (0, 1, 2, 3):
        raise ValueError(f"RAS: type {rtype} not supported")
    if depth not in (8, 24):
        raise ValueError(f"RAS: depth {depth} needs another decoder")
    if w == 0 or h == 0:
        raise ValueError("RAS: bad dimensions")
    cmap = None
    if maptype == 1 and maplen:
        if maplen % 3 or len(content) < 32 + maplen:
            raise ValueError("RAS: malformed colormap")
        n = maplen // 3
        raw = np.frombuffer(content[32 : 32 + maplen], dtype=np.uint8)
        cmap = np.stack([raw[:n], raw[n : 2 * n], raw[2 * n :]], axis=1)
    elif maptype not in (0, 1):
        raise ValueError(f"RAS: colormap type {maptype} not supported")
    data = content[32 + maplen :]
    step = depth // 8
    stride = (w * step + 1) & ~1
    total = stride * h
    if rtype == 2:
        out = np.empty(total, dtype=np.uint8)
        pos = filled = 0
        n_in = len(data)
        while filled < total:
            if pos >= n_in:
                raise ValueError("RAS: truncated RLE stream")
            b = data[pos]
            pos += 1
            if b == 0x80:
                if pos >= n_in:
                    raise ValueError("RAS: truncated RLE flag")
                cnt = data[pos]
                pos += 1
                if cnt == 0:
                    out[filled] = 0x80
                    filled += 1
                else:
                    if pos >= n_in:
                        raise ValueError("RAS: truncated RLE run")
                    k = min(cnt + 1, total - filled)
                    out[filled : filled + k] = data[pos]
                    pos += 1
                    filled += k
            else:
                out[filled] = b
                filled += 1
        raster = out
    else:
        if len(data) < total:
            raise ValueError("RAS: truncated pixel data")
        raster = np.frombuffer(data[:total], dtype=np.uint8)
    rows = raster.reshape(h, stride)[:, : w * step]
    if depth == 8:
        idx = rows.astype(np.int64)
        if cmap is not None:
            if (idx >= len(cmap)).any():
                raise ValueError("RAS: colormap index out of range")
            rgb = cmap[idx].astype(np.float64)
            return (
                0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
            )
        return idx.astype(np.float64)
    px = rows.reshape(h, w, 3).astype(np.float64)
    if rtype == 3:  # RT_FORMAT_RGB
        return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]


def make_ras(gray: np.ndarray, rle: bool = False, colormap: bool = True) -> bytes:
    """Deterministic 8-bit Sun raster encoder (fixture generator):
    identity equal-RGB colormap (or none), 16-bit row padding, optional
    type-2 byte-run RLE with the 0x80 escape — decoded rounded luma
    equals the input indices either way."""
    a = np.asarray(gray, dtype=np.uint8)
    h, w = a.shape
    stride = (w + 1) & ~1
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = a
    flat = rows.reshape(-1)
    if not rle:
        body = flat.tobytes()
        rtype = 1
    else:
        rtype = 2
        parts = []
        i = 0
        n = len(flat)
        while i < n:
            j = i
            while j + 1 < n and flat[j + 1] == flat[i] and j - i < 254:
                j += 1
            count = j - i + 1
            v = int(flat[i])
            if count == 1 and v == 0x80:
                parts.append(bytes([0x80, 0]))  # escaped literal flag byte
            elif count > 2 or v == 0x80:
                parts.append(bytes([0x80, count - 1, v]))
            else:
                parts.append(bytes([v] * count))
            i = j + 1
        body = b"".join(parts)
    maplen = 768 if colormap else 0
    hdr = struct.pack(
        ">8I", _RAS_MAGIC, w, h, 8, len(body), rtype,
        1 if colormap else 0, maplen,
    )
    cmap = b""
    if colormap:
        ramp = bytes(range(256))
        cmap = ramp * 3
    return hdr + cmap + body


def decode_qoi(content: bytes) -> np.ndarray:
    """Decode a QOI (Quite OK Image, qoiformat.org spec v1.0) payload to
    float gray (H, W) via BT.601 luma. QOI is a byte-aligned streaming
    format: a 14-byte header (``qoif``, BE u32 width/height, channels
    3|4, colorspace 0|1) then one chunk per pixel run — RGB (0xFE),
    RGBA (0xFF), INDEX (2-bit tag 0b00 into a 64-slot recently-seen
    array keyed ``(3r+5g+7b+11a) % 64``), DIFF (0b01, three 2-bit
    channel deltas biased +2), LUMA (0b10, 6-bit dg biased +32 plus
    4-bit dr−dg / db−dg biased +8), RUN (0b11, 1..62 repeats of the
    previous pixel), closed by seven 0x00 and one 0x01. Deltas wrap
    mod 256; the implicit start pixel is (0, 0, 0, 255). Truncated
    streams and bad headers raise ValueError (honest-gate contract)."""
    if len(content) < 22 or content[:4] != b"qoif":
        raise ValueError("not a QOI payload")
    w, h = struct.unpack(">II", content[4:12])
    channels, colorspace = content[12], content[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError("QOI: bad channels/colorspace")
    if w == 0 or h == 0:
        raise ValueError("QOI: zero-dimension image")
    total = w * h
    out = np.empty((total, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, filled, n = 14, 0, len(content)
    data = content
    while filled < total:
        if pos >= n:
            raise ValueError("QOI: truncated chunk stream")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > n:
                raise ValueError("QOI: truncated RGB chunk")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > n:
                raise ValueError("QOI: truncated RGBA chunk")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                if pos >= n:
                    raise ValueError("QOI: truncated LUMA chunk")
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:  # QOI_OP_RUN
                run = (byte & 0x3F) + 1
                if filled + run > total:
                    raise ValueError("QOI: run past end of image")
                out[filled : filled + run] = (r, g, b)
                filled += run
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[filled] = (r, g, b)
        filled += 1
    px = out.reshape(h, w, 3).astype(np.float64)
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def make_qoi(gray: np.ndarray) -> bytes:
    """Deterministic QOI encoder (fixture generator): gray values become
    (v, v, v, 255) pixels run through the REAL op ladder — RUN for
    repeats, INDEX for recently-seen values, DIFF/LUMA when the wrapped
    deltas fit, RGB otherwise — so a decoder must implement every chunk
    type to round-trip it. Gray in, gray out: BT.601 weights sum to 1,
    so rounded luma equals the input exactly."""
    a8 = np.asarray(gray, dtype=np.uint8)
    h, w = a8.shape
    flat = a8.reshape(-1)
    parts = [b"qoif" + struct.pack(">II", w, h) + bytes([3, 0])]
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for v in flat:
        v = int(v)
        px = (v, v, v, 255)
        if px == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                parts.append(bytes([0xC0 | (run - 1)]))
                run = 0
            continue
        if run:
            parts.append(bytes([0xC0 | (run - 1)]))
            run = 0
        slot = (v * 3 + v * 5 + v * 7 + 255 * 11) % 64
        if index[slot] == px:
            parts.append(bytes([slot]))
        else:
            index[slot] = px
            dr = (v - pr + 128) % 256 - 128
            dg = (v - pg + 128) % 256 - 128
            db = (v - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                parts.append(
                    bytes([0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)])
                )
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                parts.append(
                    bytes([0x80 | (dg + 32), ((dr - dg + 8) << 4) | (db - dg + 8)])
                )
            else:
                parts.append(bytes([0xFE, v, v, v]))
        pr, pg, pb, pa = px
    if run:
        parts.append(bytes([0xC0 | (run - 1)]))
    parts.append(b"\x00" * 7 + b"\x01")
    return b"".join(parts)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773, public TIFF 6.0 spec
    §9): control byte n in 0..127 copies the next n+1 literals, n in
    129..255 (two's-complement −1..−127) repeats the next byte 257−n
    times, n == 128 is a no-op. Stops at ``expected`` output bytes;
    truncation raises."""
    out = bytearray()
    pos, n = 0, len(data)
    while len(out) < expected:
        if pos >= n:
            raise ValueError("TIFF: truncated PackBits stream")
        c = data[pos]
        pos += 1
        if c == 128:
            continue
        if c < 128:
            if pos + c + 1 > n:
                raise ValueError("TIFF: truncated PackBits literal run")
            out += data[pos : pos + c + 1]
            pos += c + 1
        else:
            if pos >= n:
                raise ValueError("TIFF: truncated PackBits repeat")
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
    return bytes(out[:expected])


def decode_tiff(content: bytes) -> np.ndarray:
    """Decode a baseline-gray TIFF payload to float gray (H, W) — the
    TIFF 6.0 baseline grayscale profile, both byte orders: ``II*\\0``
    little-endian or ``MM\\0*`` big-endian header, a single IFD of
    12-byte entries, strip layout via tags 273/279 (StripOffsets /
    StripByteCounts, possibly out-of-line arrays), compression 1 (none)
    or 32773 (PackBits), photometric 0 (WhiteIsZero → inverted) or 1,
    8-bit single-sample pixels. Multi-sample, tiled, predictor'd, LZW
    and sub-byte forms raise — the honest-gate contract."""
    if len(content) < 8:
        raise ValueError("not a TIFF payload")
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(bo + "I", content[4:8])
    if ifd_off + 2 > len(content):
        raise ValueError("TIFF: truncated IFD offset")
    (n_ent,) = struct.unpack(bo + "H", content[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    base = ifd_off + 2
    if base + 12 * n_ent > len(content):
        raise ValueError("TIFF: truncated IFD")
    for i in range(n_ent):
        e = content[base + 12 * i : base + 12 * i + 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = (typ, cnt, e[8:12])
    type_size = {1: 1, 3: 2, 4: 4}

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return [default]
        typ, cnt, raw = tags[tag]
        if typ not in type_size:
            raise ValueError(f"TIFF: tag {tag} type {typ} not supported")
        sz = type_size[typ] * cnt
        if sz <= 4:
            buf = raw[:sz]
        else:
            (off,) = struct.unpack(bo + "I", raw)
            if off + sz > len(content):
                raise ValueError("TIFF: out-of-line tag value truncated")
            buf = content[off : off + sz]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack(bo + fmt * cnt, buf))

    w = values(256)[0]
    h = values(257)[0]
    bits = values(258, default=8)
    comp = values(259, default=1)[0]
    photo = values(262)[0]
    spp = values(277, default=1)[0]
    offsets = values(273)
    counts = values(279)
    if spp != 1 or bits != [8]:
        raise ValueError("TIFF: only 8-bit single-sample gray supported")
    if comp not in (1, 32773):
        raise ValueError(f"TIFF: compression {comp} needs another decoder")
    if photo not in (0, 1):
        raise ValueError(f"TIFF: photometric {photo} not supported")
    if w == 0 or h == 0:
        raise ValueError("TIFF: zero-dimension image")
    if len(offsets) != len(counts):
        raise ValueError("TIFF: strip offset/count mismatch")
    rows_per_strip = values(278, default=h)[0]
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(content):
            raise ValueError("TIFF: strip beyond payload")
        strip = content[off : off + cnt]
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if n_rows <= 0:
            raise ValueError("TIFF: more strips than rows")
        if comp == 32773:
            raw += _packbits_decode(strip, n_rows * w)
        else:
            if cnt < n_rows * w:
                raise ValueError("TIFF: truncated strip")
            raw += strip[: n_rows * w]
    if len(raw) < w * h:
        raise ValueError("TIFF: pixel data short of width*height")
    px = np.frombuffer(bytes(raw[: w * h]), dtype=np.uint8).reshape(h, w)
    out = px.astype(np.float64)
    return 255.0 - out if photo == 0 else out


def make_tiff(
    gray: np.ndarray,
    packbits: bool = False,
    big_endian: bool = False,
    white_is_zero: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Deterministic baseline-gray TIFF encoder (fixture generator):
    header + pixel strips + trailing IFD, strip layout honoring
    ``rows_per_strip``, optional PackBits compression (runs ≥ 3 become
    repeats, literals chunked at 128), optional big-endian byte order
    and WhiteIsZero photometric (pixels stored inverted) — decoded
    gray equals the input under every flag combination."""
    a = np.asarray(gray, dtype=np.uint8)
    if white_is_zero:
        a = (255 - a.astype(np.int64)).astype(np.uint8)
    h, w = a.shape
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        rows = a[y0 : y0 + rps].reshape(-1)
        if not packbits:
            strips.append(rows.tobytes())
            continue
        parts = []
        i, n = 0, len(rows)
        while i < n:
            j = i
            while j + 1 < n and rows[j + 1] == rows[i] and j - i < 126:
                j += 1
            run = j - i + 1
            if run >= 3:
                parts.append(bytes([257 - run, int(rows[i])]))
                i = j + 1
            else:
                k = i
                while (
                    k < n
                    and k - i < 128
                    and not (
                        k + 2 < n and rows[k] == rows[k + 1] == rows[k + 2]
                    )
                ):
                    k += 1
                parts.append(bytes([k - i - 1]) + rows[i:k].tobytes())
                i = k
        strips.append(b"".join(parts))
    data_start = 8
    offs, cnts, pos = [], [], data_start
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        pos += len(s)
    body = b"".join(strips)
    ifd_off = data_start + len(body)
    n_strips = len(strips)
    extra = b""
    extra_base = ifd_off + 2 + 9 * 12 + 4

    def arr_field(vals: list[int]) -> bytes:
        nonlocal extra
        if len(vals) == 1:
            return struct.pack(bo + "I", vals[0])
        off = extra_base + len(extra)
        extra += struct.pack(bo + "I" * len(vals), *vals)
        return struct.pack(bo + "I", off)

    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, cnt) + val

    entries = [
        entry(256, 4, 1, struct.pack(bo + "I", w)),
        entry(257, 4, 1, struct.pack(bo + "I", h)),
        entry(258, 3, 1, struct.pack(bo + "HH", 8, 0)),
        entry(259, 3, 1, struct.pack(bo + "HH", 32773 if packbits else 1, 0)),
        entry(262, 3, 1, struct.pack(bo + "HH", 0 if white_is_zero else 1, 0)),
        entry(273, 4, n_strips, arr_field(offs)),
        entry(277, 3, 1, struct.pack(bo + "HH", 1, 0)),
        entry(278, 4, 1, struct.pack(bo + "I", rps)),
        entry(279, 4, n_strips, arr_field(cnts)),
    ]
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        bo + "I", ifd_off
    )
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + b"\x00" * 4
    return hdr + body + ifd + extra


def _midi_varint(data: bytes, pos: int) -> tuple[int, int]:
    """SMF variable-length quantity: 7 bits per byte, high bit =
    continuation, ≤ 4 bytes (spec max 0x0FFFFFFF)."""
    v = 0
    for i in range(4):
        if pos >= len(data):
            raise ValueError("MIDI: truncated varint")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise ValueError("MIDI: varint longer than 4 bytes")


def decode_midi(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a Standard MIDI File (SMF format 0/1, public MIDI 1.0 /
    RP-001 spec) into a note table — the symbolic-music analog of
    decode_wav: header chunk (``MThd``, format, ntrks, division),
    per-track event streams with variable-length delta times, running
    status, sysex (F0/F7, length-prefixed, cancels running status) and
    meta events (FF type len), channel voice messages with their
    status-dependent operand counts. Note-on (velocity > 0) pairs with
    the EARLIEST open note-off of the same (channel, pitch) — the
    spec's FIFO overlap rule; note-on with velocity 0 IS a note-off.
    Unclosed notes end at the track's end-of-track tick. SMPTE
    (negative) division raises.

    Returns ``(division, n_tracks, notes)`` where notes is an (N, 6)
    int64 array of (track, channel, pitch, velocity, onset_ticks,
    dur_ticks) sorted by (track, onset, channel, pitch)."""
    if len(content) < 14 or content[:4] != b"MThd":
        raise ValueError("not a MIDI payload")
    (hlen, fmt, ntrks, division) = struct.unpack(">IHHH", content[4:14])
    if hlen != 6:
        raise ValueError("MIDI: bad MThd length")
    if fmt not in (0, 1):
        raise ValueError(f"MIDI: format {fmt} not supported")
    if division & 0x8000:
        raise ValueError("MIDI: SMPTE division not supported")
    if fmt == 0 and ntrks != 1:
        raise ValueError("MIDI: format 0 must have exactly one track")
    pos = 14
    notes: list[tuple[int, int, int, int, int, int]] = []
    n_data = {0x80: 2, 0x90: 2, 0xA0: 2, 0xB0: 2, 0xC0: 1, 0xD0: 1, 0xE0: 2}
    for track in range(ntrks):
        if pos + 8 > len(content) or content[pos : pos + 4] != b"MTrk":
            raise ValueError("MIDI: missing MTrk chunk")
        (tlen,) = struct.unpack(">I", content[pos + 4 : pos + 8])
        data = content[pos + 8 : pos + 8 + tlen]
        if len(data) < tlen:
            raise ValueError("MIDI: truncated track chunk")
        pos += 8 + tlen
        t = 0
        i = 0
        status = None
        open_notes: dict[tuple[int, int], list[tuple[int, int]]] = {}
        ended = False
        while i < len(data) and not ended:
            delta, i = _midi_varint(data, i)
            t += delta
            if i >= len(data):
                raise ValueError("MIDI: truncated event")
            b = data[i]
            if b >= 0x80:
                i += 1
                if b == 0xFF:
                    if i >= len(data):
                        raise ValueError("MIDI: truncated meta event")
                    mtype = data[i]
                    mlen, i2 = _midi_varint(data, i + 1)
                    i = i2 + mlen
                    if i > len(data):
                        raise ValueError("MIDI: truncated meta payload")
                    if mtype == 0x2F:
                        ended = True
                    continue
                if b in (0xF0, 0xF7):
                    slen, i2 = _midi_varint(data, i)
                    i = i2 + slen
                    if i > len(data):
                        raise ValueError("MIDI: truncated sysex payload")
                    status = None
                    continue
                if b < 0x80 or b >= 0xF0:
                    raise ValueError(f"MIDI: unsupported status 0x{b:02x}")
                status = b
            elif status is None:
                raise ValueError("MIDI: data byte with no running status")
            kind = status & 0xF0
            ch = status & 0x0F
            nd = n_data[kind]
            if i + nd > len(data):
                raise ValueError("MIDI: truncated channel message")
            d1 = data[i]
            d2 = data[i + 1] if nd == 2 else 0
            i += nd
            if kind == 0x90 and d2 > 0:
                open_notes.setdefault((ch, d1), []).append((t, d2))
            elif kind == 0x80 or (kind == 0x90 and d2 == 0):
                q = open_notes.get((ch, d1))
                if q:
                    onset, vel = q.pop(0)
                    notes.append((track, ch, d1, vel, onset, t - onset))
        for (ch, pitch), q in open_notes.items():
            for onset, vel in q:
                notes.append((track, ch, pitch, vel, onset, t - onset))
    arr = (
        np.array(sorted(notes, key=lambda r: (r[0], r[4], r[1], r[2])),
                 dtype=np.int64)
        if notes
        else np.empty((0, 6), dtype=np.int64)
    )
    return int(division), int(ntrks), arr


def make_midi(
    notes: list[tuple[int, int, int, int, int]],
    division: int = 480,
    n_tracks: int = 1,
) -> bytes:
    """Deterministic SMF encoder (fixture generator): notes are
    (channel, pitch, velocity, onset_ticks, dur_ticks) tuples spread
    round-robin across ``n_tracks`` tracks (format 0 when one, format 1
    otherwise). Emits real varint deltas, note-on/note-off pairs,
    running status for consecutive same-status events, a tempo meta
    event per track, and end-of-track — exercising every branch
    decode_midi must implement."""

    def varint(v: int) -> bytes:
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    fmt = 0 if n_tracks == 1 else 1
    chunks = [struct.pack(">4sIHHH", b"MThd", 6, fmt, n_tracks, division)]
    for ti in range(n_tracks):
        mine = [n for k, n in enumerate(notes) if k % n_tracks == ti]
        evs: list[tuple[int, int, bytes]] = []  # (tick, order, msg)
        for ch, pitch, vel, onset, dur in mine:
            evs.append((onset, 1, bytes([0x90 | ch, pitch, vel])))
            evs.append((onset + dur, 0, bytes([0x80 | ch, pitch, 0])))
        evs.sort(key=lambda e: (e[0], e[1]))
        body = bytearray(b"\x00\xff\x51\x03\x07\xa1\x20")  # tempo 500000
        t = 0
        last_status = None
        for tick, _, msg in evs:
            body += varint(tick - t)
            t = tick
            if msg[0] == last_status:
                body += msg[1:]  # running status
            else:
                body += msg
                last_status = msg[0]
        end = max((e[0] for e in evs), default=0)
        body += varint(max(0, end - t) + 1) + b"\xff\x2f\x00"
        chunks.append(struct.pack(">4sI", b"MTrk", len(body)) + bytes(body))
    return b"".join(chunks)


def midi_note_stats(df: DataFrame) -> DataFrame:
    """Symbolic-music feature extraction over a media table: one row per
    decodable MIDI payload with the note-table aggregates a
    music-training curation pass filters on (note density, pitch range,
    duration mass). Same shape as the image/audio extractors — Arrow
    mapInPandas, per-payload decode, sentinel-free: undecodable
    payloads are SKIPPED (DECODE_ERRORS), never fatal.

    Returns ``(media_id, division, n_tracks, n_notes, pitch_sum,
    pitch_min, pitch_max, velocity_sum, dur_sum, span_ticks)``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    division, ntrks, notes = decode_midi(bytes(content))
                except DECODE_ERRORS:
                    continue
                if len(notes):
                    onset = notes[:, 4]
                    dur = notes[:, 5]
                    rows.append((
                        int(mid), division, ntrks, len(notes),
                        int(notes[:, 2].sum()), int(notes[:, 2].min()),
                        int(notes[:, 2].max()), int(notes[:, 3].sum()),
                        int(dur.sum()), int((onset + dur).max()),
                    ))
                else:
                    rows.append((int(mid), division, ntrks, 0, 0, None,
                                 None, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "division", "n_tracks", "n_notes",
                    "pitch_sum", "pitch_min", "pitch_max", "velocity_sum",
                    "dur_sum", "span_ticks",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        run,
        schema=(
            "media_id long, division int, n_tracks int, n_notes long,"
            " pitch_sum long, pitch_min int, pitch_max int,"
            " velocity_sum long, dur_sum long, span_ticks long"
        ),
    )


def sniff_container(content: bytes) -> str:
    """Container label from magic bytes alone — no decode, no payload
    walk beyond fixed offsets. Labels match the codecs this module
    ships: png/jpeg/gif/pnm/bmp/tga/ico/pcx/ras/qoi/tiff, wav/aiff/au/voc,
    midi,
    y4m/avi; anything else is 'unknown'. Order matters only where
    magics could overlap (RIFF splits on the form type; the PCX guard
    requires the version/encoding/depth triple)."""
    if content.startswith(_PNG_SIG):
        return "png"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6") and (
        len(content) > 2 and content[2:3].isspace()
    ):
        return "pnm"
    if content[:2] == b"BM":
        return "bmp"
    if content[-18:] == _TGA_FOOTER:
        return "tga"
    if content[:4] == b"\x00\x00\x01\x00":
        return "ico"
    if (
        len(content) >= 128
        and content[0] == 0x0A
        and content[2] == 1
        and content[1] in (0, 2, 3, 4, 5)
        and content[3] in (1, 2, 4, 8)
    ):
        return "pcx"
    if content[:4] == b"\x59\xa6\x6a\x95":
        return "ras"
    if content[:4] == b"qoif":
        return "qoi"
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if content[:4] == b"MThd":
        return "midi"
    if content[:4] == b"RIFF":
        if content[8:12] == b"AVI ":
            return "avi"
        if content[8:12] == b"WAVE":
            return "wav"
        if content[8:12] == b"WEBP":
            return "webp"
        return "unknown"
    if content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if content[:4] == b".snd":
        return "au"
    if content[:4] == b"fLaC":
        return "flac"
    if content[:20] == _VOC_MAGIC:
        return "voc"
    if content[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


def media_inventory(df: DataFrame) -> DataFrame:
    """Container inventory over a media table — the FIRST pass a 100 TB
    multimodal ingest runs: what formats are actually in the corpus,
    how many payloads and bytes each, before any decode strategy is
    chosen (decode throughput differs 100× between containers; this is
    the routing table). Pure magic-byte sniffing via
    :func:`sniff_container` in one Arrow-batched pass; only
    (container, count, bytes) partials leave the workers — the
    aggregate is formats-sized at any corpus size.

    Returns ``(container, n_payloads, total_bytes)``.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            labels = []
            sizes = []
            for content in pdf["content"]:
                if content is None:
                    labels.append("empty")
                    sizes.append(0)
                    continue
                b = bytes(content)
                labels.append(sniff_container(b))
                sizes.append(len(b))
            out = pd.DataFrame({"container": labels, "n": sizes})
            yield out.groupby("container", as_index=False).agg(
                n_payloads=("n", "size"), total_bytes=("n", "sum")
            )

    part = df.select("content").mapInPandas(
        run, schema="container string, n_payloads long, total_bytes long"
    )
    return part.groupBy("container").agg(
        F.sum("n_payloads").alias("n_payloads"),
        F.sum("total_bytes").alias("total_bytes"),
    )


def audio_quality_stats(
    df: DataFrame,
    frame_samples: int = 800,
    silence_rms: int = 100,
    clip_level: int = 32700,
) -> DataFrame:
    """Audio curation gates over decoded PCM: per payload, the frame
    silence profile (RMS < ``silence_rms`` per ``frame_samples``-sample
    frame — trailing partial frames count), clipped-sample count
    (|s| ≥ ``clip_level``), and the integer DC offset (mean sample,
    truncated toward zero) — the "is this clip actually usable"
    screen a speech pipeline runs before transcription. Exact integer
    math over int16 samples (frame RMS compared as sum(x²)·denom² —
    no float sqrt in the predicate), same mapInPandas shape and
    DECODE_ERRORS skip rule as the other extractors.

    Returns ``(media_id, n_samples, n_frames, silent_frames,
    clipped_samples, dc_offset)``.
    """
    if frame_samples < 1:
        raise ValueError("audio_quality_stats: frame_samples must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    _rate, _ch, s = decode_audio(bytes(payload))
                except DECODE_ERRORS:
                    continue
                x = s.astype(np.int64)
                n = int(x.size)
                clipped = int(np.count_nonzero(np.abs(x) >= clip_level))
                tot = int(x.sum())
                # exact truncate-toward-zero (float / loses low bits)
                dc = (tot // n if tot >= 0 else -((-tot) // n)) if n else 0
                silent = 0
                n_frames = 0
                for i in range(0, n, frame_samples):
                    fr = x[i : i + frame_samples]
                    n_frames += 1
                    # rms < thr  <=>  sum(x²) < thr² · len
                    if int((fr * fr).sum()) < silence_rms * silence_rms * len(fr):
                        silent += 1
                rows.append((int(mid), n, n_frames, silent, clipped, dc))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "n_frames",
                         "silent_frames", "clipped_samples", "dc_offset"],
            )

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "content"
    ).mapInPandas(
        run,
        schema=("media_id long, n_samples long, n_frames long,"
                " silent_frames long, clipped_samples long,"
                " dc_offset long"),
    )


def image_quality_stats(df: DataFrame, decoder=None) -> DataFrame:
    """Image curation gates from REAL pixel decode: per image-kind row,
    the flat/blur/contrast signals a pretraining filter thresholds on —
    exact integer variance terms (``var_num = n·Σx² − (Σx)²``, the
    k-sigma lattice trick: zero ⟺ perfectly flat), total horizontal +
    vertical gradient energy (Σ|Δ| between neighbors — near-zero means
    blur/flat, the integer stand-in for Laplacian variance), and the
    extreme-pixel count (luma ≤ 5 or ≥ 250 — blown shadows/highlights).
    All from the rounded luma bitmap, so closed-form fixtures make
    every output SQL-recomputable. Undecodable payloads → -1
    sentinels. Same mapInPandas shape as image_luma_stats.

    Returns ``(media_id, n_pixels, var_num, grad_energy,
    extreme_pixels)``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                content = bytes(payload) if payload is not None else b""
                try:
                    g = np.round(
                        _gray_pixels_with(content, decoder)
                    ).astype(np.int64)
                    n = int(g.size)
                    s = int(g.sum())
                    q = int((g * g).sum())
                    gh = int(np.abs(np.diff(g, axis=1)).sum())
                    gv = int(np.abs(np.diff(g, axis=0)).sum())
                    extreme = int(
                        np.count_nonzero((g <= 5) | (g >= 250))
                    )
                    out.append({
                        "media_id": media_id,
                        "n_pixels": n,
                        "var_num": n * q - s * s,
                        "grad_energy": gh + gv,
                        "extreme_pixels": extreme,
                    })
                except DECODE_ERRORS:
                    out.append({
                        "media_id": media_id,
                        "n_pixels": -1,
                        "var_num": -1,
                        "grad_energy": -1,
                        "extreme_pixels": -1,
                    })
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_pixels", "var_num",
                         "grad_energy", "extreme_pixels"],
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "content"
    ).mapInPandas(
        run,
        schema=("media_id long, n_pixels long, var_num long,"
                " grad_energy long, extreme_pixels long"),
    )


def audio_fingerprints(
    df: DataFrame,
    frame_samples: int = 400,
) -> DataFrame:
    """Acoustic fingerprint per audio payload — the audio sibling of
    image pHash (q94): decoded PCM → per-frame energies (exact integer
    Σx² over ``frame_samples``-sample frames, trailing partial frame
    included) → one bit per adjacent frame pair, set iff energy rose.
    The energy-delta SIGN sequence is what survives gain changes and
    re-encodes (both scale every frame energy by the same factor), so
    identical-content clips collide exactly — dedup is then a plain
    fingerprint groupBy, the scalable exact-dedup shape, no pair join.

    Returns ``(media_id, n_frames, fingerprint)`` with the bit for
    frames (f, f+1) at position f (LSB first); payloads with one frame
    fingerprint as 0. Caps at 63 comparisons (int64) — longer clips
    raise rather than silently truncating the signature. Same
    mapInPandas shape and DECODE_ERRORS skip rule as the other
    extractors."""
    if frame_samples < 1:
        raise ValueError("audio_fingerprints: frame_samples must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    _rate, _ch, s = decode_audio(bytes(payload))
                except DECODE_ERRORS:
                    continue
                x = s.astype(np.int64)
                energies = [
                    int((x[i:i + frame_samples] ** 2).sum())
                    for i in range(0, int(x.size), frame_samples)
                ]
                nf = len(energies)
                if nf - 1 > 63:
                    raise ValueError(
                        f"audio_fingerprints: {nf} frames exceeds the "
                        "63-bit signature — raise frame_samples"
                    )
                fp = 0
                for f in range(nf - 1):
                    if energies[f + 1] > energies[f]:
                        fp |= 1 << f
                rows.append((int(mid), nf, fp))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "fingerprint"]
            )

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "content"
    ).mapInPandas(
        run, schema="media_id long, n_frames long, fingerprint long"
    )


def scene_changes(
    df: DataFrame,
    min_avg_delta_milli: int = 12_000,
) -> DataFrame:
    """Scene-cut detection over decoded video: a cut is a frame whose
    mean-luma jump from the previous frame exceeds the threshold —
    flagged by the exact integer inequality
    ``|Δ luma_sum| · 1000 > min_avg_delta_milli · n_pixels`` (no float
    mean). The frame-sampling question a video-curation pipeline asks
    before extracting keyframes for captioning: how many shots, and
    where. Returns one row per detected cut ``(media_id, frame,
    luma_delta)`` — frame is the index of the LATER frame; a one-frame
    clip yields no rows. Same mapInPandas + DECODE_ERRORS posture as
    the other extractors."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    _w, _h, frames = decode_y4m(bytes(payload))
                except DECODE_ERRORS:
                    continue
                sums = [int(f.astype(np.int64).sum()) for f in frames]
                npx = int(frames[0].size) if len(frames) else 0
                for f in range(1, len(sums)):
                    delta = sums[f] - sums[f - 1]
                    if abs(delta) * 1000 > min_avg_delta_milli * npx:
                        rows.append((int(mid), f, delta))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame", "luma_delta"]
            )

    return df.filter(F.col("kind") == "video").select(
        "media_id", "content"
    ).mapInPandas(
        run, schema="media_id long, frame long, luma_delta long"
    )


def audio_gain_report(
    df: DataFrame,
    target_rms: int = 600,
    full_scale: int = 32767,
) -> DataFrame:
    """Loudness-normalization report over decoded PCM: the gain each
    clip needs to hit ``target_rms``, and whether applying it would
    clip — the pre-mix audit an audio-training pipeline runs before
    normalizing a corpus (its quality sibling is q233's silence/clip
    gates).

    Everything is exact integers: per-clip Σx² (int64 via HUGEINT-safe
    numpy int64; 16-bit samples keep it < 2^53 for any real clip),
    mean square by floor division, RMS floor via ``math.isqrt`` (exact
    integer sqrt — matches DuckDB's floor(sqrt(double)) for any RMS
    < 2^26), gain in milli by floor division, clip test as an integer
    cross-multiplication. Same mapInPandas + DECODE_ERRORS skip posture
    as the other extractors; only fixed-width stats leave the worker."""
    import math

    if target_rms < 1:
        raise ValueError("audio_gain_report: target_rms must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    _rate, _ch, s = decode_audio(bytes(payload))
                except DECODE_ERRORS:
                    continue
                x = s.astype(np.int64)
                n = int(x.size)
                if n == 0:
                    continue
                sum_sq = int((x * x).sum())
                rms_floor = math.isqrt(sum_sq // n)
                max_abs = int(np.abs(x).max())
                if rms_floor > 0:
                    gain_milli = (1000 * target_rms) // rms_floor
                    would_clip = max_abs * gain_milli > full_scale * 1000
                else:
                    gain_milli = None
                    would_clip = None
                rows.append((int(mid), n, sum_sq, rms_floor, max_abs,
                             gain_milli, would_clip))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "sum_sq",
                               "rms_floor", "max_abs", "gain_milli",
                               "would_clip"],
            )

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "content"
    ).mapInPandas(
        run,
        schema="media_id long, n_samples long, sum_sq long, "
               "rms_floor long, max_abs long, gain_milli long, "
               "would_clip boolean",
    )
