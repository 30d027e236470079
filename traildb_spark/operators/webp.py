"""Pure-python WebP-lossless (VP8L) codec: a REAL modern-format image
decoder plus a deterministic encoder for fixtures.

Implements the public VP8L specification (RFC 9649 / the WebP lossless
bitstream spec): RIFF/WEBP container walk, the LSB-first bitstream,
canonical prefix codes delivered both as "simple" (1-2 symbol) codes
and through the DEFLATE-style code-length code (with 16/17/18 repeats
and the max_symbol early-out), LZ77 backward references with the length
/distance prefix-coding and the 120-entry 2D proximity distance
mapping, the color cache (multiplicative hash insert on EVERY emitted
pixel), optional meta-prefix groups, and all four inverse transforms —
PREDICTOR (14 modes with the spec's edge overrides), COLOR (signed
3.5-fixed-point cross-channel deltas), SUBTRACT_GREEN, and
COLOR_INDEXING (with sub-byte pixel-bundling for small palettes).

The encoder emits genuinely entropy-coded streams (8-bit literal trees
through the code-length code, simple codes for degenerate channels,
run-length LZ77 back-references, color-cache hits, and any requested
transform stack) so a decoder must implement every branch to round-trip
it; both halves stay byte-serial python by nature (codec work), with
the Spark surface unchanged — payload bytes ride pruned binary columns
through mapInPandas, per the multimodal module's rules.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length code lengths are transmitted (spec §6.2.2)
# kCodeLengthCodeOrder (RFC 9649 §6.2.2): 16 sits at position 8, NOT at
# the end. The old order here ([17, 18, 0..15, 16]) was self-consistent
# (our encoder wrote the same order, so round-trips passed) but desynced
# on any REAL libwebp stream transmitting more than 8 code-length codes
# — caught by the captured-libwebp fixture (tools/capture_libwebp_fixture).
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D proximity offsets for distance codes 1..120 (spec §5.2.3):
# (dx, dy) with dy in 0..7, dx in -8..7, ordered by the spec table
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _LsbReader:
    """LSB-first bit reader (the DEFLATE/VP8L convention — opposite of
    the FLAC/JPEG readers in this package)."""

    def __init__(self, data: bytes):
        self.data = data
        self.byte = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code_msb(self, code: int, length: int) -> None:
        """Prefix codes enter the stream most-significant-bit first
        (tree-walk order) even though the stream is LSB-first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _PrefixCode:
    """Canonical prefix code from a length table (DEFLATE numbering:
    shorter codes first, same-length codes by symbol order). Decoding
    walks bit by bit via a (length, code) → symbol dict; the alphabets
    here are ≤ 2328 symbols so the dict walk is fine for fixture-scale
    decode (swap for a LUT if WebP ever becomes a hot path)."""

    def __init__(self, lengths: list[int]):
        self.single = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # kraft check: complete codes only
        kraft = sum(1 << (15 - l) for l, _ in nz)
        if kraft != 1 << 15:
            raise ValueError("VP8L: prefix code lengths not complete")
        # canonical numbering: iterate lengths ascending, shift on growth
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for l, s in sorted(nz):
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1
        self.max_len = max(l for l, _ in nz)

    def read(self, r: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | r.read(1)
            s = self.table.get((l, code))
            if s is not None:
                return s
        raise ValueError("VP8L: invalid prefix code word")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder, same numbering."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in nz:
        code <<= l - prev_len
        prev_len = l
        out[s] = (code, l)
        code += 1
    return out


def _read_prefix_code(r: _LsbReader, alphabet: int) -> _PrefixCode:
    """One prefix code (spec §6.2): simple (1-2 symbols) or transmitted
    through the code-length code with 16/17/18 repeats."""
    if r.read(1):  # simple
        n_sym = r.read(1) + 1
        lengths = [0] * alphabet
        first_8bit = r.read(1)
        s0 = r.read(8 if first_8bit else 1)
        if s0 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        lengths[s0] = 1
        if n_sym == 2:
            s1 = r.read(8)
            if s1 >= alphabet:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[s1] = 1
        return _PrefixCode(lengths)
    num_codes = r.read(4) + 4
    if num_codes > len(_CLC_ORDER):
        raise ValueError("VP8L: too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = r.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if r.read(1):  # use max_symbol
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(r)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + r.read(3)
        else:  # 18
            i += 11 + r.read(7)
    return _PrefixCode(lengths)


def _prefix_decode_extra(r: _LsbReader, code: int) -> int:
    """Length/distance prefix value decode (spec §5.2.2): codes 0-3 are
    the values 1-4; above that, extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _prefix_encode_extra(v: int) -> tuple[int, int, int]:
    """value → (code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    vm = v - 1
    nbits = vm.bit_length() - 1
    b = (vm >> (nbits - 1)) & 1
    code = 2 * nbits + b
    extra = (code - 2) >> 1
    offset = (2 + b) << extra
    return code, v - offset - 1, extra


_HASH_MUL = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_entropy_image(
    r: _LsbReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """The spatially-coded image stream (spec §5): prefix-code groups
    (+ optional meta groups and color cache at level 0), literals,
    back-references, cache hits. Returns (h, w) uint32 ARGB."""
    # color-cache-info leads EVERY entropy-coded image (RFC 9649 §5
    # grammar: both spatially-coded-image and entropy-coded-image start
    # with color-cache-info) — transform sub-images and the meta-prefix
    # image included, NOT just the level-0 image.
    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color-cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and r.read(1):
        meta_bits = r.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _read_entropy_image(r, mw, mh, False)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(r, 256 + 24 + cache_size)
        red = _read_prefix_code(r, 256)
        blue = _read_prefix_code(r, 256)
        alpha = _read_prefix_code(r, 256)
        dist = _read_prefix_code(r, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            mpix = int(meta[y >> meta_bits, x >> meta_bits])
            gi = (mpix >> 8) & 0xFFFF
        else:
            gi = 0
        green_c, red_c, blue_c, alpha_c, dist_c = groups[gi]
        s = green_c.read(r)
        if s < 256:
            g = s
            rr = red_c.read(r)
            b = blue_c.read(r)
            a = alpha_c.read(r)
            px = (a << 24) | (rr << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 280:
            length = _prefix_decode_extra(r, s - 256)
            dcode = _prefix_decode_extra(r, dist_c.read(r))
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                d = dy * w + dx
                if d < 1:
                    d = 1
            else:
                d = dcode - 120
            if d > pos:
                raise ValueError("VP8L: back-reference before start")
            if pos + length > total:
                raise ValueError("VP8L: back-reference past end")
            for _ in range(length):
                px = int(out[pos - d])
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if not cache_bits or s - 280 >= cache_size:
                raise ValueError("VP8L: cache index without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, w)


def _avg2(a: int, b: int) -> int:
    return ((a & 0xFF) + (b & 0xFF)) >> 1


def _avg2_px(a: int, b: int) -> int:
    return (
        (_avg2(a >> 24, b >> 24) << 24)
        | (_avg2(a >> 16, b >> 16) << 16)
        | (_avg2(a >> 8, b >> 8) << 8)
        | _avg2(a, b)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        cl, ct, ctl = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = cl + ct - ctl
        p_l += abs(p - cl)
        p_t += abs(p - ct)
    return l if p_l < p_t else t


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(l: int, t: int, tl: int) -> int:
    av = _avg2_px(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (av >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        # libwebp: a + (a - b) / 2 with C truncating division
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_px(_avg2_px(l, tr), t)
    if mode == 6:
        return _avg2_px(l, tl)
    if mode == 7:
        return _avg2_px(l, t)
    if mode == 8:
        return _avg2_px(tl, t)
    if mode == 9:
        return _avg2_px(t, tr)
    if mode == 10:
        return _avg2_px(_avg2_px(l, tl), _avg2_px(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(l, t, tl)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _add_px(a: int, b: int) -> int:
    """Per-channel modular add."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _pred_neighbors(img: np.ndarray, x: int, y: int, w: int):
    """(L, T, TR, TL) with the spec's edge conventions. TR for the
    rightmost column is the CURRENT row's leftmost pixel: the ARGB
    cache is contiguous, so reading one past the previous row's end
    lands on this row's x=0 (already reconstructed — x=0 decodes via
    the edge override before any in-row predictor runs)."""
    l = int(img[y, x - 1]) if x > 0 else 0
    t = int(img[y - 1, x]) if y > 0 else 0
    tr = int(img[y - 1, x + 1]) if (y > 0 and x + 1 < w) else (
        int(img[y, 0]) if y > 0 else 0
    )
    tl = int(img[y - 1, x - 1]) if (x > 0 and y > 0) else 0
    return l, t, tr, tl


def _predictor_inverse(img: np.ndarray, modes: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform (spec §4.2.2): residuals →
    pixels, edge overrides (0,0)=black, row 0 = L, col 0 = T."""
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img[0, x - 1])  # L
            elif x == 0:
                pred = int(img[y - 1, 0])  # T
            else:
                mode = (int(modes[y >> bits, x >> bits]) >> 8) & 0xFF
                l, t, tr, tl = _pred_neighbors(img, x, y, w)
                pred = _predict(mode, l, t, tr, tl)
            img[y, x] = _add_px(int(img[y, x]), pred)


def _ct_delta(t: int, c: int) -> int:
    """Color-transform delta: (int8(t) * int8(c)) >> 5 (spec §4.2.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _color_inverse(img: np.ndarray, elems: np.ndarray, bits: int) -> None:
    """In-place inverse color transform: stored red/blue are deltas
    against green (and red for blue) scaled by the per-block element."""
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            e = int(elems[y >> bits, x >> bits])
            g2r = e & 0xFF           # blue channel of the element
            g2b = (e >> 8) & 0xFF    # green channel
            r2b = (e >> 16) & 0xFF   # red channel
            px = int(img[y, x])
            a = px >> 24
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            img[y, x] = (a << 24) | (r << 16) | (g << 8) | b


def decode_webp(content: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L) payload to float gray (H, W) via
    BT.601 luma over the decoded ARGB. Lossy VP8 and extended VP8X
    payloads raise (honest-gate contract: this is the LOSSLESS
    decoder); so do malformed prefix codes, truncated streams and
    out-of-range back-references."""
    if len(content) < 20 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    chunk = content[12:16]
    if chunk == b"VP8 ":
        raise ValueError("WebP: lossy VP8 needs another decoder")
    if chunk == b"VP8X":
        raise ValueError("WebP: extended container not supported")
    if chunk != b"VP8L":
        raise ValueError("WebP: unknown chunk")
    (clen,) = struct.unpack("<I", content[16:20])
    data = content[20 : 20 + clen]
    if len(data) < clen or not data or data[0] != 0x2F:
        raise ValueError("WebP: bad VP8L signature")
    r = _LsbReader(data)
    r.read(8)  # signature
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("WebP: unknown VP8L version")
    transforms = []
    seen = set()
    xsize = w
    while r.read(1):
        ttype = r.read(2)
        if ttype in seen:
            raise ValueError("WebP: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = r.read(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(r, mw, mh, False)
            transforms.append(("predictor", bits, sub))
        elif ttype == 1:  # COLOR
            bits = r.read(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(r, mw, mh, False)
            transforms.append(("color", bits, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green", 0, None))
        else:  # COLOR_INDEXING
            n_colors = r.read(8) + 1
            pal = _read_entropy_image(r, n_colors, 1, False)[0]
            # palette is delta-coded left to right
            acc = 0
            palette = []
            for p in pal:
                acc = _add_px(acc, int(p))
                palette.append(acc)
            if n_colors <= 2:
                pack = 3
            elif n_colors <= 4:
                pack = 2
            elif n_colors <= 16:
                pack = 1
            else:
                pack = 0
            transforms.append(("palette", pack, palette))
            xsize = (w + (1 << pack) - 1) >> pack if pack else w
    img = _read_entropy_image(r, xsize, h, True)
    for kind, bits, aux in reversed(transforms):
        if kind == "palette":
            pack = bits
            palette = aux
            full = np.zeros((h, w), dtype=np.uint32)
            if pack:
                per = 1 << pack
                width_bits = 8 >> pack
                mask = (1 << width_bits) - 1
                for y in range(h):
                    for x in range(w):
                        bundle = int(img[y, x >> pack]) >> 8 & 0xFF
                        idx = (bundle >> ((x % per) * width_bits)) & mask
                        if idx >= len(palette):
                            raise ValueError("WebP: palette index range")
                        full[y, x] = palette[idx]
            else:
                for y in range(h):
                    for x in range(w):
                        idx = (int(img[y, x]) >> 8) & 0xFF
                        if idx >= len(palette):
                            raise ValueError("WebP: palette index range")
                        full[y, x] = palette[idx]
            img = full
        elif kind == "subtract_green":
            for y in range(img.shape[0]):
                for x in range(img.shape[1]):
                    px = int(img[y, x])
                    g = (px >> 8) & 0xFF
                    rr = ((px >> 16) + g) & 0xFF
                    b = ((px & 0xFF) + g) & 0xFF
                    img[y, x] = (px & 0xFF00FF00) | (rr << 16) | b
        elif kind == "color":
            _color_inverse(img, aux, bits)
        else:  # predictor
            _predictor_inverse(img, aux, bits)
    a = img.astype(np.int64)
    rr = (a >> 16) & 0xFF
    g = (a >> 8) & 0xFF
    b = a & 0xFF
    return 0.299 * rr + 0.587 * g + 0.114 * b


# --------------------------------------------------------------------------
# encoder (fixture generator)
# --------------------------------------------------------------------------

def _huffman_lengths(counts: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from symbol counts: real Huffman via pairwise merge,
    then a (rarely needed at fixture scale) length cap by demotion.
    One used symbol gets length 1."""
    syms = [s for s, c in counts.items() if c > 0]
    if not syms:
        raise ValueError("huffman: empty histogram")
    if len(syms) == 1:
        return {syms[0]: 1}
    import heapq

    heap = [(counts[s], (s,)) for s in syms]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in syms}
    while len(heap) > 1:
        c1, g1 = heapq.heappop(heap)
        c2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, g1 + g2))
    if max(depth.values()) > max_len:
        raise ValueError("huffman: length cap exceeded (fixture scale only)")
    return depth


def _write_prefix_code(
    w: _LsbWriter, lengths: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple form for 1-2 symbols, else through
    the code-length code) and return the canonical symbol→(code, len)
    map for payload emission."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.write(1, 1)  # simple
        w.write(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1 and len(syms) == 1:
            w.write(0, 1)  # 1-bit first symbol
            w.write(s0, 1)
        else:
            w.write(1, 1)
            w.write(s0, 8)
        if len(syms) == 2:
            w.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    w.write(0, 1)  # code-length-code form
    full = [0] * alphabet
    for s, l in lengths.items():
        full[s] = l
    last_nz = max(s for s, l in enumerate(full) if l)
    # transmit [0 .. last_nz] explicitly, default the rest to 0 via
    # max_symbol
    cl_stream = full[: last_nz + 1]
    cl_counts: dict[int, int] = {}
    for l in cl_stream:
        cl_counts[l] = cl_counts.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_counts, max_len=7)
    if len(cl_lengths) == 1:
        # pad with a never-emitted second symbol so the CL tree is a
        # complete 1-bit code (single-leaf CL trees are not portable)
        only = next(iter(cl_lengths))
        pad = 0 if only != 0 else 15
        cl_lengths = {only: 1, pad: 1}
    num_codes = 19
    w.write(num_codes - 4, 4)
    for s in _CLC_ORDER:
        w.write(cl_lengths.get(s, 0), 3)
    cl_codes = _canonical_codes(
        [cl_lengths.get(s, 0) for s in range(19)]
    )
    # max_symbol: stop after the explicit prefix
    w.write(1, 1)
    n = len(cl_stream)
    length_nbits_code = 0
    while (2 + 2 * length_nbits_code) < (n - 2).bit_length():
        length_nbits_code += 1
    if length_nbits_code > 7:
        raise ValueError("prefix code: alphabet too large for max_symbol")
    w.write(length_nbits_code, 3)
    w.write(n - 2, 2 + 2 * length_nbits_code)
    for l in cl_stream:
        code, clen = cl_codes[l]
        w.write_code_msb(code, clen)
    return _canonical_codes(full)


def _plan_ops(
    flat: list[int], cache_bits: int, use_backrefs: bool
) -> list[tuple]:
    """Emission plan: ('lit', px) | ('cache', idx) | ('copy', length,
    dist). Mirrors the decoder's cache-insert-on-every-pixel rule."""
    ops: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n = len(flat)
    while i < n:
        px = flat[i]
        if use_backrefs and i > 0 and flat[i - 1] == px:
            j = i
            while j < n and flat[j] == px:
                j += 1
            run = j - i
            if run >= 3:
                ops.append(("copy", run, 1))
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                i = j
                continue
        if cache is not None:
            key = _cache_key(px, cache_bits)
            if cache[key] == px:
                ops.append(("cache", key))
                i += 1
                continue
            cache[key] = px
        ops.append(("lit", px))
        i += 1
    return ops


def _write_entropy_image(
    w: _LsbWriter,
    img: np.ndarray,
    is_level0: bool,
    cache_bits: int = 0,
    use_backrefs: bool = False,
    meta_bits: int = 0,
) -> None:
    """Encoder twin of :func:`_read_entropy_image`. ``meta_bits`` > 0
    splits the image into 2 prefix-code groups checkerboarded over
    meta blocks (level-0 only)."""
    h, wd = img.shape
    flat = [int(v) for v in img.reshape(-1)]
    # color-cache-info is emitted for every entropy-coded image (the
    # decoder reads it unconditionally per RFC 9649 §5); sub-images
    # emit the 0 flag unless a cache was requested for them too.
    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)
    n_groups = 1
    if is_level0:
        if meta_bits:
            w.write(1, 1)
            w.write(meta_bits - 2, 3)
            mw = (wd + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            gi = np.fromfunction(
                lambda y, x: ((x + y) % 2).astype(np.uint32), (mh, mw)
            )
            meta_img = (gi & 0xFF) << 8 | (gi >> 8) << 16
            _write_entropy_image(w, meta_img.astype(np.uint32), False)
            # the DECODER sizes the group list from max(gi)+1 — a
            # degenerate 1-block meta grid must emit ONE tree set, or
            # the unread second set desyncs the pixel stream
            n_groups = int(gi.max()) + 1
        else:
            w.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0

    def group_of(pos: int) -> int:
        if n_groups == 1:
            return 0
        x, y = pos % wd, pos // wd
        return ((x >> meta_bits) + (y >> meta_bits)) % 2

    # plan ops globally (cache state is global), then histogram per group
    ops = _plan_ops(flat, cache_bits, use_backrefs)
    pos = 0
    op_pos = []
    for op in ops:
        op_pos.append(pos)
        pos += op[1] if op[0] == "copy" else 1
    hists = [
        {
            "green": {},
            "red": {},
            "blue": {},
            "alpha": {},
            "dist": {},
        }
        for _ in range(n_groups)
    ]

    def bump(hist: dict, k: int) -> None:
        hist[k] = hist.get(k, 0) + 1

    for op, p in zip(ops, op_pos):
        hst = hists[group_of(p)]
        if op[0] == "lit":
            px = op[1]
            bump(hst["green"], (px >> 8) & 0xFF)
            bump(hst["red"], (px >> 16) & 0xFF)
            bump(hst["blue"], px & 0xFF)
            bump(hst["alpha"], px >> 24)
        elif op[0] == "cache":
            bump(hst["green"], 280 + op[1])
        else:
            lcode, _, _ = _prefix_encode_extra(op[1])
            bump(hst["green"], 256 + lcode)
            dcode, _, _ = _prefix_encode_extra(2)  # dist 1 -> map code 2
            bump(hst["dist"], dcode)
    codes = []
    for g in range(n_groups):
        hst = hists[g]
        green_alpha = 256 + 24 + cache_size
        cg = _write_prefix_code(
            w, _huffman_lengths(hst["green"] or {0: 1}), green_alpha
        )
        cr = _write_prefix_code(
            w, _huffman_lengths(hst["red"] or {0: 1}), 256
        )
        cb = _write_prefix_code(
            w, _huffman_lengths(hst["blue"] or {0: 1}), 256
        )
        ca = _write_prefix_code(
            w, _huffman_lengths(hst["alpha"] or {0: 1}), 256
        )
        cd = _write_prefix_code(
            w, _huffman_lengths(hst["dist"] or {0: 1}), 40
        )
        codes.append((cg, cr, cb, ca, cd))

    def emit(codemap: dict, sym: int) -> None:
        code, clen = codemap[sym]
        w.write_code_msb(code, clen)

    for op, p in zip(ops, op_pos):
        cg, cr, cb, ca, cd = codes[group_of(p)]
        if op[0] == "lit":
            px = op[1]
            emit(cg, (px >> 8) & 0xFF)
            emit(cr, (px >> 16) & 0xFF)
            emit(cb, px & 0xFF)
            emit(ca, px >> 24)
        elif op[0] == "cache":
            emit(cg, 280 + op[1])
        else:
            _, length, dist = op
            lcode, lextra, lbits = _prefix_encode_extra(length)
            emit(cg, 256 + lcode)
            if lbits:
                w.write(lextra, lbits)
            dcode, dextra, dbits = _prefix_encode_extra(2)
            emit(cd, dcode)
            if dbits:
                w.write(dextra, dbits)


def _predictor_forward(img: np.ndarray, mode: int, bits: int) -> np.ndarray:
    """Residual image for a uniform predictor mode (the decoder's edge
    overrides applied identically)."""
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img[0, x - 1])
            elif x == 0:
                pred = int(img[y - 1, 0])
            else:
                l, t, tr, tl = _pred_neighbors(img, x, y, w)
                pred = _predict(mode, l, t, tr, tl)
            out[y, x] = _sub_px(int(img[y, x]), pred)
    return out


def make_webp(
    gray: np.ndarray,
    cache_bits: int = 0,
    use_backrefs: bool = False,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    meta_bits: int = 0,
    transform_bits: int = 2,
) -> bytes:
    """Deterministic VP8L encoder (fixture generator): gray values
    become (255, v, v, v) pixels run through any requested transform
    stack — COLOR_INDEXING (with sub-byte bundling for small
    palettes), COLOR (uniform (g2r, g2b, r2b) element), SUBTRACT_GREEN,
    PREDICTOR (uniform mode 0-13) — then genuinely entropy-coded with
    real Huffman trees through the code-length code, optional color
    cache and dist-1 LZ77 runs, optional 2-group meta-prefix
    checkerboard. Decoded rounded luma equals the input exactly."""
    a8 = np.asarray(gray, dtype=np.uint8)
    h, wd = a8.shape
    img = (
        np.uint32(0xFF000000)
        | (a8.astype(np.uint32) << 16)
        | (a8.astype(np.uint32) << 8)
        | a8.astype(np.uint32)
    )
    w = _LsbWriter()
    w.write(0x2F, 8)
    w.write(wd - 1, 14)
    w.write(h - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    if palette:
        vals = sorted({int(v) for v in a8.reshape(-1)})
        if len(vals) > 256:
            raise ValueError("make_webp: palette needs <= 256 values")
        lut = {v: i for i, v in enumerate(vals)}
        n_colors = len(vals)
        w.write(1, 1)
        w.write(3, 2)  # COLOR_INDEXING
        w.write(n_colors - 1, 8)
        pal_px = [
            0xFF000000 | (v << 16) | (v << 8) | v for v in vals
        ]
        deltas = []
        prev = 0
        for p in pal_px:
            deltas.append(_sub_px(p, prev))
            prev = p
        _write_entropy_image(
            w, np.array([deltas], dtype=np.uint32), False
        )
        if n_colors <= 2:
            pack = 3
        elif n_colors <= 4:
            pack = 2
        elif n_colors <= 16:
            pack = 1
        else:
            pack = 0
        if pack:
            per = 1 << pack
            width_bits = 8 >> pack
            pw = (wd + per - 1) >> pack
            packed = np.zeros((h, pw), dtype=np.uint32)
            for y in range(h):
                for x in range(wd):
                    b = lut[int(a8[y, x])] << ((x % per) * width_bits)
                    packed[y, x >> pack] |= np.uint32(b << 8)
            img = np.uint32(0xFF000000) | packed
        else:
            idx = np.vectorize(lambda v: lut[int(v)])(a8).astype(np.uint32)
            img = np.uint32(0xFF000000) | (idx << 8)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        w.write(1, 1)
        w.write(1, 2)  # COLOR
        w.write(transform_bits - 2, 3)
        mh = (img.shape[0] + (1 << transform_bits) - 1) >> transform_bits
        mw = (img.shape[1] + (1 << transform_bits) - 1) >> transform_bits
        elem = np.uint32(
            0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
            | (g2r & 0xFF)
        )
        _write_entropy_image(
            w, np.full((mh, mw), elem, dtype=np.uint32), False
        )
        # forward: subtract the deltas the decoder will add
        out = img.copy()
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                px = int(img[y, x])
                al = px >> 24
                r = (px >> 16) & 0xFF
                g = (px >> 8) & 0xFF
                b = px & 0xFF
                new_b = (b - _ct_delta(g2b & 0xFF, g)) & 0xFF
                # decoder adds delta(r2b, FINAL red); final red is the
                # original r, and stored red is r - delta(g2r, g)
                new_b = (new_b - _ct_delta(r2b & 0xFF, r)) & 0xFF
                new_r = (r - _ct_delta(g2r & 0xFF, g)) & 0xFF
                out[y, x] = (al << 24) | (new_r << 16) | (g << 8) | new_b
        img = out
    if subtract_green:
        w.write(1, 1)
        w.write(2, 2)  # SUBTRACT_GREEN
        out = img.copy()
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                px = int(img[y, x])
                g = (px >> 8) & 0xFF
                r = ((px >> 16) - g) & 0xFF
                b = ((px & 0xFF) - g) & 0xFF
                out[y, x] = (px & 0xFF00FF00) | (r << 16) | b
        img = out
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("make_webp: predictor mode 0-13")
        w.write(1, 1)
        w.write(0, 2)  # PREDICTOR
        w.write(transform_bits - 2, 3)
        mh = (img.shape[0] + (1 << transform_bits) - 1) >> transform_bits
        mw = (img.shape[1] + (1 << transform_bits) - 1) >> transform_bits
        modes = np.full(
            (mh, mw),
            np.uint32(0xFF000000 | (predictor_mode << 8)),
            dtype=np.uint32,
        )
        img = _predictor_forward(img, predictor_mode, transform_bits)
        _write_entropy_image(w, modes, False)
    w.write(0, 1)  # end of transforms
    _write_entropy_image(
        w, img, True, cache_bits=cache_bits, use_backrefs=use_backrefs,
        meta_bits=meta_bits,
    )
    payload = w.bytes()
    # RIFF chunk sizes exclude the odd-length pad byte; the pad is
    # appended after the payload and counted only in the outer RIFF size.
    pad = b"\x00" if len(payload) % 2 else b""
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload + pad
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
