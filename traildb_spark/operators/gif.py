"""GIF87a/89a codec in pure python/numpy (no image libraries).

Retires the last common-container pixel gate in the multimodal layer
(PNG and baseline JPEG already decode for real): GIF's variable-width
LZW with clear/EOI codes, the logical screen/image descriptors, local
and global color tables, interlacing, and the GCE transparency index —
all from the public GIF89a specification (CompuServe, 1990) and the
original Welch LZW paper. A matching deterministic encoder (fixed
8-bit-seeded LZW with table rebuilds) generates fixtures, so the
decode path is differentially testable without any external codec.

Scope: the IMAGE surface decodes the first frame
(``decode_gif_luma`` — the thumbnail/meme corpus shape); the VIDEO
surface decodes ALL frames of an animation with GIF89a composition —
patch rectangles, GCE transparency, disposal methods 2 (restore to
background) and 3 (restore previous) — via :func:`decode_gif_frames`,
feeding ``multimodal.extract_video_frames``. Malformed streams raise
ValueError (a DECODE_ERRORS member). The multimodal layer converts
decoded palette images to grayscale luma like every other container.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_blocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    out = bytearray()
    n = len(content)
    while True:
        if pos >= n:
            raise ValueError("GIF: truncated sub-block chain")
        size = content[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("GIF: truncated sub-block")
        out += content[pos : pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Variable-width LZW per the GIF spec — the fast production path.

    Two optimizations over the literal table-of-byte-strings procedure
    (kept below as ``_lzw_decode_ref``, the differential oracle):

    * **Bulk code extraction.** Between CLEAR codes the width schedule is
      deterministic (each emitted code after the first adds one table
      entry; width bumps when the table reaches 2^width, cap 12), so the
      bit offsets of a whole run of same-width codes are known in
      advance — numpy gathers 3 bytes per code and shifts/masks them all
      at once instead of a per-code bit loop.
    * **Output back-references.** Every table entry's string is a
      substring of already-produced output (entry = prev + first char of
      its own expansion), so the table stores (position, length) into
      the output buffer and expansion is ONE bytearray slice copy per
      code — no byte-string concatenation, no per-symbol writes. Root
      strings live in a prefix region of the buffer.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    nbytes = len(data)
    total_bits = nbytes * 8
    arr = np.frombuffer(data, np.uint8).astype(np.uint32)
    arr = np.concatenate([arr, np.zeros(4, np.uint32)])
    # output buffer: [roots prefix | expected pixels | slack for the last
    # entry (max table-entry length is bounded by the output produced)]
    base = clear
    out = bytearray(base + expected + 4096)
    out[:base] = bytes(range(clear))
    target = base + expected
    # table as (position, length) into `out`; roots pre-filled, the two
    # reserved slots (clear/eoi) keep length 0 and are never dereferenced
    pos_t = [0] * 4096
    len_t = [0] * 4096
    for i in range(clear):
        pos_t[i] = i
        len_t[i] = 1
    size = clear + 2
    width = min_code_size + 1
    prev_pos = 0
    prev_len = 0  # 0 == no previous code (start / after CLEAR)
    o = base
    bitpos = 0
    done = False
    while o < target and not done:
        # how many codes fit at the CURRENT width before the table could
        # force a bump (first code after CLEAR adds no entry)
        if width < 12:
            n_codes = (1 << width) - size + (1 if prev_len == 0 else 0)
        else:
            n_codes = 1024  # width capped: grab a big batch
        n_codes = min(n_codes, (total_bits - bitpos) // width)
        if n_codes <= 0:
            raise ValueError("GIF: LZW stream exhausted")
        offs = bitpos + width * np.arange(n_codes, dtype=np.int64)
        byte = offs >> 3
        vals = (
            (arr[byte] | (arr[byte + 1] << 8) | (arr[byte + 2] << 16))
            >> (offs & 7).astype(np.uint32)
        ) & ((1 << width) - 1)
        codes = vals.tolist()
        batch_width = width  # a CLEAR resets `width` mid-batch, but every
        # consumed code (the CLEAR included) was read at the batch width
        consumed = 0
        for code in codes:
            consumed += 1
            if code == clear:
                size = clear + 2
                width = min_code_size + 1
                prev_len = 0
                break  # re-plan the batch at the reset width
            if code == eoi:
                done = True
                break
            if prev_len == 0:
                if code >= size:
                    raise ValueError("GIF: invalid first LZW code")
                L = len_t[code]
                out[o : o + L] = out[pos_t[code] : pos_t[code] + L]
            elif code < size:
                L = len_t[code]
                out[o : o + L] = out[pos_t[code] : pos_t[code] + L]
                if size < 4096:  # full table: 12-bit codes can't address more
                    # new entry = prev + entry[0] = out[prev_pos : o+1]
                    pos_t[size] = prev_pos
                    len_t[size] = prev_len + 1
                    size += 1
            elif code == size and size < 4096:
                # KwKwK: entry = prev + prev[0], materialized in place
                L = prev_len + 1
                out[o : o + prev_len] = out[prev_pos:o]
                out[o + prev_len] = out[prev_pos]
                pos_t[size] = o
                len_t[size] = L
                size += 1
            else:
                raise ValueError("GIF: LZW code out of range")
            prev_pos = o
            prev_len = L
            o += L
            if o >= target:
                break
        bitpos += consumed * batch_width
        if width < 12 and size >= (1 << width):
            width += 1
    if o < target:
        raise ValueError("GIF: LZW output short of image size")
    return np.frombuffer(bytes(out[base:target]), np.uint8)


def _lzw_decode_ref(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """The literal GIF-spec LZW procedure (table of byte strings, per-code
    bit reads) — kept as the differential oracle for ``_lzw_decode``'s
    vectorized fast path. Codes start at ``min_code_size + 1`` bits, grow
    after the table fills (cap 12), CLEAR resets the table, EOI ends the
    stream. Returns ``expected`` indices (extra output is truncated —
    encoders may pad)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # bit reader: LSB-first within bytes
    bitbuf = 0
    nbits = 0
    pos = 0

    def next_code(width: int) -> int:
        nonlocal bitbuf, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream exhausted")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        return code

    # table: list of byte strings; rebuilt on CLEAR
    def fresh_table() -> list:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < expected:
        code = next_code(width)
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
        # grow the code width when the NEXT code could address the table
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < expected:
        raise ValueError("GIF: LZW output short of image size")
    return out


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_indices(content: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode the first image of a GIF → (palette[n,3] uint8,
    indices[h,w] uint8). Walks the logical screen descriptor, optional
    global color table, extensions, then the first image descriptor
    (local table wins, interlace undone)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("GIF: truncated header")
    _, _, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        end = pos + 3 * gct_size
        if end > len(content):
            raise ValueError("GIF: truncated global color table")
        palette = np.frombuffer(content[pos:end], np.uint8).reshape(-1, 3)
        pos = end
    n = len(content)
    while pos < n:
        b = content[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos + 2 > n:
                raise ValueError("GIF: truncated extension")
            _, pos = _read_blocks(content, pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        # image descriptor
        if pos + 10 > n:
            raise ValueError("GIF: truncated image descriptor")
        _left, _top, w, h, iflags = struct.unpack("<HHHHB", content[pos + 1 : pos + 10])
        pos += 10
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            end = pos + 3 * lct_size
            if end > len(content):
                raise ValueError("GIF: truncated local color table")
            palette = np.frombuffer(content[pos:end], np.uint8).reshape(-1, 3)
            pos = end
        if palette is None:
            raise ValueError("GIF: no color table")
        if w == 0 or h == 0:
            raise ValueError("GIF: zero-dimension image")
        if pos >= n:
            raise ValueError("GIF: missing LZW code size")
        min_code = content[pos]
        if not 2 <= min_code <= 11:
            raise ValueError("GIF: bad LZW minimum code size")
        data, pos = _read_blocks(content, pos + 1)
        flat = _lzw_decode(data, min_code, w * h)
        img = flat.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out = np.empty_like(img)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    out[r] = img[src]
                    src += 1
            img = out
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("GIF: pixel index outside color table")
        return palette.copy(), img
    raise ValueError("GIF: no image block found")


def decode_gif_luma(content: bytes) -> np.ndarray:
    """First frame → BT.601 luma float array (H, W), the same grayscale
    contract as the PNG and JPEG decoders."""
    palette, idx = decode_gif_indices(content)
    rgb = palette[idx].astype(np.float64)
    return 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encoder (dict of byte-string prefixes, CLEAR emitted when
    the table reaches 4096 — the spec's cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for v in indices.ravel().tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def make_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Deterministic GIF89a encoder for fixtures: one frame, a global
    color table (padded to a power of two), optional interlacing —
    the GIF sibling of ``make_png``/``make_jpeg``. ``indices`` is
    (H, W) uint8 into ``palette`` (n, 3) uint8."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("make_gif: indices (H,W), palette (n,3)")
    if pal.shape[0] < 2 or pal.shape[0] > 256:
        raise ValueError("make_gif: palette must hold 2..256 colors")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("make_gif: index outside palette")
    h, w = idx.shape
    bits = max(1, (pal.shape[0] - 1).bit_length())
    size = 1 << bits
    pal_full = np.zeros((size, 3), np.uint8)
    pal_full[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if interlace:
        rows = []
        for start, step in _DEINTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[rows]
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode(idx, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_frames(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode ALL frames of a (possibly animated) GIF to luma planes:
    ``(width, height, frames[n, h, w] float64)`` — the GIF sibling of
    ``multimodal.decode_y4m``, so animations feed the video surface.

    Frame composition per GIF89a: each image descriptor patches its
    (left, top, w, h) rectangle onto the logical-screen canvas; the
    Graphic Control Extension supplies transparency (transparent pixels
    leave the canvas untouched) and disposal — method 2 restores the
    patched rectangle to the background color after the frame, method 3
    (restore-previous) restores the pre-frame canvas.

    Chosen flattening (documented because the luma canvas has no alpha
    channel): disposal 2 restores to the GIF's DECLARED background color
    even when the disposing frame's GCE declared a transparency index —
    i.e. the "transparent background" a browser would show as alpha-0 is
    flattened to the file's own bg color, keeping every emitted pixel
    palette-pure and the whole decode closed-form checkable. Renderers
    that restore such rectangles to alpha-0 and composite over the page
    will differ on exactly those pixels."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh = struct.unpack("<HH", content[6:10])
    flags, bg = content[10], content[11]
    pos = 13
    gpal = None
    if flags & 0x80:
        gct = 2 << (flags & 0x07)
        end = pos + 3 * gct
        if end > len(content):
            raise ValueError("GIF: truncated global color table")
        gpal = np.frombuffer(content[pos:end], np.uint8).reshape(-1, 3)
        pos = end
    if sw == 0 or sh == 0:
        raise ValueError("GIF: zero-dimension screen")
    canvas = np.zeros((sh, sw), np.uint8)
    if gpal is not None and bg < len(gpal):
        canvas[:] = bg
    cur_pal = gpal
    frames: list[np.ndarray] = []
    pal_frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    n = len(content)
    while pos < n:
        b = content[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            if pos + 2 > n:
                raise ValueError("GIF: truncated extension")
            label = content[pos + 1]
            data, newpos = _read_blocks(content, pos + 2)
            if label == 0xF9 and len(data) >= 4:
                packed = data[0]
                disposal = (packed >> 2) & 0x07
                transparent = data[3] if packed & 1 else None
            pos = newpos
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        if pos + 10 > n:
            raise ValueError("GIF: truncated image descriptor")
        left, top, w, h, iflags = struct.unpack("<HHHHB", content[pos + 1 : pos + 10])
        pos += 10
        pal = cur_pal
        if iflags & 0x80:
            lct = 2 << (iflags & 0x07)
            end = pos + 3 * lct
            if end > len(content):
                raise ValueError("GIF: truncated local color table")
            pal = np.frombuffer(content[pos:end], np.uint8).reshape(-1, 3)
            pos = end
        if pal is None:
            raise ValueError("GIF: no color table")
        if left + w > sw or top + h > sh or w == 0 or h == 0:
            raise ValueError("GIF: frame rectangle outside the screen")
        if pos >= n:
            raise ValueError("GIF: missing LZW code size")
        min_code = content[pos]
        if not 2 <= min_code <= 11:
            raise ValueError("GIF: bad LZW minimum code size")
        data, pos = _read_blocks(content, pos + 1)
        patch = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if int(patch.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = patch != transparent
            region[mask] = patch[mask]
        else:
            region[:] = patch
        frames.append(canvas.copy())
        pal_frames.append(pal)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = (
                bg if gpal is not None and bg < len(gpal) else 0
            )
        elif disposal == 3 and before is not None:
            canvas = before
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF: no image block found")
    out = np.empty((len(frames), sh, sw), np.float64)
    for i, (fr, pal) in enumerate(zip(frames, pal_frames)):
        rgb = pal[np.minimum(fr, len(pal) - 1)].astype(np.float64)
        out[i] = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    return sw, sh, out


def make_animated_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    rects: list[tuple[int, int]] | None = None,
) -> bytes:
    """Animated GIF89a fixture encoder: frame 0 is full-screen; later
    frames may be patch rectangles at the given (left, top) offsets
    (full-screen when ``rects`` is None). ``frames`` is (n, h, w) uint8
    indices for full frames — patches slice out of each frame at its
    rect, so decode-compositing reproduces ``frames`` exactly."""
    fr = np.asarray(frames, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if fr.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    nfr, h, w = fr.shape
    bits = max(1, (pal.shape[0] - 1).bit_length())
    size = 1 << bits
    pal_full = np.zeros((size, 3), np.uint8)
    pal_full[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    min_code = max(2, bits)
    for i in range(nfr):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: no disposal
        if i == 0 or rects is None:
            left, top, pw, ph = 0, 0, w, h
            patch = fr[i]
        else:
            left, top = rects[i]
            ph = min(8, h - top)
            pw = min(8, w - left)
            patch = fr[i][top : top + ph, left : left + pw]
        out += b"\x2c" + struct.pack("<HHHHB", left, top, pw, ph, 0)
        out.append(min_code)
        data = _lzw_encode(patch, min_code)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
