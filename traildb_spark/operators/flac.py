"""Pure-python FLAC codec: a REAL compressed-audio decoder for the
dominant lossless format, plus a deterministic encoder for fixtures.

Implements the public FLAC format specification (xiph.org / RFC 9639):
STREAMINFO metadata walk, frame sync + header (block-size/rate/channel/
sample-size codes, UTF-8-coded frame number, CRC-8), subframe types
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), rice-coded residual
partitions (4- and 5-bit parameter widths, raw-bits escape), stereo
decorrelation (left/side, right/side, mid/side), wasted-bits shifts,
and frame CRC-16 verification. Reference parity note: the reference
engine stores opaque event blobs (`src/tdb_types.h` item payloads);
this module exists for the multimodal-column surface, same contract as
:mod:`.jpeg` — decode is exact (lossless round-trip), undecodable
payloads raise DECODE_ERRORS members and never abort a job.

Everything here is driver/worker-side pure python + numpy over bytes;
Spark never sees anything but the (rate, channels, int16) contract from
:func:`traildb_spark.operators.multimodal.decode_audio`, which
dispatches 'fLaC' payloads to :func:`decode_flac`.
"""

from __future__ import annotations

import struct

import numpy as np

# fixed-predictor coefficient rows, order 0..4 (spec §9.2.1)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}

_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    frame-header checksum (spec §9.1.1)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 —
    the whole-frame checksum (spec §9.3)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over bytes with byte-position tracking (for
    the CRC spans). Raises ValueError past the end."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        data = self.data
        byte, bit = self.byte, self.bit
        for _ in range(n):
            if byte >= len(data):
                raise ValueError("FLAC: bitstream truncated")
            v = (v << 1) | ((data[byte] >> (7 - bit)) & 1)
            bit += 1
            if bit == 8:
                bit = 0
                byte += 1
        self.byte, self.bit = byte, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(r: _BitReader) -> int:
    """The frame header's UTF-8-style coded number, extended to 36 bits
    (spec §9.1.5): leading-ones count selects the byte length."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: malformed coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: malformed coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _utf8_number(v: int) -> bytes:
    """Encoder twin of :func:`_read_utf8_number`."""
    if v < 0x80:
        return bytes([v])
    for n in range(2, 8):
        if v < (1 << (5 * n + 1 if n < 7 else 36)):
            head = (0xFF << (8 - n)) & 0xFF
            out = [0] * n
            for i in range(n - 1, 0, -1):
                out[i] = 0x80 | (v & 0x3F)
                v >>= 6
            out[0] = head | v
            return bytes(out)
    raise ValueError("FLAC: coded number out of range")


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    """Rice-coded residual section (spec §9.2.7): 2-bit method selects
    4- or 5-bit parameters, 4-bit partition order splits the block, the
    all-ones parameter escapes to raw n-bit samples."""
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("FLAC: partition order does not divide block")
    out: list[int] = []
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: negative partition sample count")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                rem = r.read(param) if param else 0
                v = (q << param) | rem
                out.append((v >> 1) ^ -(v & 1))
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    """One subframe (spec §9.2): header → CONSTANT / VERBATIM / FIXED /
    LPC payload, wasted-bits shift restored on the way out."""
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = r.read_signed(ebps)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [r.read_signed(ebps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        if order > block_size:
            raise ValueError("FLAC: fixed order exceeds block size")
        out = [r.read_signed(ebps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            k = order + i
            pred = sum(c * out[k - 1 - j] for j, c in enumerate(coefs))
            out.append(pred + e)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        if order > block_size:
            raise ValueError("FLAC: lpc order exceeds block size")
        out = [r.read_signed(ebps) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("FLAC: invalid lpc precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative lpc shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        for i, e in enumerate(res):
            k = order + i
            pred = sum(c * out[k - 1 - j] for j, c in enumerate(coefs))
            out.append((pred >> shift) + e)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC payload → (sample_rate, channels, samples int16),
    the :func:`~.multimodal.decode_audio` contract. Lossless: 16-bit
    sources round-trip exactly; 8-bit scales up by 8 bits (decode_wav's
    rule), 20/24/32-bit keep the high 16. Verifies every frame's CRC-8
    and CRC-16 — a bit flip raises rather than corrupting stats."""
    if len(content) < 42 or content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = content[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        body = content[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("FLAC: STREAMINFO must be 34 bytes")
            streaminfo = body
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if rate == 0:
        raise ValueError("FLAC: zero sample rate")
    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    # STREAMINFO total_samples == 0 means "unknown" per the FLAC spec
    # (§ streaminfo): decode frames until the payload is exhausted
    # instead of treating the stream as empty.
    unknown_total = total == 0
    while (pos < len(content)) if unknown_total else (got < total):
        frame_start = pos
        r = _BitReader(content, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_TABLE[bs_code]
        if sr_code == 0:
            frate = rate
        elif sr_code == 12:
            frate = r.read(8) * 1000
        elif sr_code == 13:
            frate = r.read(16)
        elif sr_code == 14:
            frate = r.read(16) * 10
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        else:
            frate = _SAMPLE_RATE_TABLE[sr_code]
        if frate != rate:
            raise ValueError("FLAC: frame rate differs from STREAMINFO")
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise ValueError("FLAC: reserved sample size code")
        else:
            fbps = _SAMPLE_SIZE_TABLE[ss_code]
        if fbps != bps:
            raise ValueError("FLAC: frame sample size differs")
        if ch_code < 8:
            n_ch = ch_code + 1
            decorr = None
        elif ch_code in (8, 9, 10):
            n_ch = 2
            decorr = ch_code
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if n_ch != channels:
            raise ValueError("FLAC: frame channel count differs")
        r.align()
        if r.byte >= len(content):
            raise ValueError("FLAC: truncated frame header")
        if _crc8(content[frame_start : r.byte]) != content[r.byte]:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        r.read(8)  # consume the CRC-8 byte
        subs = []
        for c in range(n_ch):
            sbps = fbps
            # the difference channel carries one extra bit (spec §9.2)
            if decorr == 8 and c == 1:
                sbps += 1
            elif decorr == 9 and c == 0:
                sbps += 1
            elif decorr == 10 and c == 1:
                sbps += 1
            subs.append(_read_subframe(r, block_size, sbps))
        r.align()
        crc_read = r.read(16)
        if _crc16(content[frame_start : r.byte - 2]) != crc_read:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = r.byte
        if decorr == 8:  # left/side
            left = subs[0]
            right = [l - s for l, s in zip(subs[0], subs[1])]
            subs = [left, right]
        elif decorr == 9:  # right/side
            left = [rr + s for rr, s in zip(subs[1], subs[0])]
            subs = [left, subs[1]]
        elif decorr == 10:  # mid/side
            left, right = [], []
            for m, s in zip(subs[0], subs[1]):
                mm = (m << 1) | (s & 1)
                left.append((mm + s) >> 1)
                right.append((mm - s) >> 1)
            subs = [left, right]
        take = block_size if unknown_total else min(block_size, total - got)
        for c in range(channels):
            chans[c].extend(subs[c][:take])
        got += take
    arr = np.empty(got * channels, dtype=np.int64)
    for c in range(channels):
        arr[c::channels] = chans[c]
    if bps == 16:
        pass
    elif bps < 16:
        arr <<= 16 - bps
    else:
        arr >>= bps - 16
    return rate, channels, arr.astype(np.int16)


class _BitWriter:
    """Encoder twin of :class:`_BitReader` (MSB-first)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _write_residual(
    w: _BitWriter, res: list[int], order: int, partition_order: int
) -> None:
    """Rice-encode a residual with per-partition parameters chosen from
    each partition's mean magnitude (any parameter is VALID; this one
    keeps fixtures compact and exercises multi-partition walks)."""
    block_size = len(res) + order
    n_part = 1 << partition_order
    if block_size % n_part or (block_size >> partition_order) <= order:
        raise ValueError("make_flac: bad partition order for block")
    w.write(0, 2)  # 4-bit rice parameters
    w.write(partition_order, 4)
    idx = 0
    for p in range(n_part):
        n = (block_size >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        mean = sum(abs(x) for x in part) // max(1, len(part))
        param = 0
        while (1 << param) < mean + 1 and param < 14:
            param += 1
        w.write(param, 4)
        for x in part:
            # zigzag: non-negative -> 2x, negative -> -2x-1
            v = (x << 1) if x >= 0 else (((-x) << 1) - 1)
            q, rem = v >> param, v & ((1 << param) - 1)
            w.write_unary(q)
            if param:
                w.write(rem, param)


def make_flac(
    samples: np.ndarray,
    rate: int,
    block_size: int = 256,
    order: int = 2,
    partition_order: int = 0,
    stereo_mode: str | None = None,
    verbatim: bool = False,
    lpc: bool = False,
    wasted: int = 0,
) -> bytes:
    """Deterministic FLAC encoder (fixture generator) for 16-bit audio:
    mono 1-D input, or stereo (N, 2) with ``stereo_mode`` one of
    ``'independent' | 'left_side' | 'right_side' | 'mid_side'``.
    Subframes are CONSTANT when a block is flat, VERBATIM when asked,
    LPC order-2 (coefs [3, -1], shift 1) when ``lpc``, else FIXED at
    ``order``, with rice residuals across ``2^partition_order``
    partitions — every decoder path a FLAC reader must implement, under
    real CRC-8/CRC-16 seals. ``wasted`` > 0 emits wasted-bits subframes
    (samples must be multiples of ``2^wasted``)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        chans = [s]
    elif s.ndim == 2 and s.shape[1] == 2:
        chans = [s[:, 0], s[:, 1]]
    else:
        raise ValueError("make_flac: mono 1-D or stereo (N, 2) input only")
    n_channels = len(chans)
    total = len(chans[0])
    if total == 0:
        raise ValueError("make_flac: empty input")
    if n_channels == 1 and stereo_mode is not None:
        raise ValueError("make_flac: stereo_mode needs stereo input")
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset (all-zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    def write_wasted(w: _BitWriter, block: list[int], sbps: int):
        if not wasted:
            w.write(0, 1)
            return block, sbps
        if any(v % (1 << wasted) for v in block):
            raise ValueError(
                "make_flac: wasted needs samples divisible by 2^wasted"
            )
        w.write(1, 1)
        w.write_unary(wasted - 1)
        return [v >> wasted for v in block], sbps - wasted

    def subframe(w: _BitWriter, block: list[int], sbps: int) -> None:
        if all(v == block[0] for v in block):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            block, sbps = write_wasted(w, block, sbps)
            w.write(block[0], sbps)
            return
        if verbatim:
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            block, sbps = write_wasted(w, block, sbps)
            for v in block:
                w.write(v, sbps)
            return
        if lpc and len(block) > 2:
            o, coefs, shift = 2, [3, -1], 1
            w.write(0, 1)
            w.write(32 + o - 1, 6)  # LPC, order encoded as o-1
            block, sbps = write_wasted(w, block, sbps)
            for v in block[:o]:
                w.write(v, sbps)
            w.write(3, 4)  # precision 4 bits (code precision-1)
            w.write(shift, 5)
            for c in coefs:
                w.write(c, 4)
            res = [
                block[i]
                - ((sum(c * block[i - 1 - j] for j, c in enumerate(coefs)))
                   >> shift)
                for i in range(o, len(block))
            ]
            po = partition_order if len(block) == block_size else 0
            _write_residual(w, res, o, po)
            return
        o = min(order, len(block) - 1)
        w.write(0, 1)
        w.write(8 + o, 6)  # FIXED
        block, sbps = write_wasted(w, block, sbps)
        for v in block[:o]:
            w.write(v, sbps)
        coefs = _FIXED_COEFS[o]
        res = [
            block[i] - sum(c * block[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(o, len(block))
        ]
        po = partition_order if len(block) == block_size else 0
        _write_residual(w, res, o, po)

    frame_no = 0
    for start in range(0, total, block_size):
        blk = [c[start : start + block_size].tolist() for c in chans]
        nblk = len(blk[0])
        if n_channels == 1:
            ch_code = 0
            subs = [(blk[0], bps)]
        elif stereo_mode in (None, "independent"):
            ch_code = 1
            subs = [(blk[0], bps), (blk[1], bps)]
        elif stereo_mode == "left_side":
            ch_code = 8
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(blk[0], bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            ch_code = 9
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(side, bps + 1), (blk[1], bps)]
        elif stereo_mode == "mid_side":
            ch_code = 10
            mid = [(l + r) >> 1 for l, r in zip(blk[0], blk[1])]
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(mid, bps), (side, bps + 1)]
        else:
            raise ValueError(f"make_flac: unknown stereo_mode {stereo_mode}")
        h = _BitWriter()
        h.write(0x3FFE, 14)
        h.write(0, 1)
        h.write(0, 1)  # fixed block size strategy
        h.write(7, 4)  # block size as 16-bit at header end
        h.write(0, 4)  # rate from STREAMINFO
        h.write(ch_code, 4)
        h.write(4, 3)  # 16-bit samples
        h.write(0, 1)
        hdr = h.bytes() + _utf8_number(frame_no) + struct.pack(
            ">H", nblk - 1
        )
        hdr += bytes([_crc8(hdr)])
        w = _BitWriter()
        for block, sbps in subs:
            subframe(w, block, sbps)
        w.align()
        frame = hdr + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
