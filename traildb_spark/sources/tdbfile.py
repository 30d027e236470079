"""Native TrailDB ``.tdb`` file format: a pure-Python reader (directory
AND single-file tar package, v0 and v1) plus a literal-only writer for
interop and fixtures.

This is the one capability a migrating TrailDB user calls table stakes:
``read_tdb(spark, path)`` opens an artifact produced by the reference C
library and yields the engine's canonical event DataFrame
``(uuid STRING hex32, time LONG, <field> STRING ...)`` with the ``''``
≡ NULL convention. Format knowledge derives from the reference
implementation (all citations into /root/reference):

- open layout / member set: ``src/tdb.c:298-393``
- ``info`` / ``version`` / ``fields`` text files: ``src/tdb.c:255-291``,
  ``fields_open`` ``src/tdb.c:142-227`` (v0 reads names to EOF, v1 stops
  at the blank line; writer ``src/tdb_cons.c:109-144``)
- lexicon layout ``[count][offset_1..offset_{count+1}][values]`` with
  4-byte entries unless the file exceeds 2^32 bytes
  (``src/tdb_cons.c:62-107`` store, ``src/tdb.c:106-140`` read; v0
  values are NUL-terminated, length via strlen ``src/tdb.c:130-140``)
- ``uuids``: 16-byte uuids sorted by ``__uint128_t`` memcpy-compare —
  i.e. LITTLE-ENDIAN integer order of the raw bytes, not lexicographic
  (``src/tdb_cons.c:356-376``, binary search ``src/tdb.c:552-589``);
  v0 calls the file ``cookies`` and guarantees no order
- ``trails.toc``: ``num_trails + 1`` offsets, 4 bytes each iff the
  final ``trails.data`` size (including its 8 zero pad bytes) is under
  2^32 (``src/tdb_encode.c:355-366``, ``src/tdb_decode.c:7-13``)
- trail bitstream: 3-bit length residual reserved at the head (number
  of ignore-bits in the last byte), then per event a field-0 timestamp
  -delta gram followed by field-value grams until the next field-0 gram
  (``src/tdb_encode.c:277-345`` encode, ``src/tdb_decode.c:227-329``
  decode); timestamps accumulate from ``min_timestamp``
- gram coding: LSB-first bitstream; flag bit 1 → 16-bit index into a
  fully-expanded 65536-entry codebook (packed 20-byte entries: 128-bit
  symbol + 32-bit code length; every 16-bit word starting with a code
  maps to that code's entry — ``create_codebook_fun``
  ``src/tdb_huffman.c:343-357``), flag bit 0 → literal
  ``[field (field_id_bits)][val (field_bits[field])]``
  (``huff_decode_value`` ``src/tdb_huffman.h:66-88``); a symbol's high
  64 bits hold the second item of a bigram
- bit widths: ``field_id_bits = bits_needed(num_fields)``,
  ``field_bits[0] = bits_needed(max_timestamp_delta)``,
  ``field_bits[f] = bits_needed(lexicon_count(f))`` with
  ``bits_needed(0) == 1`` (``src/tdb_huffman.c:34-43,232-247``)
- item packing: narrow ``field | val<<8`` when ``field <= 127`` and
  ``val <= 2^24-1``; wide ``(f&127) | 128 | (f>>7)<<8 | val<<16``
  (``src/tdb_types.h:24-99``)
- v0 codebook entries are 12 bytes (64-bit symbol) and convert by
  splitting at bit 32 (``huff_convert_v0_codebook``
  ``src/tdb_huffman.c:377-418``)
- tar package: plain ustar archive whose third member ``tar.toc`` —
  data at fixed offset 2560 — is a text TOC ``name offset size`` per
  line after the magic ``TAR TOC FOR TDB VER 1`` (``src/tdb_package.c:
  16-124``, writer ``src/tdb_cons_package.c:24-34``)

The WRITER (``write_tdb``) emits spec-valid literal-only streams: every
gram is a flag-0 literal, the codebook is present but never referenced.
The reference decoder reads such files byte-for-byte identically (its
decode loop dispatches per gram on the flag bit) — cross-checked in
tests against a dump captured from the reference C library compiled in
this container. Compression parity is an explicit non-goal (SURVEY §4:
Parquet owns compression in this engine); the writer exists so (a)
round-trip property tests exercise the same bitstream grammar the
reader parses, and (b) small extracts can be handed back to C-library
consumers.

Scale shape of ``read_tdb``: metadata (info/fields/TOC) parses on the
driver; trail ranges split into ~32 MB partitions which decode in
executors via ``mapInPandas`` — each worker opens the file itself
(seekable local/shared-FS path, the same deployment contract as the
reference's mmap) and reads ONLY its byte slice of ``trails.data``
plus the shared lexicons (cached per worker process). A one-file tdb is
inherently single-host data; at 100 TB the corpus is many tdbs (the
reference's own "daily tdb" pattern, doc/docs/index.md:43-45) — import
parallelism comes from one job per file × partitions within the file.
"""

from __future__ import annotations

import io
import os
import struct
import tarfile

import numpy as np

TDB_TAR_MAGIC = b"TAR TOC FOR TDB VER 1\n"
TOC_FILE_OFFSET = 2560
UINT32_MAX = 0xFFFFFFFF
_MASK64 = (1 << 64) - 1


def _bits_needed(maxval: int) -> int:
    """src/tdb_huffman.c:34-43: bits to hold maxval; 0 still takes 1."""
    return maxval.bit_length() if maxval > 0 else 1


def _item_field(item: int) -> int:
    if not item & 128:
        return item & 127
    return (item & 127) | (((item >> 8) & 127) << 7)


def _item_val(item: int) -> int:
    if not item & 128:
        return (item >> 8) & UINT32_MAX
    return item >> 16


def _make_item(field: int, val: int) -> int:
    if field > 127 or val > 0xFFFFFF:
        return (field & 127) | 128 | ((field >> 7) << 8) | (val << 16)
    return field | (val << 8)


# --------------------------------------------------------------------------
# container access (directory or tar package)
# --------------------------------------------------------------------------

def _parse_package_toc(f) -> dict[str, tuple[int, int]]:
    """Member map from the fixed-offset text TOC; falls back to a
    generic tar walk when the magic is absent (a tdb repacked by
    ordinary tar tooling is still a valid archive)."""
    f.seek(TOC_FILE_OFFSET)
    head = f.read(len(TDB_TAR_MAGIC))
    members: dict[str, tuple[int, int]] = {}
    if head == TDB_TAR_MAGIC:
        buf = f.read(65536)
        for line in buf.split(b"\n"):
            if not line:
                break
            parts = line.split(b" ")
            if len(parts) != 3:
                break
            members[parts[0].decode()] = (int(parts[1]), int(parts[2]))
        if members:
            return members
    f.seek(0)
    tf = tarfile.open(fileobj=f, mode="r:")
    for m in tf.getmembers():
        members[m.name] = (m.offset_data, m.size)
    return members


class _Container:
    """Uniform byte access to a tdb's members for both layouts."""

    def __init__(self, path: str):
        self.path = path
        if os.path.isdir(path):
            self.is_package = False
            self.members = None
        elif os.path.isfile(path):
            self.is_package = True
            with open(path, "rb") as f:
                self.members = _parse_package_toc(f)
        elif os.path.isdir(path + ".tdb"):
            # the reference tries "<root>.tdb" when <root> is absent
            self.path = path + ".tdb"
            self.is_package = False
            self.members = None
        elif os.path.isfile(path + ".tdb"):
            self.path = path + ".tdb"
            self.is_package = True
            with open(self.path, "rb") as f:
                self.members = _parse_package_toc(f)
        else:
            raise FileNotFoundError(f"no tdb at {path!r} (or {path!r}.tdb)")

    def has(self, name: str) -> bool:
        if self.is_package:
            return name in self.members
        return os.path.exists(os.path.join(self.path, name))

    def read(self, name: str) -> bytes:
        if self.is_package:
            off, size = self.members[name]
            with open(self.path, "rb") as f:
                f.seek(off)
                return f.read(size)
        with open(os.path.join(self.path, name), "rb") as f:
            return f.read()

    def read_slice(self, name: str, start: int, length: int) -> bytes:
        if self.is_package:
            off, size = self.members[name]
            if start + length > size:
                length = max(0, size - start)
            with open(self.path, "rb") as f:
                f.seek(off + start)
                return f.read(length)
        with open(os.path.join(self.path, name), "rb") as f:
            f.seek(start)
            return f.read(length)

    def size(self, name: str) -> int:
        if self.is_package:
            return self.members[name][1]
        return os.path.getsize(os.path.join(self.path, name))


# --------------------------------------------------------------------------
# metadata
# --------------------------------------------------------------------------

class TdbMeta:
    """Driver/worker-side parsed tdb metadata: everything except
    ``trails.data`` payload bytes (the TOC is included — it is what
    partitions the payload)."""

    def __init__(self, path: str):
        c = _Container(path)
        self.path = c.path
        self.is_package = c.is_package

        info = c.read("info").split()
        (self.num_trails, self.num_events, self.min_timestamp,
         self.max_timestamp, self.max_timestamp_delta) = (
            int(x) for x in info[:5]
        )

        if c.has("version"):
            self.version = int(c.read("version").strip() or 0)
            if self.version > 1:
                raise ValueError(
                    f"incompatible tdb version {self.version} (latest: 1)"
                )
        else:
            self.version = 0

        raw_fields = c.read("fields").split(b"\n")
        names = []
        for line in raw_fields:
            if line == b"":
                break  # v1 terminator; v0 files simply end
            names.append(line.decode())
        self.field_names = ["time"] + names
        self.num_fields = len(self.field_names)

        # lexicons: list (per ofield) of value-bytes lists, index = val-1
        self.lexicons: list[list[bytes]] = []
        for name in names:
            self.lexicons.append(
                _parse_lexicon(c.read(f"lexicon.{name}"), self.version)
            )

        if self.num_trails:
            uuids_name = "cookies" if self.version == 0 else "uuids"
            raw = c.read(uuids_name)
            self.uuids = [raw[i * 16:(i + 1) * 16] for i in range(self.num_trails)]

            data_size = c.size("trails.data")
            toc_raw = c.read("trails.toc")
            width = 4 if data_size < UINT32_MAX else 8
            self.toc = np.frombuffer(
                toc_raw, dtype=np.uint32 if width == 4 else np.uint64,
                count=self.num_trails + 1,
            ).astype(np.int64)

            cb = c.read("trails.codebook")
            if self.version == 0:
                ent = np.frombuffer(cb, dtype=np.dtype(
                    [("sym", "<u8"), ("bits", "<u4")]), count=65536)
                lo = (ent["sym"] & UINT32_MAX).astype(np.uint64)
                hi = (ent["sym"] >> np.uint64(32)).astype(np.uint64)
                self.cb_bits = ent["bits"].astype(np.int64)
            else:
                ent = np.frombuffer(cb, dtype=np.dtype(
                    [("lo", "<u8"), ("hi", "<u8"), ("bits", "<u4")]),
                    count=65536)
                lo, hi = ent["lo"], ent["hi"]
                self.cb_bits = ent["bits"].astype(np.int64)
            self.cb_lo = lo.astype(np.int64)  # packed item (low 64)
            self.cb_hi = hi.astype(np.int64)  # bigram second item
        else:
            self.uuids = []
            self.toc = np.zeros(1, dtype=np.int64)
            self.cb_lo = self.cb_hi = self.cb_bits = np.zeros(0, np.int64)

        # bit widths: src/tdb.c:229-253 + src/tdb_huffman.c:232-247
        self.field_id_bits = _bits_needed(self.num_fields)
        self.field_bits = [_bits_needed(self.max_timestamp_delta)] + [
            _bits_needed(len(lex)) for lex in self.lexicons
        ]

    def lexicon_size(self, field: int) -> int:
        """+1 for the implicit NULL, matching tdb_lexicon_size
        (src/tdb.c:455-465)."""
        if field == 0 or field >= self.num_fields:
            return 0
        return len(self.lexicons[field - 1]) + 1


def _parse_lexicon(blob: bytes, version: int) -> list[bytes]:
    if not blob:
        return []
    width = 8 if len(blob) > UINT32_MAX else 4
    fmt = "<I" if width == 4 else "<Q"
    (count,) = struct.unpack_from(fmt, blob, 0)
    offs = struct.unpack_from(f"<{count + 1}{'I' if width == 4 else 'Q'}",
                              blob, width)
    out = []
    for i in range(count):
        if version == 0:
            end = blob.index(0, offs[i])
            out.append(blob[offs[i]:end])
        else:
            out.append(blob[offs[i]:offs[i + 1]])
    return out


# --------------------------------------------------------------------------
# trail decode
# --------------------------------------------------------------------------

def _decode_trail(buf: bytes, meta: TdbMeta) -> list[tuple[int, list[int]]]:
    """One trail's bitstream → [(timestamp, [val per ofield]), ...].
    Mirrors _tdb_cursor_next_batch (src/tdb_decode.c:227-329) without a
    filter: full rows, edge encoding resolved through prev_items."""
    if not buf:
        return []
    data = buf + b"\x00" * 9  # read64 may peek past the last byte
    nbits = 8 * len(buf) - (data[0] & 7)
    offset = 3
    tstamp = meta.min_timestamp
    nf = meta.num_fields
    prev = [0] * nf
    fid_bits = meta.field_id_bits
    fid_mask = (1 << fid_bits) - 1
    fbits = meta.field_bits
    cb_lo, cb_hi, cb_bits = meta.cb_lo, meta.cb_hi, meta.cb_bits
    events = []

    def gram(offs):
        enc = (int.from_bytes(data[offs >> 3:(offs >> 3) + 9], "little")
               >> (offs & 7)) & _MASK64
        if enc & 1:
            idx = (enc >> 1) & 0xFFFF
            return int(cb_lo[idx]), int(cb_hi[idx]), offs + int(cb_bits[idx]) + 1
        field = (enc >> 1) & fid_mask
        fb = fbits[field]
        val = (enc >> (1 + fid_bits)) & ((1 << fb) - 1)
        return _make_item(field, val), 0, offs + 1 + fid_bits + fb

    while offset < nbits:
        item1, item2, offset = gram(offset)
        tstamp += _item_val(item1)
        if item2:
            f2 = _item_field(item2)
            if f2:
                prev[f2] = _item_val(item2)
        while offset < nbits:
            save = offset
            i1, i2, offset = gram(offset)
            f = _item_field(i1)
            if not f:
                offset = save
                break
            prev[f] = _item_val(i1)
            if i2:
                f2 = _item_field(i2)
                if f2:
                    prev[f2] = _item_val(i2)
        events.append((tstamp, prev[1:].copy()))
    return events


def iter_events(path: str, trail_range: tuple[int, int] | None = None):
    """Plain-Python iterator over (uuid_hex, timestamp, values...) rows —
    the cursor contract without Spark (used by tests and the CLI's
    streaming import)."""
    meta = TdbMeta(path)
    yield from _iter_events_meta(meta, trail_range)


def _iter_events_meta(meta: TdbMeta, trail_range=None):
    c = _Container(meta.path)
    start, end = trail_range or (0, meta.num_trails)
    if start >= end:
        return
    byte0, byte1 = int(meta.toc[start]), int(meta.toc[end])
    blob = c.read_slice("trails.data", byte0, byte1 - byte0)
    lex = meta.lexicons
    for t in range(start, end):
        b0, b1 = int(meta.toc[t]) - byte0, int(meta.toc[t + 1]) - byte0
        uuid_hex = meta.uuids[t].hex()
        for ts, vals in _decode_trail(blob[b0:b1], meta):
            row = [uuid_hex, ts]
            for f, v in enumerate(vals):
                row.append(
                    lex[f][v - 1].decode("utf-8", "replace") if v else ""
                )
            yield tuple(row)


def read_tdb(spark, path: str, target_bytes: int = 32 << 20):
    """Open a native TrailDB artifact as the engine's canonical event
    DataFrame. Trail ranges are split on the driver into ~target_bytes
    partitions of ``trails.data`` (contiguous byte slices — each task
    seeks once and decodes sequentially, the access pattern the TOC
    exists for); decode happens in executors via mapInPandas. The path
    must be visible to executors (local/shared FS — the reference's own
    deployment contract for mmap)."""
    import pandas as pd

    meta = TdbMeta(path)
    abspath = os.path.abspath(meta.path)
    names = meta.field_names[1:]
    schema = "uuid string, time long" + "".join(
        f", `{n}` string" for n in names
    )

    # contiguous trail ranges of ~target_bytes each
    ranges = []
    start = 0
    while start < meta.num_trails:
        end = start + 1
        limit = int(meta.toc[start]) + target_bytes
        while end < meta.num_trails and int(meta.toc[end + 1]) <= limit:
            end += 1
        ranges.append((start, end))
        start = end
    if not ranges:
        return spark.createDataFrame([], schema)

    def decode(batches):
        metas = _WORKER_META
        m = metas.get(abspath)
        if m is None:
            m = metas[abspath] = TdbMeta(abspath)
        for pdf in batches:
            for s, e in zip(pdf["start"], pdf["end"]):
                rows = list(_iter_events_meta(m, (int(s), int(e))))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["uuid", "time"] + names
                    )

    rdf = spark.createDataFrame(ranges, "start long, end long")
    rdf = rdf.repartition(min(len(ranges), 64))
    return rdf.mapInPandas(decode, schema)


_WORKER_META: dict = {}  # per-worker-process TdbMeta cache


# --------------------------------------------------------------------------
# literal-only writer
# --------------------------------------------------------------------------

class _BitWriter:
    """LSB-first bit packer (write_bits, src/tdb_bits.h:17-22)."""

    def __init__(self):
        self.acc = 0
        self.n = 0

    def write(self, val: int, bits: int) -> None:
        self.acc |= (val & ((1 << bits) - 1)) << self.n
        self.n += bits

    def close_trail(self) -> bytes:
        """Store the 3-bit residual reserved at the head and byte-pad
        (src/tdb_encode.c:277-283,338-345)."""
        resid = (8 - (self.n & 7)) & 7
        self.acc |= resid  # bits 0-2 were written as zeros by reserve
        nbytes = (self.n + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


def write_tdb(
    rows,
    fields: list[str],
    path: str,
    package: bool = False,
    version: int = 1,
) -> str:
    """Write a spec-valid literal-only ``.tdb`` (see module docstring).

    ``rows``: iterable of ``(uuid_hex_or_bytes, time, *values)`` with
    one value (str/bytes, ``''``/None = NULL) per ofield. Rows need not
    be pre-sorted: trails sort by the reference's uuid order
    (little-endian 128-bit compare) and events by (time, input order).
    ``fields``: ofield names (``time`` is implicit field 0).
    ``package=True`` emits the single-file tar form, else a directory.
    ``version=0`` writes the legacy layout (``cookies`` file,
    NUL-terminated lexicon values, 12-byte codebook entries, no
    ``version`` file, fields without the blank-line terminator) — kept
    so the v0 read path is round-trip-testable without a museum file.

    This is a driver-side encoder for bounded extracts/fixtures — the
    output is ONE file by format design, so at scale you export many
    tdbs (time shards), not one huge one.
    """
    if version not in (0, 1):
        raise ValueError("write_tdb: version must be 0 or 1")
    if version == 0 and package:
        # the v0 fields file reads to EOF (src/tdb.c:155-165) — inside a
        # tar the reference's unbounded package_fopen stream would run
        # into the next member, so v0 packages never existed
        raise ValueError("write_tdb: v0 + package is not a valid "
                         "combination (v0 predates the tar package)")
    for name in fields:
        if name == "time" or not name or any(
            ch in name for ch in " \t\n\r/\\"
        ):
            raise ValueError(f"write_tdb: invalid field name {name!r}")

    nf = len(fields) + 1
    trails: dict[bytes, list] = {}
    lexsets: list[dict[bytes, int]] = [dict() for _ in fields]
    n_events = 0
    for row in rows:
        uuid = row[0]
        if isinstance(uuid, str):
            # the tdb format requires exactly 16 raw bytes; the engine's
            # uuid column is any string. Accept 1-32 hex chars (zero-pad
            # left — deterministic, order-preserving for the reference's
            # little-endian compare of equal-length ids); anything else
            # must be hashed by the caller first (md5 hex is the
            # engine's own convention elsewhere).
            if len(uuid) > 32:
                raise ValueError(
                    f"write_tdb: uuid longer than 32 hex chars: {uuid!r}"
                )
            try:
                uuid = bytes.fromhex(uuid.rjust(32, "0"))
            except ValueError:
                raise ValueError(
                    f"write_tdb: uuid is not hex: {uuid!r} — hash it "
                    "(e.g. md5(uuid)) before exporting to .tdb"
                ) from None
        if len(uuid) != 16:
            raise ValueError("write_tdb: uuid must be 16 bytes / 32 hex")
        ts = int(row[1])
        vals = []
        for i, v in enumerate(row[2:2 + len(fields)]):
            if v is None:
                v = b""
            elif isinstance(v, str):
                v = v.encode("utf-8")
            if v and v not in lexsets[i]:
                lexsets[i][v] = 0
            vals.append(v)
        trails.setdefault(uuid, []).append((ts, vals))
        n_events += 1

    # lexicons in sorted value order (any order is valid for reading;
    # sorted makes the artifact deterministic)
    lexicons = [sorted(ls) for ls in lexsets]
    val_id = [
        {v: i + 1 for i, v in enumerate(lex)} for lex in lexicons
    ]

    uuids = sorted(trails, key=lambda u: int.from_bytes(u, "little"))
    min_ts = min((ev[0] for evs in trails.values() for ev in evs),
                 default=0)
    max_ts = max((ev[0] for evs in trails.values() for ev in evs),
                 default=0)
    max_delta = 0
    for evs in trails.values():
        evs.sort(key=lambda e: e[0])
        prev_t = min_ts
        for ts, _ in evs:
            max_delta = max(max_delta, ts - prev_t)
            prev_t = ts

    field_id_bits = _bits_needed(nf)
    field_bits = [_bits_needed(max_delta)] + [
        _bits_needed(len(lex)) for lex in lexicons
    ]

    data = io.BytesIO()
    toc = []
    for uuid in uuids:
        w = _BitWriter()
        w.write(0, 3)  # residual placeholder
        prev_vals = [0] * len(fields)
        prev_t = min_ts
        for ts, vals in trails[uuid]:
            w.write(0, 1)  # literal flag
            w.write(0, field_id_bits)  # field 0 = timestamp
            w.write(ts - prev_t, field_bits[0])
            prev_t = ts
            for i, v in enumerate(vals):
                vid = val_id[i][v] if v else 0
                if vid != prev_vals[i]:  # edge encoding
                    w.write(0, 1)
                    w.write(i + 1, field_id_bits)
                    w.write(vid, field_bits[i + 1])
                    prev_vals[i] = vid
        toc.append(data.tell())
        data.write(w.close_trail())
    toc.append(data.tell())
    data.write(b"\x00" * 8)  # decoder may read up to 7 bytes past the end

    data_bytes = data.getvalue()
    toc_width = 4 if len(data_bytes) < UINT32_MAX else 8
    toc_bytes = b"".join(
        t.to_bytes(toc_width, "little") for t in toc
    )

    cb_entry = 12 if version == 0 else 20
    members = [
        ("version", None if version == 0 else b"1"),
        ("info",
         f"{len(uuids)} {n_events} {min_ts} {max_ts} {max_delta}\n"
         .encode()),
        ("fields",
         ("".join(f"{n}\n" for n in fields)
          + ("" if version == 0 else "\n")).encode()),
    ]
    for name, lex in zip(fields, lexicons):
        members.append((f"lexicon.{name}", _render_lexicon(lex, version)))
    if uuids:
        members.append(
            ("cookies" if version == 0 else "uuids", b"".join(uuids))
        )
        members.append(("trails.codebook", b"\x00" * (65536 * cb_entry)))
        members.append(("trails.toc", toc_bytes))
        members.append(("trails.data", data_bytes))
    members = [(n, b) for n, b in members if b is not None]

    if not package:
        os.makedirs(path, exist_ok=True)
        for name, blob in members:
            with open(os.path.join(path, name), "wb") as f:
                f.write(blob)
        return path
    _write_package(path, members)
    return path


def _render_lexicon(values: list[bytes], version: int) -> bytes:
    blobs = [v + b"\x00" for v in values] if version == 0 else values
    count = len(values)
    head = (count + 2) * 4 + sum(len(b) for b in blobs)
    width = 8 if head > UINT32_MAX else 4
    base = (count + 2) * width
    offs = [base]
    for b in blobs:
        offs.append(offs[-1] + len(b))
    return (
        count.to_bytes(width, "little")
        + b"".join(o.to_bytes(width, "little") for o in offs)
        + b"".join(blobs)
    )


def _write_package(path: str, members: list[tuple[str, bytes]]) -> None:
    """Reference package shape: ustar tar whose first three members are
    version, info, tar.toc — putting the text TOC's data at the fixed
    offset 2560 the reference seeks to (src/tdb_package.c:91). The TOC
    size feeds back into later offsets, so iterate to a fixed point."""
    head = [m for m in members if m[0] in ("version", "info")]
    rest = [m for m in members if m[0] not in ("version", "info")]
    if len(head) < 2:  # v0 has no version file; keep info at slot 2
        head = [("version", b"0")] + head

    def layout(toc_blob_size: int):
        offs = {}
        pos = 0
        order = head + [("tar.toc", b"\x00" * toc_blob_size)] + rest
        for name, blob in order:
            pos += 512  # header
            offs[name] = (pos, len(blob))
            pos += ((len(blob) + 511) // 512) * 512
        return order, offs

    toc_size = 512
    while True:
        order, offs = layout(toc_size)
        lines = [TDB_TAR_MAGIC.decode()[:-1]]
        for name, _ in order:
            o, s = offs[name]
            s = toc_size if name == "tar.toc" else s
            lines.append(f"{name} {o} {s}")
        toc_text = ("\n".join(lines) + "\n\n").encode()
        if len(toc_text) <= toc_size:
            break
        toc_size += 512
    assert offs["tar.toc"][0] == TOC_FILE_OFFSET

    with open(path, "wb") as f:
        tf = tarfile.open(fileobj=f, mode="w", format=tarfile.USTAR_FORMAT)
        for name, blob in order:
            if name == "tar.toc":
                blob = toc_text + b"\x00" * (toc_size - len(toc_text))
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(blob))
        tf.close()
