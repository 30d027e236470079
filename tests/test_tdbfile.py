"""Native .tdb format: reader/writer round-trips, the reference's own
test.tdb, a committed gold dump captured from the reference C library,
Spark integration, and the CLI import/export loop.

The gold chain: ``tests/fixtures/tdb_gold.csv`` is the output of the
reference implementation's decoder (tdb.c/tdb_decode.c/tdb_huffman.h
compiled in this container) run over the deterministic fixture built by
``gold_fixture_rows()`` + ``write_tdb``. The test regenerates the same
fixture and demands OUR reader produce identical rows — so reader and
writer are pinned to the reference's behavior without needing a C
toolchain at test time (the codec-module differential pattern;
reference ethos: tests/c-tests/multi_cursor.c:129-146 qsort oracle).
"""

import os
import subprocess
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from traildb_spark.sources import tdbfile
from traildb_spark.sources.tdbfile import (
    TdbMeta,
    iter_events,
    read_tdb,
    write_tdb,
)

FIXTURES = Path(__file__).parent / "fixtures"
REFERENCE_TDB = "/root/reference/test.tdb"


def gold_fixture_rows():
    """Deterministic fixture: 40 trails, ~300 events, values exercising
    empties (val 0), value→empty transitions (edge encoding must emit
    the NULL item), commas/newlines/unicode (the C dump escapes them),
    shared timestamps, and >1-byte lexicon codes."""
    rows = []
    vals_a = ["view", "click", "", "purchase", "naïve→", "a,b\nc", "z" * 40]
    vals_b = ["", "x", "yy", "zzz", "Ω"]
    for u in range(40):
        uuid = bytes([u * 3 % 251] + [(u * 7 + k) % 256 for k in range(15)])
        t = 1_500_000_000 + (u * 977) % 10_000
        for i in range((u * 13) % 9 + 1):
            t += (u + i * 131) % 4000
            rows.append((
                uuid.hex(), t,
                vals_a[(u + i) % len(vals_a)],
                vals_b[(u * i) % len(vals_b)],
                str((u * 31 + i) % 50),
            ))
    return rows, ["event_type", "tag", "num"]


def c_dump_escape(s: str) -> str:
    """The gold CSV uses the C dumper's escaping for , \\ and controls."""
    return "".join(
        f"\\x{ord(ch):02x}" if ch in ",\\" or ord(ch) < 32 else ch
        for ch in s
    )


def expected_rows(rows):
    """Reference semantics: trails in little-endian-uint128 uuid order,
    events per trail by (time, input order), edge decode == full rows."""
    from collections import defaultdict

    tr = defaultdict(list)
    for r in rows:
        tr[bytes.fromhex(r[0])].append(r[1:])
    out = []
    for u in sorted(tr, key=lambda b: int.from_bytes(b, "little")):
        for ev in sorted(tr[u], key=lambda e: e[0]):
            out.append((u.hex(),) + tuple(ev))
    return out


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TDB), reason="reference test.tdb absent"
)
def test_reader_matches_reference_test_tdb():
    """The reference's in-tree artifact (real encoder: Huffman codebook,
    tar package) decodes to exactly what the C library dumps."""
    meta = TdbMeta(REFERENCE_TDB)
    assert meta.version == 1
    assert meta.field_names == ["time", "first_field", "second_field"]
    assert (meta.num_trails, meta.num_events) == (2, 2)
    assert meta.lexicon_size(1) == 3  # 'hello', 'it' + implicit NULL
    rows = list(iter_events(REFERENCE_TDB))
    assert rows == [
        ("10000000000000000000000000000000", 1463696903, "hello", "world"),
        ("20000000000000000000000000000000", 1463696952, "it", "works!"),
    ]


def test_gold_dump_cross_decoder(tmp_path):
    """Committed C-decoder output == our reader, over our writer's file."""
    rows, fields = gold_fixture_rows()
    path = str(tmp_path / "gold.tdb")
    write_tdb(rows, fields, path, package=True)
    got = [
        ",".join([r[0], str(r[1])] + [c_dump_escape(v) for v in r[2:]])
        for r in iter_events(path)
    ]
    gold = (FIXTURES / "tdb_gold.csv").read_text().strip().split("\n")
    assert got == gold


@pytest.mark.parametrize("version", [1, 0])
@pytest.mark.parametrize("package", [False, True])
def test_write_read_roundtrip(tmp_path, version, package):
    if version == 0 and package:
        with pytest.raises(ValueError, match="v0"):
            write_tdb([], ["f"], str(tmp_path / "x.tdb"),
                      package=True, version=0)
        return
    rows, fields = gold_fixture_rows()
    path = str(tmp_path / ("rt.tdb" if package else "rt"))
    write_tdb(rows, fields, path, package=package, version=version)
    assert list(iter_events(path)) == expected_rows(rows)


def test_roundtrip_edge_cases(tmp_path):
    # value -> empty transition forces an explicit val-0 item; ties on
    # time keep input order; single-event trails; 16-byte uuid extremes
    rows = [
        ("ff" * 16, 100, "a"),
        ("ff" * 16, 100, ""),       # same ts, value -> NULL
        ("ff" * 16, 100, "a"),      # NULL -> value again
        ("00" * 16, 5, ""),         # all-NULL single event
    ]
    path = str(tmp_path / "edge")
    write_tdb(rows, ["v"], path)
    got = list(iter_events(path))
    assert got == [
        ("00" * 16, 5, ""),
        ("ff" * 16, 100, "a"),
        ("ff" * 16, 100, ""),
        ("ff" * 16, 100, "a"),
    ]

    # zero ofields (reference tests/c-tests/zero_fields.c)
    path2 = str(tmp_path / "zf")
    write_tdb([("ab" * 16, 7), ("ab" * 16, 9)], [], path2)
    assert list(iter_events(path2)) == [("ab" * 16, 7), ("ab" * 16, 9)]

    # >127 fields exercises wide field ids in the literal paths
    nf = 140
    fields = [f"f{i:03d}" for i in range(nf)]
    row = ("cd" * 16, 1, *[f"v{i}" if i % 3 else "" for i in range(nf)])
    path3 = str(tmp_path / "wide")
    write_tdb([row], fields, path3)
    assert list(iter_events(path3)) == [row]

    # invalid inputs
    with pytest.raises(ValueError, match="not hex"):
        write_tdb([("not-hex!", 1, "x")], ["v"], str(tmp_path / "bad1"))
    with pytest.raises(ValueError, match="invalid field name"):
        write_tdb([], ["time"], str(tmp_path / "bad2"))
    with pytest.raises(FileNotFoundError):
        TdbMeta(str(tmp_path / "missing"))


def test_vectorized_decoder_matches_scalar(tmp_path):
    """The across-trails vectorized range decoder (_decode_range_pdf)
    is differentially pinned to the per-gram scalar oracle
    (iter_events) on a fixture big enough (200 trails in one range)
    that the numpy main loop — not just the <32-active scalar tail —
    does the work, including whale trails that spill into the tail."""
    rows = []
    fields = ["event_type", "tag", "num"]
    vals = ["", "view", "click", "purchase", "naïve→", "x" * 50]
    for u in range(200):
        uuid = bytes([(u * 11 + k * 17) % 256 for k in range(16)])
        t = 1_600_000_000 + u
        # trail 0 is a whale (400 events) to force the scalar-tail path
        n_ev = 400 if u == 0 else (u * 7) % 11 + 1
        for i in range(n_ev):
            t += (u * 13 + i * 29) % 1000
            rows.append((
                uuid.hex(), t,
                vals[(u + i) % len(vals)],
                vals[(u * 3 + i * 5) % len(vals)],
                str((u + i * 7) % 30),
            ))
    path = str(tmp_path / "vec.tdb")
    write_tdb(rows, fields, path, package=True)

    meta = TdbMeta(path)
    # laziness contract: construction reads no per-trail metadata
    assert meta._toc is None and not meta._lex_values
    pdf = tdbfile._decode_range_pdf(meta, 0, meta.num_trails, fields)
    got = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    want = list(iter_events(path))
    assert got == want
    # split ranges must agree too (range-boundary bit offsets)
    pdf_a = tdbfile._decode_range_pdf(meta, 0, 67, fields)
    pdf_b = tdbfile._decode_range_pdf(meta, 67, meta.num_trails, fields)
    got_split = [tuple(r) for r in pdf_a.itertuples(index=False, name=None)]
    got_split += [tuple(r) for r in pdf_b.itertuples(index=False, name=None)]
    assert got_split == want


def test_bigram_fixture_cross_decoder(spark):
    """REVERSE interop leg of the gold chain: a committed artifact
    encoded by the REFERENCE C encoder's full pipeline (Apriori bigram
    candidates + weighted set cover + Huffman,
    src/tdb_encode_model.c:178-275,383-446 — captured via
    tools/size_parity.py --fixture, whose cdump/make.c compiles the
    reference encoder) must decode exactly in all three of our readers:
    scalar per-gram, vectorized across-trails, and the Spark read_tdb
    path. The codebook carries 31k+ BIGRAM entries (cb_hi nonzero), so
    this is the one fixture where our item2 decode branch does real
    work against reference-produced streams, not just our own writer's
    unigram output."""
    import numpy as np

    path = str(FIXTURES / "tdb_bigram")
    gold = sorted((FIXTURES / "tdb_bigram" / "gold.csv")
                  .read_text().strip().split("\n"))

    meta = TdbMeta(path)
    assert int(np.count_nonzero(meta.cb_hi)) > 1000  # bigrams present

    got_scalar = sorted(",".join(str(x) for x in r)
                        for r in tdbfile._iter_events_meta(meta))
    assert got_scalar == gold

    fields = ["event_type", "tag"]
    pdf = tdbfile._decode_range_pdf(meta, 0, meta.num_trails, fields)
    got_vec = sorted(",".join(str(x) for x in r)
                     for r in pdf.itertuples(index=False, name=None))
    assert got_vec == gold

    df = read_tdb(spark, path, target_bytes=64 * 1024)  # multi-range
    got_spark = sorted(
        f"{r['uuid']},{r['time']},{r['event_type']},{r['tag']}"
        for r in df.collect())
    assert got_spark == gold


def test_edge_fixture_cross_decoders():
    """Two committed artifacts encoded by the REFERENCE C encoder at
    edge shapes its own c-tests exercise — tdb_widets: ZERO ofields
    (zero_fields.c) with timestamp deltas just under TDB_MAX_TIMEDELTA
    = 2^47-1 (wide_timestamps.c:40-62); tdb_manyfields: 60 fields
    (really_lots_of_fields.c) at 95% empty values with wide deltas and
    1-event trails, values stressing the \\xNN escape set. Captured by
    tools/fuzz_tdb_codec.py's reference-encoder leg; both our readers
    must reproduce the gold CSV with no C toolchain at test time."""
    for tag in ("widets", "manyfields"):
        path = str(FIXTURES / f"tdb_{tag}")
        gold = sorted((FIXTURES / f"tdb_{tag}" / "gold.csv")
                      .read_text().strip().split("\n"))
        fields = (FIXTURES / f"tdb_{tag}" / "FIELDS").read_text().split()
        meta = TdbMeta(path)
        got_scalar = sorted(
            ",".join([r[0], str(r[1])]
                     + [c_dump_escape(v) for v in r[2:]])
            for r in tdbfile._iter_events_meta(meta))
        assert got_scalar == gold, tag
        pdf = tdbfile._decode_range_pdf(meta, 0, meta.num_trails, fields)
        got_vec = sorted(
            ",".join([r[0], str(r[1])]
                     + [c_dump_escape(v) for v in r[2:]])
            for r in pdf.itertuples(index=False, name=None))
        assert got_vec == gold, tag


def test_codec_fuzz_sweep():
    """Seeded cross-decoder differential sweep (tools/fuzz_tdb_codec):
    random corpora across the reference c-tests' edge dimensions (0/1/
    60 fields, lexicon sizes, empty values, ts ties, deltas near
    TDB_MAX_TIMEDELTA, 1-event trails) → write_tdb in all three modes →
    scalar and vectorized readers reproduce each corpus; with a C
    toolchain in the container the reference decoder dumps every
    artifact and the reference ENCODER's output decodes back through
    our readers. Any disagreement self-pins as a fixture. Reduced shape
    set here; tools/fuzz_tdb_codec.py runs the full sweep."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from fuzz_tdb_codec import SHAPES, run_sweep

    # the cheapest representative slice: zero-field+wide-ts, common,
    # many-field-sparse-wide — the full 10-shape sweep is a tool run
    shapes = [SHAPES[1], SHAPES[3], SHAPES[8]]
    assert run_sweep(shapes=shapes) == 0


def test_compressed_writer_roundtrip(tmp_path):
    """write_tdb(compress=True) = the reference's FULL compression
    pipeline: Apriori candidate bigrams + per-event weighted set cover
    (make_grams/choose_grams_one_event, src/tdb_encode_model.c:178-275,
    383-446) feeding the Huffman stage (top-65536 symbols, two-queue
    tree, depth-16 cap, expanded codebook); ``bigrams=False`` is the
    reference's TDB_OPT_CONS_NO_BIGRAMS unigram mode. Both our decoders
    — and, via the pinned gold chains, the reference C library — must
    read both back exactly; the streams must actually shrink; and the
    vectorized decoder's CODEBOOK branch (not just literals) does the
    work on this 40-trail fixture."""
    rows, fields = gold_fixture_rows()
    lit = str(tmp_path / "lit.tdb")
    comp = str(tmp_path / "comp.tdb")
    uni = str(tmp_path / "uni.tdb")
    write_tdb(rows, fields, lit, package=True)
    write_tdb(rows, fields, comp, package=True, compress=True)
    write_tdb(rows, fields, uni, package=True, compress=True,
              bigrams=False)

    want = expected_rows(rows)
    for path in (comp, uni):
        assert list(iter_events(path)) == want
        meta = TdbMeta(path)
        pdf = tdbfile._decode_range_pdf(meta, 0, meta.num_trails, fields)
        assert [tuple(r)
                for r in pdf.itertuples(index=False, name=None)] == want
        # Huffman grams are present (codebook referenced) and pay off
        assert meta.cb_bits.max() > 0
        ratio = (meta._c.size("trails.data")
                 / TdbMeta(lit)._c.size("trails.data"))
        assert ratio < 0.85, (path, ratio)
    # the bigram cover never loses to unigram-only on the same corpus
    assert (TdbMeta(comp)._c.size("trails.data")
            <= TdbMeta(uni)._c.size("trails.data"))

    with pytest.raises(ValueError, match="compress requires version 1"):
        write_tdb(rows, fields, str(tmp_path / "v0c"), version=0,
                  compress=True)


def test_compressed_gold_cross_decoder(tmp_path):
    """The compressed-export gold chains: regenerating each
    deterministic compressed artifact must be byte-identical (md5
    pinned) to the one the reference C decoder (tools/cdump) dumped at
    capture time, and that dump equals tdb_gold.csv — so the C library
    provably reads our Huffman streams. Two chains: the unigram mode
    (bigrams=False, the original round-8 capture) and the full bigram
    mode (compress default since round 10 — Apriori + set cover model,
    C-dump re-verified at its capture)."""
    import hashlib

    rows, fields = gold_fixture_rows()
    gold = (FIXTURES / "tdb_gold.csv").read_text().strip().split("\n")
    for kwargs, want_md5 in [
        (dict(bigrams=False), "7ec91c928192ebbdf4b81c08a54ddb52"),
        (dict(), "d299ab97d1656a2fe68dbda5d6e0b6ea"),
    ]:
        path = str(tmp_path / f"gold_comp_{len(kwargs)}.tdb")
        write_tdb(rows, fields, path, package=True, compress=True,
                  **kwargs)
        with open(path, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()
        assert digest == want_md5, (kwargs, digest)
        got = [
            ",".join([r[0], str(r[1])] + [c_dump_escape(v) for v in r[2:]])
            for r in iter_events(path)
        ]
        assert got == gold, kwargs


def test_read_tdb_spark_and_open_tdb(spark, tmp_path):
    """Distributed decode: multi-partition ranges reassemble the full
    event set; TrailDataset.open_tdb applies the engine conventions."""
    rows, fields = gold_fixture_rows()
    path = str(tmp_path / "spark.tdb")
    write_tdb(rows, fields, path, package=True)
    # tiny target_bytes forces many partitions (range-split correctness)
    df = read_tdb(spark, path, target_bytes=256)
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(expected_rows(rows))
    assert df.columns == ["uuid", "time"] + fields

    from traildb_spark.dataset import TrailDataset

    ds = TrailDataset.open_tdb(spark, path)
    assert ds.df.count() == len(rows)
    out = str(tmp_path / "migrated")
    ds.finalize(out, mode="overwrite")
    back = TrailDataset.open(spark, out)
    assert back.info().num_events == len(rows)
    assert sorted(tuple(r) for r in back.df.collect()) == got


def test_cli_tdb_import_export(spark, tmp_path):
    """tdb dump --tdb → native artifact → tdb make --from-tdb → same
    events (the migration loop both ways)."""
    from traildb_spark import cli

    src = str(tmp_path / "src")
    rows, fields = gold_fixture_rows()
    write_tdb(rows, fields, src)
    exported = str(tmp_path / "exp.tdb")
    assert cli.main(["make", "--from-tdb", src, "-o",
                     str(tmp_path / "pq")]) == 0
    assert cli.main(["dump", "-i", str(tmp_path / "pq"), "-T",
                     "-o", exported]) == 0
    assert list(iter_events(exported)) == expected_rows(rows)
    # compressed export round-trips the same events
    comp = str(tmp_path / "exp_comp.tdb")
    assert cli.main(["dump", "-i", str(tmp_path / "pq"), "-T",
                     "--tdb-compress", "-o", comp]) == 0
    assert list(iter_events(comp)) == expected_rows(rows)
    assert (TdbMeta(comp)._c.size("trails.data")
            < TdbMeta(exported)._c.size("trails.data"))
    # knob rejection parity with -p/-O
    assert cli.main(["make", "--from-tdb", src, "--csv-header",
                     "-o", str(tmp_path / "x")]) == 1
    assert cli.main(["make", "--from-tdb", src, "-f", "a,b",
                     "-o", str(tmp_path / "x")]) == 1
    assert cli.main(["dump", "-i", str(tmp_path / "pq"), "-c",
                     "--tdb-compress", "-o", str(tmp_path / "y.csv")]) == 1


def test_package_generic_tar_fallback(tmp_path):
    """A tdb repacked by ordinary tar tooling (no fixed-offset TOC) must
    still open via the tarfile fallback."""
    import tarfile as tf

    rows, fields = gold_fixture_rows()
    d = str(tmp_path / "plain")
    write_tdb(rows, fields, d)
    repacked = tmp_path / "repacked.tdb"
    with tf.open(repacked, "w") as t:
        for name in sorted(os.listdir(d)):
            t.add(os.path.join(d, name), arcname=name)
    assert list(iter_events(str(repacked))) == expected_rows(rows)


def test_version_gate(tmp_path):
    rows, fields = gold_fixture_rows()
    d = str(tmp_path / "v9")
    write_tdb(rows[:5], fields, d)
    with open(os.path.join(d, "version"), "w") as f:
        f.write("9")
    with pytest.raises(ValueError, match="incompatible"):
        TdbMeta(d)
