"""Compressed-export SIZE PARITY vs the reference C encoder
(VERDICT r8 "What's missing" #1 / Next #4).

Same deterministic zipf corpus (the COVERAGE.md 0.55x corpus: 20k
trails x 15 events, 200/1000-value lexicons) encoded five ways:

  1. our writer, literal            (write_tdb)
  2. our writer, unigram Huffman    (write_tdb(compress=True, bigrams=False))
  3. our writer, bigram Huffman     (write_tdb(compress=True) — the full
                                     Apriori + set-cover model, round 10)
  4. reference C encoder, unigram   (tools/cdump/make.c, TDB_CONS_NO_BIGRAMS=1)
  5. reference C encoder, bigram    (tools/cdump/make.c, default — the
                                     full Apriori + set-cover pipeline,
                                     src/tdb_encode_model.c:178-275,383-446)

and cross-checked both directions:

  - C dump (tools/cdump/dump.c) of every artifact == the corpus CSV
    byte-for-byte (the reference library accepts all five);
  - our scalar reader (_iter_events_meta) over the C BIGRAM artifact
    == the corpus (python-decode of reference-encoded bigram streams —
    the reverse leg of the round-8 gold chain);
  - our bigram gram MODEL is the reference's exactly (22,713 identical
    symbol frequencies on the diagnostic corpus; trails.toc comes out
    byte-identical, i.e. every trail encodes to the same byte length —
    data/codebook bytes differ only by Huffman tie-break code
    assignment, which the format leaves unspecified).

Builds the C harnesses with gcc if missing (the cdump README recipe).
Prints a JSON result line; the table lands in COVERAGE.md / SCALE.md.

With --fixture, also copies the small C-encoded BIGRAM artifact +
gold CSV into tests/fixtures/tdb_bigram/ so the no-toolchain test
(test_bigram_fixture_cross_decoder) can re-run the differential
forever.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from traildb_spark.sources.tdbfile import (  # noqa: E402
    TdbMeta, _iter_events_meta, write_tdb,
)

CDUMP = os.path.join(REPO, "tools", "cdump")
REF = "/root/reference/src"
FIELDS = ["event_type", "tag"]

ENC_SRCS = [
    "tdb.c", "tdb_cons.c", "tdb_encode.c", "tdb_encode_model.c",
    "tdb_huffman.c", "tdb_decode.c", "tdb_package.c", "tdb_queue.c",
    "tdb_uuid.c", "judy_str_map.c", "judy_128_map.c", "arena.c",
    "xxhash/xxhash.c", "dsfmt/dSFMT.c",
]
DEC_SRCS = [
    "tdb.c", "tdb_decode.c", "tdb_package.c", "tdb_huffman.c",
    "tdb_queue.c", "tdb_uuid.c",
]


def build_harness(name: str, main_c: str, srcs: list[str],
                  extra: list[str]) -> str:
    out = f"/tmp/{name}"
    if os.path.exists(out):
        return out
    cmd = (["gcc", "-O2", "-DDSFMT_MEXP=521", "-include", "limits.h",
            "-include", "inttypes.h", f"-I{CDUMP}", f"-I{REF}", "-o", out,
            os.path.join(CDUMP, main_c)]
           + extra + [os.path.join(REF, s) for s in srcs])
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def zipf_ranks(rng, n, n_vals, a=1.3):
    """Deterministic zipf-skewed value ids in [0, n_vals)."""
    w = 1.0 / np.arange(1, n_vals + 1) ** a
    return rng.choice(n_vals, size=n, p=w / w.sum())


def make_corpus(n_trails=20_000, events_per_trail=15):
    """(uuid_hex, time, event_type, tag) rows, trail-major,
    time-ascending within trail — the COVERAGE.md ratio corpus."""
    rng = np.random.default_rng(7)
    n = n_trails * events_per_trail
    et = zipf_ranks(rng, n, 200)
    tag = zipf_ranks(rng, n, 1000)
    deltas = rng.integers(1, 4000, size=n)
    rows = []
    k = 0
    for t in range(n_trails):
        uuid = f"{t:032x}"
        ts = 1_500_000_000
        for _ in range(events_per_trail):
            ts += int(deltas[k])
            rows.append((uuid, ts, f"e{et[k]:03d}", f"t{tag[k]:04d}"))
            k += 1
    return rows


def write_csv(rows, path):
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]},{r[3]}\n")


def dir_sizes(path):
    data = os.path.getsize(os.path.join(path, "trails.data"))
    cb = os.path.getsize(os.path.join(path, "trails.codebook"))
    total = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f)))
    return {"data": data, "codebook": cb, "total": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trails", type=int, default=20_000)
    ap.add_argument("--events", type=int, default=15)
    ap.add_argument("--fixture", action="store_true",
                    help="refresh tests/fixtures/tdb_bigram/ from a small "
                         "corpus (500 trails)")
    args = ap.parse_args()

    tdb_make = build_harness("tdb_make", "make.c", ENC_SRCS, [])
    tdb_dump = build_harness("tdb_dump_sp", "dump.c", DEC_SRCS,
                             [os.path.join(CDUMP, "stubs.c")])

    rows = make_corpus(args.trails, args.events)
    work = tempfile.mkdtemp(prefix="size_parity_")
    csv = os.path.join(work, "corpus.csv")
    write_csv(rows, csv)

    # 1+2+3: our writer
    ours_lit = os.path.join(work, "ours_lit")
    ours_uni = os.path.join(work, "ours_uni")
    ours_big = os.path.join(work, "ours_big")
    write_tdb(rows, FIELDS, ours_lit)
    write_tdb(rows, FIELDS, ours_uni, compress=True, bigrams=False)
    write_tdb(rows, FIELDS, ours_big, compress=True)

    # 4+5: reference encoder
    ref_uni = os.path.join(work, "ref_uni")
    ref_big = os.path.join(work, "ref_big")
    subprocess.run([tdb_make, csv, ref_uni] + FIELDS, check=True,
                   env=dict(os.environ, TDB_CONS_NO_BIGRAMS="1"),
                   capture_output=True)
    subprocess.run([tdb_make, csv, ref_big] + FIELDS, check=True,
                   capture_output=True)

    sizes = {
        "ours_literal": dir_sizes(ours_lit),
        "ours_unigram": dir_sizes(ours_uni),
        "ours_bigram": dir_sizes(ours_big),
        "ref_unigram": dir_sizes(ref_uni),
        "ref_bigram": dir_sizes(ref_big),
    }

    # cross-checks — C dump of every artifact must equal the corpus CSV
    want = sorted(open(csv).read().splitlines())
    for name, path in [("ours_lit", ours_lit), ("ours_uni", ours_uni),
                       ("ours_big", ours_big),
                       ("ref_uni", ref_uni), ("ref_big", ref_big)]:
        out = subprocess.run([tdb_dump, path], check=True,
                             capture_output=True, text=True).stdout
        got = sorted(out.splitlines())
        assert got == want, f"C dump of {name} != corpus"
    print("C decoder round-trip: all five artifacts dump the corpus",
          file=sys.stderr)

    # our reader over the C BIGRAM artifact (reverse interop leg)
    meta = TdbMeta(ref_big)
    got = sorted(
        ",".join(str(x) for x in row)
        for row in _iter_events_meta(meta, (0, meta.num_trails))
    )
    assert got == want, "python decode of the C bigram artifact != corpus"
    print("python scalar decode of C bigram artifact == corpus",
          file=sys.stderr)

    if args.fixture:
        fx_rows = make_corpus(500, 15)
        fx_csv = os.path.join(work, "fx.csv")
        write_csv(fx_rows, fx_csv)
        fx_tdb = os.path.join(work, "fx_tdb")
        subprocess.run([tdb_make, fx_csv, fx_tdb] + FIELDS, check=True,
                       capture_output=True)
        dest = os.path.join(REPO, "tests", "fixtures", "tdb_bigram")
        shutil.rmtree(dest, ignore_errors=True)
        shutil.copytree(fx_tdb, dest)
        shutil.copyfile(fx_csv, os.path.join(dest, "gold.csv"))
        print(f"fixture refreshed: {dest}", file=sys.stderr)

    n = len(rows)
    result = {
        "events": n,
        "trails": args.trails,
        "sizes": sizes,
        "data_ratio_ours_uni_vs_lit": round(
            sizes["ours_unigram"]["data"] / sizes["ours_literal"]["data"], 3),
        "data_ratio_ours_uni_vs_ref_uni": round(
            sizes["ours_unigram"]["data"] / sizes["ref_unigram"]["data"], 3),
        "data_ratio_ours_big_vs_ref_big": round(
            sizes["ours_bigram"]["data"] / sizes["ref_bigram"]["data"], 4),
        "total_ratio_ours_big_vs_ref_big": round(
            sizes["ours_bigram"]["total"] / sizes["ref_bigram"]["total"], 4),
    }
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
