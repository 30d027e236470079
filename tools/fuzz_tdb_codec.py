"""Randomized cross-decoder differential fuzz for the native .tdb codec
(VERDICT r9 Next #5).

The reference's own c-tests hit edge shapes the fixed fixtures don't
systematically sweep — timestamp deltas at TDB_MAX_TIMEDELTA
(tests/c-tests/wide_timestamps.c:40-62), zero ofields (zero_fields.c),
60+ fields (really_lots_of_fields.c), off-by-one lexicon boundaries
(off_by_one_encoding_bug.c), empty values, 1-event trails. This sweep
generates SEEDED random corpora across those dimensions and requires,
per corpus:

  forward  — write_tdb (literal AND compressed-bigram AND unigram) →
             our scalar reader (iter_events) and vectorized reader
             (_decode_range_pdf) both reproduce the corpus exactly;
             with the C toolchain present, the reference decoder
             (tools/cdump/dump.c) dumps every artifact to the corpus;
  reverse  — with the toolchain, the reference ENCODER
             (tools/cdump/make.c, default bigram mode) encodes the
             corpus and both our readers reproduce it.

Any disagreement copies the corpus + artifact into
tests/fixtures/fuzz_<tag>/ so the failing shape is pinned forever (the
tdb_bigram fixture discipline). Run directly for the full sweep;
tests/test_tdbfile.py::test_codec_fuzz_sweep runs a reduced seeded
sweep per CI pass (C legs auto-skip without gcc).

TDB_MAX_TIMEDELTA = 2^47 - 1 (src/tdb_limits.h:33): deltas are capped
just under it so finalize never refuses; the refusal path itself is the
reference's own test, not a codec-parity question.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from traildb_spark.sources.tdbfile import (  # noqa: E402
    TdbMeta,
    _decode_range_pdf,
    iter_events,
    write_tdb,
)

TDB_MAX_TIMEDELTA = (1 << 47) - 1

# (n_fields, max_lexicon, empty_p, n_trails, max_events, wide_ts)
SHAPES = [
    (0, 0, 0.0, 5, 40, False),      # zero ofields (zero_fields.c)
    (0, 0, 0.0, 3, 4, True),        # zero fields + near-max deltas
    (1, 1, 0.9, 10, 8, False),      # 1-value lexicon, mostly empties
    (2, 200, 0.3, 30, 30, False),   # the common shape
    (2, 5000, 0.0, 8, 120, False),  # lexicon >> events (rare repeats)
    (2, 3, 0.0, 20, 50, True),      # wide deltas + tiny lexicons
    (8, 16, 0.5, 15, 20, False),    # moderate width, half empties
    (60, 4, 0.3, 6, 10, False),     # really_lots_of_fields.c shape
    (60, 2, 0.95, 4, 6, True),      # wide + sparse + wide ts
    (1, 256, 0.0, 1, 1, False),     # single 1-event trail
]


def gen_corpus(rng: np.random.Generator, n_fields: int, max_lex: int,
               empty_p: float, n_trails: int, max_events: int,
               wide_ts: bool):
    """(rows, fields): seeded random corpus over one SHAPES row. Values
    include the dump-escaping stress set (commas, backslashes, control
    and >127 bytes) on top of plain tokens; timestamps include ties and
    (wide_ts) deltas up to just under TDB_MAX_TIMEDELTA."""
    fields = [f"f{i:02d}" for i in range(n_fields)]
    lexes = []
    for i in range(n_fields):
        vals = [f"v{i}_{j}" for j in range(max(1, max_lex - 3))]
        # escaping stress values (the C dumper's \xNN set)
        vals += ["a,b", "back\\slash", "ctl\x01\x1f", "hi\xc3\xa9"]
        lexes.append(vals[:max(1, max_lex)])
    rows = []
    for t in range(n_trails):
        uuid = f"{rng.integers(0, 1 << 62):032x}"
        n_ev = int(rng.integers(1, max_events + 1))
        ts = int(rng.integers(1, 10_000))
        for _ in range(n_ev):
            if wide_ts and rng.random() < 0.3:
                # jump so the delta lands near the 47-bit limit once
                ts = int(rng.integers(TDB_MAX_TIMEDELTA - 10,
                                      TDB_MAX_TIMEDELTA - 1))
            elif rng.random() < 0.15:
                pass  # timestamp tie (same ts as previous event)
            else:
                ts += int(rng.integers(0, 4000))
            vals = []
            for i in range(n_fields):
                if rng.random() < empty_p:
                    vals.append("")
                else:
                    vals.append(lexes[i][int(rng.integers(
                        0, len(lexes[i])))])
            rows.append((uuid, ts, *vals))
    return rows, fields


def expected(rows, n_fields):
    """Reference semantics: trails in little-endian-uint128 uuid order,
    events by (time, input order) within trail."""
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r[0]].append(r)
    out = []
    for u in sorted(per, key=lambda x: int.from_bytes(
            bytes.fromhex(x), "little")):
        evs = sorted(per[u], key=lambda r: r[1])
        out.extend((u,) + tuple(r[1:]) for r in evs)
    return sorted(",".join(str(x) for x in r) for r in out)


def c_escape(s: str) -> str:
    return "".join(
        f"\\x{b:02x}" if b in (0x2C, 0x5C) or b < 32 else chr(b)
        for b in s.encode("utf-8", "surrogateescape")
    )


def our_decode_both(path: str, fields):
    """(scalar_lines, vectorized_lines) — both sorted."""
    scalar = sorted(",".join(str(x) for x in r) for r in iter_events(path))
    meta = TdbMeta(path)
    pdf = _decode_range_pdf(meta, 0, meta.num_trails, fields)
    vec = sorted(",".join(str(x) for x in r)
                 for r in pdf.itertuples(index=False, name=None))
    return scalar, vec


def build_c_harnesses():
    """(tdb_make, tdb_dump) or (None, None) when gcc/toolchain absent."""
    if shutil.which("gcc") is None:
        return None, None
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from size_parity import DEC_SRCS, ENC_SRCS, build_harness
        mk = build_harness("tdb_make", "make.c", ENC_SRCS, [])
        dp = build_harness(
            "tdb_dump_sp", "dump.c", DEC_SRCS,
            [os.path.join(REPO, "tools", "cdump", "stubs.c")])
        return mk, dp
    except Exception as e:  # toolchain half-present: skip the C legs
        print(f"# C harness build failed, C legs skipped: {e}",
              file=sys.stderr)
        return None, None


def write_gold_csv(rows, path):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join([r[0], str(r[1])]
                             + [c_escape(v) for v in r[2:]]) + "\n")


def pin_fixture(tag: str, corpus_csv: str, artifact: str):
    dest = os.path.join(REPO, "tests", "fixtures", f"fuzz_{tag}")
    shutil.rmtree(dest, ignore_errors=True)
    if os.path.isdir(artifact):
        shutil.copytree(artifact, dest)
    else:  # single-file tar package
        os.makedirs(dest, exist_ok=True)
        shutil.copyfile(artifact, os.path.join(dest, "artifact.tdb"))
    shutil.copyfile(corpus_csv, os.path.join(dest, "gold.csv"))
    print(f"# DISAGREEMENT pinned: {dest}", file=sys.stderr)


def run_sweep(seed: int = 238713, shapes=None, spark_leg=False) -> int:
    """Returns the number of disagreements (0 = all decoders agree on
    every corpus). Disagreeing shapes are pinned as fixtures."""
    tdb_make, tdb_dump = build_c_harnesses()
    shapes = SHAPES if shapes is None else shapes
    bad = 0
    for si, shape in enumerate(shapes):
        rng = np.random.default_rng(seed + si)
        rows, fields = gen_corpus(rng, *shape)
        want_plain = expected(rows, len(fields))
        want_escaped = sorted(
            ",".join([r[0], str(r[1])] + [c_escape(v) for v in r[2:]])
            for r in rows)
        work = tempfile.mkdtemp(prefix=f"fuzz_tdb_{si}_")
        csv = os.path.join(work, "corpus.csv")
        write_gold_csv(rows, csv)
        tag = (f"f{shape[0]}_lex{shape[1]}_e{int(shape[2] * 100)}"
               f"_w{int(shape[5])}_s{si}")
        try:
            for mode, kwargs in [("lit", {}),
                                 ("big", dict(compress=True)),
                                 ("uni", dict(compress=True,
                                              bigrams=False)),
                                 # container + legacy lanes: the tar
                                 # package (fixed-offset TOC) and the v0
                                 # layout (cookies file, NUL-terminated
                                 # lexicons, 12-byte codebook entries)
                                 ("pkg", dict(package=True,
                                              compress=True)),
                                 ("v0", dict(version=0))]:
                art = os.path.join(work, f"ours_{mode}")
                write_tdb(rows, fields, art, **kwargs)
                scalar, vec = our_decode_both(art, fields)
                if not (scalar == vec == want_plain):
                    bad += 1
                    pin_fixture(f"{tag}_{mode}", csv, art)
                    continue
                if tdb_dump and mode != "v0":
                    # the compiled reference reads v1 dirs and packages;
                    # v0 is a museum layout our own readers cover
                    out = subprocess.run(
                        [tdb_dump, art], check=True, capture_output=True,
                        text=True).stdout
                    if sorted(out.splitlines()) != want_escaped:
                        bad += 1
                        pin_fixture(f"{tag}_{mode}_cdump", csv, art)
            if tdb_make:
                ref = os.path.join(work, "ref_big")
                subprocess.run([tdb_make, csv, ref] + fields, check=True,
                               capture_output=True)
                scalar, vec = our_decode_both(ref, fields)
                # C artifact values come back raw; compare via plain form
                if not (scalar == vec == want_plain):
                    bad += 1
                    pin_fixture(f"{tag}_refenc", csv, ref)
            print(f"# shape {si} {shape}: "
                  f"{len(rows)} events OK", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return bad


if __name__ == "__main__":
    n = run_sweep()
    print(f"fuzz sweep: {n} disagreement(s)")
    sys.exit(1 if n else 0)
