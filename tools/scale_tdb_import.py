"""SCALE leg for native .tdb import (VERDICT r7 item 1).

Builds a synthetic >=1M-trail / >=1GB literal-only tdb with a
vectorized generator (every trail shares one bitstream template —
valid per the format: trails are independent, uuids differ), then
measures:

  1. distributed import wall time + MB/s via read_tdb on local[N]
  2. the scalar per-gram decoder's MB/s on a trail prefix (the
     "before" baseline the vectorized kernel replaced)
  3. per-worker peak RSS (VmHWM of live pyspark.daemon workers) —
     the bounded-worker-memory proof: TdbMeta no longer materializes
     O(num_trails) Python uuids/TOC per worker

Usage: python tools/scale_tdb_import.py [--trails 1000000]
       [--events 210] [--dir /tmp/tdb_scale] [--keep]

Results are recorded in SCALE.md ("Native .tdb import at reference
scale").
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traildb_spark.sources.tdbfile import (  # noqa: E402
    TdbMeta, _BitWriter, _iter_events_meta, _render_lexicon, read_tdb,
    write_tdb,
)

LEX_N = 255          # 8-bit value ids
DELTA_BITS = 16      # max_timestamp_delta = 65535
FIELDS = ["event_type", "tag"]


def build_synthetic_tdb(path: str, num_trails: int, events_per_trail: int,
                        compress: bool = False):
    """Directory-layout tdb: one trail bitstream tiled num_trails times
    (valid by format — trails are independent; uuids differ); uuids =
    ascending little-endian counters (the reference's sort order),
    4-byte TOC via arange. ``compress=True`` builds the template trail
    through write_tdb's real Huffman stage (single-trail frequencies =
    per-trail frequencies under tiling, so the codebook is exactly what
    the encoder would pick) — the codebook-lane twin of the literal
    leg."""
    os.makedirs(path, exist_ok=True)
    nf = len(FIELDS) + 1
    fid_bits = max(1, nf.bit_length())  # bits_needed(3) = 2

    min_ts = 1_500_000_000
    deltas = [(i * 131) % 60000 + 1 for i in range(events_per_trail)]
    if compress:
        # encode ONE template trail with the real compressed writer,
        # then lift its trails.data (sans the 8-byte pad) + codebook
        import shutil
        import tempfile

        from traildb_spark.sources.tdbfile import TdbMeta

        tmp = tempfile.mkdtemp(prefix="tdb_template_")
        rows = []
        t = min_ts
        for i, d in enumerate(deltas):
            t += d
            rows.append(("00" * 16, t,
                         f"v{(i * 3) % LEX_N:03d}",
                         f"v{(i * 4 + 1) % LEX_N:03d}"))
        # pin the full lexicon so val ids cover 1..LEX_N regardless of
        # which values the template happens to use
        base = min_ts - 1
        for j in range(LEX_N):
            rows.append(("ff" * 16, base, f"v{j:03d}", f"v{j:03d}"))
        tpath = os.path.join(tmp, "template")
        write_tdb(rows, FIELDS, tpath, compress=True)
        m = TdbMeta(tpath)
        # reuse the template's OWN min_timestamp/max_delta: the reader
        # derives literal ts-gram widths from info, so they must match
        # what the encoder actually used
        min_ts = m.min_timestamp
        tmpl_max_delta = m.max_timestamp_delta
        toc_t = m.toc
        # trail 0 ('00'*16 sorts first) is the template trail
        blob = m._c.read_slice("trails.data", int(toc_t[0]),
                               int(toc_t[1]) - int(toc_t[0]))
        with open(os.path.join(tpath, "trails.codebook"), "rb") as f:
            codebook = f.read()
        with open(os.path.join(tpath, f"lexicon.{FIELDS[0]}"), "rb") as f:
            lex_blob = f.read()
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        w = _BitWriter()
        w.write(0, 3)
        for i, d in enumerate(deltas):
            w.write(0, 1)
            w.write(0, fid_bits)
            w.write(d, DELTA_BITS)                       # ts delta
            for f in range(2):
                w.write(0, 1)
                w.write(f + 1, fid_bits)
                w.write((i * (3 + f) + f) % LEX_N + 1, 8)  # val id != 0
        blob = w.close_trail()
        codebook = b"\x00" * (65536 * 20)
        lex_blob = _render_lexicon(
            [f"v{i:03d}".encode() for i in range(LEX_N)], 1)

    trail_len = len(blob)
    data = np.frombuffer(blob, np.uint8)
    tiled = np.tile(data, num_trails)

    total = trail_len * num_trails + 8
    assert total < 0xFFFFFFFF, "keep the 4-byte TOC regime"
    with open(os.path.join(path, "trails.data"), "wb") as f:
        tiled.tofile(f)
        f.write(b"\x00" * 8)

    toc = (np.arange(num_trails + 1, dtype=np.uint32)
           * np.uint32(trail_len))
    toc.tofile(os.path.join(path, "trails.toc"))

    uu = np.zeros((num_trails, 16), np.uint8)
    uu[:, :8] = np.arange(num_trails, dtype="<u8").view(np.uint8).reshape(
        num_trails, 8)
    uu.tofile(os.path.join(path, "uuids"))

    deltas_sum = sum(deltas)
    max_delta = tmpl_max_delta if compress else ((1 << DELTA_BITS) - 1)
    with open(os.path.join(path, "info"), "w") as f:
        f.write(f"{num_trails} {num_trails * events_per_trail} "
                f"{min_ts} {min_ts + deltas_sum + 1} {max_delta}\n")
    with open(os.path.join(path, "version"), "w") as f:
        f.write("1")
    with open(os.path.join(path, "fields"), "w") as f:
        f.write("".join(n + "\n" for n in FIELDS) + "\n")
    for name in FIELDS:
        with open(os.path.join(path, f"lexicon.{name}"), "wb") as f:
            f.write(lex_blob)
    with open(os.path.join(path, "trails.codebook"), "wb") as f:
        f.write(codebook)
    return trail_len


def worker_peak_rss_mb() -> list[float]:
    """VmHWM (peak RSS) of live pyspark worker processes."""
    out = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as f:
                cmd = f.read()
            if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                continue
            with open(p.replace("cmdline", "status")) as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        out.append(int(line.split()[1]) / 1024.0)
                        break
        except OSError:
            continue
    return sorted(out, reverse=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trails", type=int, default=1_000_000)
    ap.add_argument("--events", type=int, default=210)
    ap.add_argument("--dir", default="/tmp/tdb_scale")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--compress", action="store_true",
                    help="Huffman-compressed template (codebook lane)")
    args = ap.parse_args()

    path = os.path.join(args.dir, "scale.tdb")
    t0 = time.time()
    trail_len = build_synthetic_tdb(path, args.trails, args.events,
                                    compress=args.compress)
    build_s = time.time() - t0
    data_mb = trail_len * args.trails / 1e6
    print(f"built {args.trails} trails x {args.events} events, "
          f"trails.data = {data_mb:.0f} MB in {build_s:.1f}s",
          flush=True)

    # scalar ("before") throughput on a prefix
    meta = TdbMeta(path)
    prefix = max(1, min(2000, args.trails))
    t0 = time.time()
    n_scalar = sum(1 for _ in _iter_events_meta(meta, (0, prefix)))
    scalar_s = time.time() - t0
    scalar_mbs = trail_len * prefix / 1e6 / scalar_s
    print(f"scalar decode: {prefix} trails / {n_scalar} events in "
          f"{scalar_s:.1f}s = {scalar_mbs:.1f} MB/s", flush=True)

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("tdb-scale-import")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    try:
        t0 = time.time()
        n = read_tdb(spark, path).count()
        wall = time.time() - t0
        rss = worker_peak_rss_mb()
        result = {
            "trails": args.trails,
            "events": n,
            "data_mb": round(data_mb, 1),
            "import_wall_s": round(wall, 1),
            "import_mb_s": round(data_mb / wall, 1),
            "scalar_mb_s": round(scalar_mbs, 2),
            "speedup_vs_scalar": round(data_mb / wall / scalar_mbs, 1),
            "worker_peak_rss_mb_top5": [round(x, 1) for x in rss[:5]],
            "n_workers_sampled": len(rss),
        }
        assert n == args.trails * args.events, (n, args.trails * args.events)
        print(json.dumps(result), flush=True)
    finally:
        spark.stop()
        if not args.keep:
            shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
