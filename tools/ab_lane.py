"""Interleaved A/B arm: measure named registry queries from ONE repo arm
in a fresh process, bracketed by the python-lane canary from bench.py.

Usage: python tools/ab_lane.py --repo /root/repo q263 q264 q116
(interleave arms across two checkouts of different commits; pair the
invocations back-to-back in A-B/B-A alternation and compare paired
ratios — sequential sweeps are inadmissible on this host)
Prints one JSON line: {"repo":..., "canary_py_open":..., "queries": {...},
"canary_py_close":...}.  Timed action = .count() min-of-2 with
clearCache between runs — the same contract as bench.py, since the
numbers under dispute are bench numbers.
"""
import argparse
import json
import os
import sys
import time

import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    os.chdir(args.repo)
    import __spark_entry__ as entrymod
    from traildb_spark.session import get_spark

    assert entrymod.__file__.startswith(args.repo), entrymod.__file__
    spark = get_spark("ab-lane", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    pfx = tuple(args.names)
    sel = {n: f for n, f in qs.items() if n.startswith(pfx)}
    assert len(sel) == len(args.names), sorted(sel)

    # warm protocol from bench.py: JVM+scan, python workers, BLAS pools
    qs["q04_info"](spark, args.sf).collect()

    @F.pandas_udf("long")
    def _warm_gemm(s: pd.Series) -> pd.Series:
        import numpy as _np
        a = _np.ones((512, 512))
        return pd.Series([int((a @ a)[0, 0])] * len(s))

    ncpu = int(args.cpus)
    spark.range(0, ncpu * 4, 1, ncpu).select(
        _warm_gemm("id").alias("v")).agg(F.max("v")).collect()

    @F.pandas_udf("long")
    def _canary_py(s: pd.Series) -> pd.Series:
        import hashlib as _hl
        import numpy as _np
        a = _np.ones((512, 512))
        acc = 0
        for _ in range(3):
            acc += int((a @ a)[0, 0])
        h = _hl.md5(b"x" * (2 << 20)).hexdigest()
        acc += int(h[:8], 16) + int(_np.sort(
            _np.arange(1 << 20)[::-1]).sum())
        return pd.Series([acc] * len(s))

    def canary_py() -> float:
        best = None
        for _ in range(3):
            t0 = time.time()
            spark.range(0, ncpu, 1, ncpu).select(
                _canary_py("id").alias("v")).agg(F.max("v")).collect()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        return best

    out = {"repo": args.repo, "canary_py_open": canary_py(), "queries": {}}
    for name, fn in sel.items():
        spark.sparkContext.setJobDescription(f"ab:{name}")
        best = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, args.sf).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out["queries"][name] = round(best, 3)
        spark.catalog.clearCache()
    out["canary_py_close"] = canary_py()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
