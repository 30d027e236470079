"""Optimization-round measurement harness (guide §1): per-query noop-sink
timings + .explain("formatted") capture.

Usage:
  python tools/opt_measure.py [--sf DIR] [--out plans/r10] [--tag before] \
      [--runs 2] [q261 q264 ...]

For each named query (prefix match on the registry name): build the
DataFrame, write .explain("formatted") to <out>/<name>_<tag>.txt, then time
``df.write.format("noop")`` ``runs`` times (cache cleared between runs) and
print the min.  Unlike bench.py (whose df.count() contract the driver
compares across rounds) the noop sink computes every column, so these
numbers isolate the computation being optimized; they are analysis
artifacts, not the graded bench.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from traildb_spark.session import get_spark

    spark = get_spark("opt-measure", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    if args.names:
        pfx = tuple(args.names)
        qs = {n: f for n, f in qs.items() if n.startswith(pfx)}
    outdir = REPO / args.out
    outdir.mkdir(parents=True, exist_ok=True)

    # same warm protocol as bench.py: JVM, python workers, BLAS pools
    entrymod.queries()["q04_info"](spark, args.sf).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm_gemm(s: pd.Series) -> pd.Series:
        import numpy as _np
        a = _np.ones((512, 512))
        return pd.Series([int((a @ a)[0, 0])] * len(s))

    ncpu = int(args.cpus)
    spark.range(0, ncpu * 4, 1, ncpu).select(
        _warm_gemm("id").alias("v")).agg(F.max("v")).collect()

    results = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"opt:{name}")
        best = None
        for r in range(args.runs):
            spark.catalog.clearCache()  # cold-data, warm-JVM per run
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        # plan captured BEFORE the trailing clearCache so persist
        # (InMemoryRelation) boundaries — load-bearing for the LSH
        # family — print as the timed run executed them
        if not args.no_plan:
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            (outdir / f"{name}_{args.tag}.txt").write_text(plan)
        results[name] = round(best, 3)
        print(f"{name}: {results[name]}s (min of {args.runs})",
              file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "tag": args.tag, "noop_seconds": results}))


if __name__ == "__main__":
    main()
