"""Full-registry plan audit for the optimization round: for every
queries() entry, capture explain("simple"), and summarize structural
signals — parquet scan count per table, shuffle count, python-eval nodes,
row-at-a-time BatchEvalPython, InMemoryRelation boundaries — into one
JSON report. Read-only for lazy queries; eager queries (prebuilt-artifact
family) execute their build step once.

Usage: python tools/plan_audit_all.py [--sf DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import Counter
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r10/PLAN_AUDIT.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from traildb_spark.plans.audit import explain_str
    from traildb_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    if args.names:
        qs = {n: f for n, f in qs.items() if n.startswith(tuple(args.names))}
    report = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, args.sf)
            plan = explain_str(df, "simple")
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            report[name] = {"error": str(e)[:200]}
            continue
        scans = Counter(
            m.group(1) for m in re.finditer(
                r"FileScan parquet.*?([a-z_0-9]+\.parquet)", plan)
        )
        report[name] = {
            "shuffles": len(re.findall(
                r"Exchange (?:hash|range|Single|RoundRobin)", plan)),
            "scans": dict(scans),
            "python_nodes": len(re.findall(
                r"ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas"
                r"|MapInPandas", plan)),
            "batch_eval_python": len(re.findall(r"BatchEvalPython", plan)),
            "in_memory": len(re.findall(r"InMemoryRelation", plan)),
            "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
        }
        spark.catalog.clearCache()
        print(f"# {name}: {report[name]}", file=sys.stderr)
    out = REPO / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1, sort_keys=True))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
