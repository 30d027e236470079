"""Build a 10× synthetic of sf0.1 (≈ sf1.0) for the bench scaling sweep.

Replicates every fact table REPS times with consistent key shifts so all
joins keep their semantics (replica i adds i×(max_key+1) to each foreign/
primary key family); region/nation are dimensions and stay as-is.
Documents get a per-replica suffix token so replicas are NEAR duplicates,
not exact ones (dedup families must scale on realistic dup structure, not
degenerate identical-text groups); embeddings keep their vectors under
shifted ids. Output: /tmp/sf1.0-synth/*.parquet — point
SPARK_GRAFT_SF_DIR at it and run bench.py.

Usage: python tools/make_sf_big.py [reps]   (default 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from traildb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1.0-synth"


def replicate(spark, table: str, reps: int, shifts: dict[str, int],
              text_suffix: bool = False):
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    parts = []
    for i in range(reps):
        r = df
        for col, base in shifts.items():
            r = r.withColumn(col, F.col(col) + F.lit(i * base))
        if text_suffix and i > 0:
            r = r.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" rep{i}"))
            ).withColumn("n_chars", F.col("n_chars") + F.lit(5 + len(str(i))))
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
    print(f"{table}: {reps}x written", flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("make-sf-big", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def mx(table, col):
        return (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .agg(F.max(col)).collect()[0][0]
            + 1
        )

    C = mx("customer", "c_custkey")
    S = mx("supplier", "s_suppkey")
    P = mx("part", "p_partkey")
    O = mx("orders", "o_orderkey")
    E = mx("events", "event_id")
    U = mx("events", "user_id")
    D = mx("documents", "doc_id")
    V = mx("embeddings", "vec_id")

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    replicate(spark, "customer", reps, {"c_custkey": C})
    replicate(spark, "supplier", reps, {"s_suppkey": S})
    replicate(spark, "part", reps, {"p_partkey": P})
    replicate(spark, "orders", reps, {"o_orderkey": O, "o_custkey": C})
    replicate(
        spark, "lineitem", reps,
        {"l_orderkey": O, "l_partkey": P, "l_suppkey": S},
    )
    replicate(spark, "events", reps, {"event_id": E, "user_id": U})
    replicate(spark, "documents", reps, {"doc_id": D}, text_suffix=True)
    replicate(spark, "embeddings", reps, {"vec_id": V})
    spark.stop()


if __name__ == "__main__":
    main()
