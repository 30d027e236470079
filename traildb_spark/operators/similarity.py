"""Approximate-nearest-neighbor search over embedding columns.

North-star operator set (BASELINE.json): brute-force cosine top-k as the
exact baseline, plus two scale paths — sign-LSH bucketing and IVF (inverted
file with k-means-style centroids) — all pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectorized import cosine_udf, srp_code
from .dedup import cosine, _dot, _norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Broadcast the (small) query set against the corpus — one scan of the
    corpus, no corpus shuffle; per-partition partial top-k via window rank
    after a groupBy would shuffle k*|Q| rows only. This is the pattern that
    survives 100 TB: the corpus is never re-partitioned, and the ranked
    shuffle carries |Q| * corpus_partitions * k candidate rows, not the
    corpus. Scoring is one Arrow-batched einsum (cosine_udf), not the
    interpreted Catalyst fold.
    """
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cos", cosine_udf(F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    num_planes: int = 12,
    max_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: restrict scoring to corpus vectors whose
    sign-projection code is within ``max_hamming`` bits of the query's code,
    then exact-rank the candidates. Probe expansion (hamming ball) keeps
    recall high; candidates shrink the scan by ~2^planes/volume(ball).
    Codes come from the shared GEMM kernel (one matmul per Arrow batch).
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        srp_code(F.col(vec_col), num_planes).alias("ccode"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        srp_code(F.col(vec_col), num_planes).alias("qcode"),
    )
    joined = c.join(F.broadcast(q)).filter(
        F.bit_count(F.col("ccode").bitwiseXOR(F.col("qcode"))) <= max_hamming
    )
    scored = joined.withColumn("cos", cosine_udf(F.col("cv"), F.col("qv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos", "rank")
    )


def ivf_build(
    corpus: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """IVF index: Lloyd-iterate centroids (seeded deterministically from a
    hash-sample of the corpus), assign each vector to its nearest centroid.

    Returns (assignments, centroids). The k-means loop is ``iters`` joint
    scans — each iteration is broadcast-join + groupBy(avg), no corpus
    shuffle beyond the final assignment write. Centroid count stays small
    (thousands at 100 TB) so the broadcast is cheap.
    """
    v = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).cache()
    # deterministic seed: the num_centroids rows with smallest hash(id)
    seeds = (
        v.withColumn("hk", F.hash(F.col("corpus_id")))
        .orderBy("hk")
        .limit(num_centroids)
        .select(F.col("hk"), F.col("cv").alias("centroid"))
    )
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("hk")) - 1).alias("cid"), "centroid"
    )
    for _ in range(iters):
        assigned = _assign(v, cents)
        cents = (
            assigned.groupBy("cid")
            .agg(F.collect_list("cv").alias("vs"))
            .select(
                "cid",
                F.transform(
                    F.sequence(F.lit(0), F.size(F.element_at("vs", 1)) - 1),
                    lambda i: F.aggregate(
                        "vs", F.lit(0.0), lambda acc, x: acc + F.element_at(x, i + F.lit(1))
                    )
                    / F.size("vs"),
                ).alias("centroid"),
            )
        )
    assignments = _assign(v, cents).select("corpus_id", "cid")
    v.unpersist()
    return assignments, cents


def _assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    scored = v.join(F.broadcast(cents)).withColumn(
        "cos", cosine_udf(F.col("cv"), F.col("centroid"), round_digits=12)
    )
    w = Window.partitionBy("corpus_id").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
        .select("corpus_id", "cv", "cid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k via IVF: score only vectors in the query's ``nprobe``
    nearest centroid cells. At scale the assignments table is written
    partitioned by cid, so a probe reads nprobe/num_centroids of the data.
    """
    assignments, cents = ivf_build(corpus, num_centroids, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).join(assignments, "corpus_id")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    qc = q.join(F.broadcast(cents)).withColumn(
        "cos_c", cosine_udf(F.col("qv"), F.col("centroid"), round_digits=12)
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = c.join(F.broadcast(probes), "cid").withColumn(
        "cos", cosine_udf(F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos", "rank")
    )
