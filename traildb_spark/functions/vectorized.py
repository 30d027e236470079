"""Arrow-vectorized numpy kernels for the hot paths.

Catalyst higher-order functions (transform/aggregate) are evaluated
per-element in interpreted mode — fine for filters, too slow for dense
linear algebra and 64-way hash signatures. These kernels keep the
JVM-side plan for everything relational (joins, dedup, shuffles) and drop
to Arrow-batched numpy only for the inner numeric loop, which is the
pattern that survives 100 TB: work stays distributed, each task does one
BLAS/bit-ops call per batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# Mersenne-prime affine permutation family for MinHash: h_j(x) = (a_j*x+b_j) mod p
_MERSENNE = (1 << 61) - 1

import re as _re

_WS = _re.compile(r"\s+")


def _pynorm(t: str) -> str:
    # mirrors operators.dedup.normalize_text (lower, collapse ws, trim)
    return _WS.sub(" ", t.lower()).strip()


def char_shingle_hashes_udf(text: Column, k: int = 5) -> Column:
    """text → sorted distinct uint64 hashes of char k-shingles, one numpy
    rolling-polynomial pass per doc (wraparound mod 2^64). Catalyst's
    transform(sequence, substr∘xxhash64) computes the same set but
    interpreted per element — measured ~350µs/shingle vs ~0.1µs here.

    Windows are over UNICODE CODE POINTS (utf-32 decode gives one uint32
    per character), matching SQL substr(nt, i, k) semantics — so the
    shingle SET is isomorphic to md5_shingle_hashes' and to a SQL-side
    substr formulation on any text, not just ASCII."""

    @F.pandas_udf(ArrayType(LongType()))
    def sh(col: pd.Series) -> pd.Series:
        P = np.uint64(1099511628211)  # FNV prime
        powers = P ** np.arange(k, dtype=np.uint64)[::-1]
        out = []
        for t in col:
            t = _pynorm(t or "")
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            if len(c) <= k:
                h = (c * powers[-len(c):]).sum() if len(c) else np.uint64(0)
                out.append(np.array([h], dtype=np.uint64).astype(np.int64))
                continue
            # rolling window product-sum via strided windows (vectorized)
            n = len(c) - k + 1
            win = np.lib.stride_tricks.sliding_window_view(c, k)
            h = (win * powers[None, :]).sum(axis=1)
            out.append(np.unique(h).astype(np.int64))
        return pd.Series(out)

    return sh(text)


def word_ngram_hashes_udf(text: Column, n: int = 3) -> Column:
    """text → sorted distinct uint64 hashes of word n-grams: blake2b word
    hashes combined by XOR-rotation (position-sensitive), numpy-vectorized
    over gram positions. Set-equivalent to string n-grams (2^-64
    collisions), so Jaccard values match the string formulation."""
    import hashlib

    @F.pandas_udf(ArrayType(LongType()))
    def gh(col: pd.Series) -> pd.Series:
        out = []
        for t in col:
            words = [w for w in _pynorm(t or "").split(" ") if w]
            if not words:
                out.append(np.empty(0, dtype=np.int64))
                continue
            wh = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little"
                    )
                    for w in words
                ],
                dtype=np.uint64,
            )
            if len(wh) < n:
                whole = hashlib.blake2b(" ".join(words).encode("utf-8"), digest_size=8)
                g = np.array([int.from_bytes(whole.digest(), "little")], dtype=np.uint64)
            else:
                g = wh[: len(wh) - n + 1].copy()
                for j in range(1, n):
                    r = np.uint64(7 * j + 1)
                    x = wh[j : len(wh) - n + 1 + j]
                    g ^= (x << r) | (x >> (np.uint64(64) - r))
            out.append(np.unique(g).astype(np.int64))
        return pd.Series(out)

    return gh(text)


def _perm_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # deterministic family
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64) | 1
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(hash_arrays: Column, num_hashes: int = 64) -> Column:
    """array<long> of element hashes → array<long> MinHash signature.

    One xxhash64 per shingle happens JVM-side; the 64 permutations are a
    single numpy broadcast per Arrow batch here.
    """
    a, b = _perm_params(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(col: pd.Series) -> pd.Series:
        out = []
        for hs in col:
            if hs is None or len(hs) == 0:
                out.append(np.zeros(num_hashes, dtype=np.int64))
                continue
            h = np.asarray(hs, dtype=np.uint64).astype(np.int64)
            # (num_hashes, n) affine transform mod Mersenne prime
            m = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(m.min(axis=1))
        return pd.Series(out)

    return sig(hash_arrays)


def simhash_from_hashes(hash_arrays: Column) -> Column:
    """array<long> token hashes → 64-bit SimHash (per-bit majority vote),
    numpy bit-unpack per Arrow batch."""

    @F.pandas_udf(LongType())
    def sh(col: pd.Series) -> pd.Series:
        out = np.zeros(len(col), dtype=np.int64)
        for i, hs in enumerate(col):
            if hs is None or len(hs) == 0:
                continue
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int32
            )
            votes = (2 * bits - 1).sum(axis=0)
            word = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                word |= np.uint64(1) << np.uint64(bpos)
            out[i] = word.astype(np.int64)
        return pd.Series(out)

    return sh(hash_arrays)


_PLANES: dict = {}


def _planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane matrix — same on driver and every executor
    (seeded RandomState, cached per (dim, planes, seed))."""
    key = (dim, num_planes, seed)
    if key not in _PLANES:
        _PLANES[key] = np.random.RandomState(seed).standard_normal((dim, num_planes))
    return _PLANES[key]


def srp_code(vec: Column, num_planes: int = 16, seed: int = 1234) -> Column:
    """Sign-random-projection code: array<float> → int64 bit code via one
    GEMM per Arrow batch. The shared kernel for LSH bucketing of embeddings
    (dedup.embedding_neardup_pairs, similarity.lsh_topk)."""

    @F.pandas_udf(LongType())
    def code_udf(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy()).astype(np.float64)
        bits = (mat @ _planes(mat.shape[1], num_planes, seed)) >= 0
        code = np.zeros(len(col), dtype=np.int64)
        for p in range(num_planes):
            code |= bits[:, p].astype(np.int64) << p
        return pd.Series(code)

    return code_udf(vec)


def cosine_udf(a: Column, b: Column, round_digits: int = 6) -> Column:
    """Row-wise cosine of two array<float> columns, one einsum per Arrow
    batch — replaces the interpreted Catalyst aggregate/zip_with fold
    (measured ~40× on 64-dim vectors)."""

    @F.pandas_udf("double")
    def cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        A = np.vstack(xs.to_numpy()).astype(np.float64)
        B = np.vstack(ys.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(np.round(num / np.where(den == 0, 1, den), round_digits))

    return cos(a, b)


def pairwise_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    round_digits: int = 6,
    max_broadcast_rows: int = 500_000,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via one distributed scan against
    a broadcast corpus matrix (numpy GEMM per Arrow batch).

    O(n²) compute but O(n) shuffle: each partition multiplies its batch
    against the broadcast matrix and emits only surviving pairs. The
    broadcast bounds n to ~1e6 rows; beyond that use the LSH variant
    (operators.dedup.embedding_neardup_pairs) — this guard enforces it.
    """
    spark = df.sparkSession
    n = df.count()
    if n > max_broadcast_rows:
        raise ValueError(
            f"pairwise_cosine_pairs is the exact/batch path (n={n} > "
            f"{max_broadcast_rows}); use embedding_neardup_pairs (LSH) at scale"
        )
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        M, I = b_mat.value, b_ids.value
        for pdfb in batches:
            if len(pdfb) == 0:
                continue
            q = np.vstack(pdfb[vec_col].to_numpy()).astype(np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdfb[id_col].to_numpy()
            cos = np.round(q @ M.T, round_digits)
            bi, bj = np.nonzero(cos >= threshold)
            ia, ib = qids[bi], I[bj]
            keep = ia < ib
            yield pd.DataFrame(
                {"id_a": ia[keep], "id_b": ib[keep], "cos": cos[bi, bj][keep]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, schema="id_a long, id_b long, cos double"
    )


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query matrix, GEMM each corpus
    batch against it, emit per-partition candidates, global rank via a
    window over |Q|·partitions·k rows only."""
    from pyspark.sql import Window

    spark = corpus.sparkSession
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.vstack(qpdf[vec_col].to_numpy()).astype(np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq_ids = spark.sparkContext.broadcast(qids)
    bq_mat = spark.sparkContext.broadcast(qmat)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Q, QI = bq_mat.value, bq_ids.value
        for pdfb in batches:
            if len(pdfb) == 0:
                continue
            c = np.vstack(pdfb[vec_col].to_numpy()).astype(np.float64)
            c = c / np.linalg.norm(c, axis=1, keepdims=True)
            cids = pdfb[id_col].to_numpy()
            cos = np.round(c @ Q.T, round_digits)  # (batch, nq)
            # partial top-k per query within the batch
            kk = min(k, cos.shape[0])
            idx = np.argpartition(-cos, kk - 1, axis=0)[:kk]
            rows = {
                "query_id": np.repeat(QI, kk),
                "corpus_id": cids[idx].T.ravel(),
                "cos": np.take_along_axis(cos, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        run, schema="query_id long, corpus_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos", "rank")
    )
