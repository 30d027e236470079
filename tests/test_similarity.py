"""Similarity operator tests."""

import pytest

from traildb_spark.operators import similarity


def test_kcenter_select_hand_computed(spark):
    """Four points on a line: start at min id (0.0), then farthest-first
    traversal picks the extremes before the middle; ties to min id."""
    rows = [
        (1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [10.0, 0.0]),
        (4, [4.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r.rank, r.vec_id) for r in
           similarity.kcenter_select(df, 4).orderBy("rank").collect()]
    # from 1: farthest is 3 (d=10); then 4 (min(4,6)=4 beats 2's 1);
    # then 2
    assert got == [(1, 1), (2, 3), (3, 4), (4, 2)]
    s = 1 << 20
    out = {r.rank: r.maximin_dist2 for r in
           similarity.kcenter_select(df, 4).collect()}
    assert out[2] == (10 * s) ** 2
    assert out[3] == (4 * s) ** 2
    # k larger than the corpus stops early
    assert similarity.kcenter_select(df, 10, max_k=16).count() == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.kcenter_select(df, 0)
    with _pytest.raises(ValueError):
        similarity.kcenter_select(df, 65)


def test_mmr_select_hand_computed(spark):
    """Pure relevance (lambda=100) ranks by dot; at lambda=50 a
    near-duplicate of the first pick loses to a diverse lower-relevance
    candidate."""
    rows = [
        (0, [1.0, 0.0]),            # query
        (1, [0.9, 0.1]),            # most relevant
        (2, [0.85, 0.1]),           # near-dup of 1, slightly less rel
        (3, [0.6, 0.6]),            # diverse, lower rel
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pure = [(r.rank, r.vec_id) for r in
            similarity.mmr_select(df, 0, k=3, lambda_pct=100)
            .orderBy("rank").collect()]
    assert pure == [(1, 1), (2, 2), (3, 3)]
    mmr = [(r.rank, r.vec_id) for r in
           similarity.mmr_select(df, 0, k=3, lambda_pct=30)
           .orderBy("rank").collect()]
    # round 2 at lambda=30: score(2) = .3·.85 − .7·(.9·.85+.01) ≈ −.29
    # < score(3) = .3·.6 − .7·.6 = −.24 — the near-dup loses to the
    # diverse candidate
    assert mmr == [(1, 1), (2, 3), (3, 2)]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.mmr_select(df, 99, k=2)
    with _pytest.raises(ValueError):
        similarity.mmr_select(df, 0, k=2, lambda_pct=101)


def test_sq8_topk_hand_computed(spark):
    """64-dim corpus dominated by two axes: the int8 candidate scan and
    the exact rerank agree with brute-force cosine order; a constant
    dimension exercises the degenerate-grid (hi == lo) guard."""
    import math

    def vec(a, b):
        v = [0.0] * 64
        v[0], v[1] = a, b
        v[63] = 7.0          # constant dim: hi == lo -> code 0, no NaN
        return v

    rows = [
        (0, vec(1.0, 0.0)),
        (1, vec(0.9, 0.1)),
        (2, vec(0.0, 1.0)),
        (3, vec(0.5, 0.5)),
        (4, vec(-1.0, 0.0)),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.sq8_topk(df, q, k=5, rerank=5).orderBy("rank").collect()
    assert [r.corpus_id for r in out][0] == 0          # self first
    order = [r.corpus_id for r in out]
    # exact cosine order for query (1,0,..,7): self, then 1, 3, 2, 4
    assert order == [0, 1, 3, 2, 4]
    assert all(out[i].cos >= out[i + 1].cos for i in range(len(out) - 1))


def test_compressed_ann_dim_mismatch_fails_loudly(spark):
    """A corpus whose vectors are not `dim` wide must raise, not emit
    null codes (ADVICE r7): sq8_topk checks widths on the calibration
    aggregate; jl_topk folds an assert_true into the projection; and a
    non-default dim= works end-to-end."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # default dim=64 over an 8-wide corpus: loud failure, both paths
    with _pytest.raises(Exception, match="sq8_topk"):
        similarity.sq8_topk(df, q, k=2, rerank=2).collect()
    with _pytest.raises(Exception, match="jl_topk"):
        similarity.jl_topk(df, q, k=2, rerank=2, out_dim=4).collect()
    # matching dim= runs end-to-end and puts the replica first
    out = similarity.sq8_topk(df, q, k=2, rerank=4, dim=8).orderBy(
        "rank").collect()
    assert out[0].corpus_id == 0
    out = similarity.jl_topk(df, q, k=2, rerank=4, out_dim=4, dim=8).orderBy(
        "rank").collect()
    assert out[0].corpus_id == 0
    out = similarity.jl_sq8_topk(
        df, q, k=2, rerank=4, out_dim=4, dim=8).orderBy("rank").collect()
    assert out[0].corpus_id == 0


def test_label_centroid_cosines_hand_computed(spark):
    """Orthogonal label centroids score 0, a 45-degree label scores
    1/sqrt(2); the exact-dot guard raises when quantized sums approach
    the int->double bound."""
    import pytest as _pytest

    def vec(*nz):
        v = [0.0] * 64
        for i, x in nz:
            v[i] = x
        return v

    rows = [
        (0, 0, vec((0, 1.0))),
        (1, 0, vec((0, 1.0))),
        (2, 1, vec((1, 1.0))),
        (3, 2, vec((0, 1.0), (1, 1.0))),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {(r.label_a, r.label_b): r
           for r in similarity.label_centroid_cosines(df).collect()}
    assert out[(0, 1)].centroid_cos == 0.0
    assert out[(0, 2)].centroid_cos == 0.707107
    assert out[(0, 1)].n_a == 2 and out[(0, 1)].n_b == 1

    # 9 unit vectors at q20 push a per-dim sum past 2^23: must refuse
    big = spark.createDataFrame(
        [(i, 0, vec((0, 1.0))) for i in range(9)] + [(99, 1, vec((1, 1.0)))],
        "vec_id long, label int, embedding array<float>",
    )
    with _pytest.raises(Exception, match="label_centroid_cosines"):
        similarity.label_centroid_cosines(big, q_scale_bits=20).collect()


def test_jl_topk_self_at_top(spark):
    """Identical vectors have identical projections, so the reduced-
    space cosine puts a query's exact replica at the top of the
    candidate set; the final order equals exact cosine order."""
    from pyspark.sql import functions as F

    def vec(a, b):
        v = [0.0] * 64
        v[0], v[1] = a, b
        return v

    rows = [
        (0, vec(1.0, 0.0)),
        (1, vec(0.9, 0.1)),
        (2, vec(0.0, 1.0)),
        (3, vec(0.5, 0.5)),
        (4, vec(1.0, 0.0)),   # exact replica of the query
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.jl_topk(df, q, k=5, rerank=5).orderBy("rank").collect()
    # replicas tie at cos 1.0; min-id tiebreak puts 0 before 4
    assert [r.corpus_id for r in out] == [0, 4, 1, 3, 2]
    assert out[0].cos == 1.0 and out[1].cos == 1.0
    assert out[0].approx_cos_micro == out[1].approx_cos_micro


def test_jl_sq8_topk_replica_invariant(spark):
    """Stacked compression keeps exact replicas at the top: identical
    vectors share projections AND codes, so code-space cosine ties them
    at the maximum and the exact rerank confirms cos 1.0."""
    from pyspark.sql import functions as F

    def vec(a, b):
        v = [0.0] * 64
        v[0], v[1] = a, b
        return v

    rows = [(0, vec(1.0, 0.0)), (1, vec(0.9, 0.1)), (2, vec(0.0, 1.0)),
            (3, vec(0.5, 0.5)), (4, vec(1.0, 0.0))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.jl_sq8_topk(df, q, k=5, rerank=5).orderBy("rank").collect()
    assert [r.corpus_id for r in out][:2] == [0, 4]
    assert out[0].cos == 1.0 and out[1].cos == 1.0


def test_sq8_prebuilt_matches_direct_and_scans_code_table_only(
        spark, sf_dir, tmp_path):
    """save_sq8_index / sq8_topk_prebuilt: the persisted artifact's probe
    is BIT-identical to the direct sq8_topk run (codes computed once with
    the same expressions), its candidate stage scans only the 1-byte/dim
    code table (no scan of the source embeddings parquet in the plan),
    and the rerank reaches full/ through a pushed IN-list on the
    range-sorted corpus_id — point reads, not a corpus scan."""
    import re

    from pyspark.sql import functions as F

    from traildb_spark.plans import audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "sq8")
    similarity.save_sq8_index(emb, idx)
    # materialize queries locally so the probe plan contains NO trace of
    # the source parquet — everything big must come from the artifact
    qrows = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding").collect()
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>")

    out = similarity.sq8_topk_prebuilt(spark, idx, queries, k=5, rerank=20)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in
                  similarity.sq8_topk(emb, queries, k=5, rerank=20).collect())
    assert got == want and len(got) == 15

    plan = audit.explain_str(out)
    assert "embeddings.parquet" not in plan           # artifact-only probe
    scans = re.findall(r"Location:.*?\[([^\]]*)\]", plan)
    assert any("/codes" in s for s in scans), plan[:800]
    m = re.search(r"PushedFilters: \[In\(corpus_id", plan)
    assert m, f"no IN-list pushdown into full/:\n{plan[:1200]}"
    assert "WindowGroupLimit" in plan                 # partial top-k


def test_append_sq8_index_parity_and_refusal(spark, sf_dir, tmp_path):
    """append_sq8_index: an in-envelope delta appended onto a frozen
    grid is BIT-identical to a full rebuild on the union (calibration is
    per-dim min/max, so an in-envelope delta leaves the union's grid —
    hence every code — unchanged), probes keep passing the staleness
    guard after the append, and an out-of-envelope delta refuses loudly
    naming the rebuild. Reference analog: tdb_cons_append
    (src/tdb_cons.c:574-657) merges into an existing store instead of
    re-encoding it."""
    import json

    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200)
    # clones of base rows under new ids: inside the envelope by
    # construction, and near-duplicates stress the tie-break ordering
    delta = base.filter(F.col("vec_id") < 40).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000))
    union = base.unionByName(delta)

    idx_app = str(tmp_path / "sq8_app")
    similarity.save_sq8_index(base, idx_app)
    similarity.append_sq8_index(delta, idx_app)
    idx_reb = str(tmp_path / "sq8_reb")
    similarity.save_sq8_index(union, idx_reb)

    # artifact CONTENT parity: same codes, same full-precision lattice
    for sub in ("codes", "full"):
        a = sorted(map(tuple, spark.read.parquet(
            f"{idx_app}/{sub}").collect()))
        b = sorted(map(tuple, spark.read.parquet(
            f"{idx_reb}/{sub}").collect()))
        assert a == b, f"{sub}/ diverged between append and rebuild"
    meta = json.loads(open(f"{idx_app}/{similarity.SQ8_META_FILE}").read())
    assert meta["appends"] == 1

    # probe parity: appended artifact == rebuilt artifact == direct run
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sorted(tuple(r) for r in similarity.sq8_topk_prebuilt(
        spark, idx_app, queries, k=5, rerank=20).collect())
    want = sorted(tuple(r) for r in similarity.sq8_topk(
        union, queries, k=5, rerank=20).collect())
    assert got == want and len(got) == 15

    # out-of-envelope delta: loud refusal (clamping would silently
    # degrade candidates) — this is the recalibration boundary
    wild = delta.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x * F.lit(10.0)).cast(
            dict(delta.dtypes)["embedding"]),
    )
    with pytest.raises(ValueError, match="OUTSIDE"):
        similarity.append_sq8_index(wild, idx_app)
    # the refused append must not have touched the artifact
    assert len(similarity.sq8_topk_prebuilt(
        spark, idx_app, queries, k=5, rerank=20).collect()) == 15


def test_append_jl_sq8_index_parity(spark, sf_dir, tmp_path):
    """append_jl_sq8_index: same frozen-grid parity law, with the
    envelope check in PROJECTED (Rademacher) space — clones of base
    rows project to identical rv, so the union's projected min/max
    equals the base grid and the append is bit-identical to rebuild."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 150)
    delta = base.filter(F.col("vec_id") < 30).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000))
    union = base.unionByName(delta)

    idx = str(tmp_path / "jl_app")
    similarity.save_jl_sq8_index(base, idx, out_dim=16)
    similarity.append_jl_sq8_index(delta, idx)
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sorted(tuple(r) for r in similarity.jl_sq8_topk_prebuilt(
        spark, idx, queries, k=5, rerank=20).collect())
    want = sorted(tuple(r) for r in similarity.jl_sq8_topk(
        union, queries, k=5, rerank=20, out_dim=16).collect())
    assert got == want and len(got) == 15


def test_compact_code_index_parity_and_layout(spark, sf_dir, tmp_path):
    """compact_code_index: after many small appends the artifact
    accumulates files and per-file-only range sorting; compaction is a
    pure re-layout (grid frozen — no recalibration), so the probe must
    be BIT-identical before/after, the file count must collapse, later
    appends must keep working against the new generation dirs, and a
    second compaction must sweep the superseded generation. Stale
    artifacts refuse (compacting unverified bytes would bless them)."""
    import json
    import os

    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200)
    idx = str(tmp_path / "sq8_cmp")
    similarity.save_sq8_index(base, idx)
    for i in range(6):  # many small appends -> file litter
        delta = base.filter(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000 * (i + 1)))
        similarity.append_sq8_index(delta, idx)
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    before = sorted(tuple(r) for r in similarity.sq8_topk_prebuilt(
        spark, idx, queries, k=5, rerank=20).collect())
    files_before = similarity._parquet_file_count(spark, f"{idx}/full")

    removed = similarity.compact_code_index(spark, idx)
    assert removed > 0
    meta = json.loads(open(f"{idx}/{similarity.SQ8_META_FILE}").read())
    assert meta["codes_dir"] == "codes_g1"
    assert meta["compactions"] == 1
    assert not os.path.exists(f"{idx}/codes")  # superseded dirs swept
    assert not os.path.exists(f"{idx}/full")
    files_after = similarity._parquet_file_count(spark, f"{idx}/full_g1")
    assert files_after < files_before
    after = sorted(tuple(r) for r in similarity.sq8_topk_prebuilt(
        spark, idx, queries, k=5, rerank=20).collect())
    assert after == before  # bit-identical probe

    # appends keep working against the compacted generation
    delta = base.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + F.lit(99_000))
    similarity.append_sq8_index(delta, idx)
    assert len(similarity.sq8_topk_prebuilt(
        spark, idx, queries, k=5, rerank=20).collect()) == 15
    # second compaction folds the append in and sweeps generation 1
    assert similarity.compact_code_index(spark, idx) >= 0
    assert not os.path.exists(f"{idx}/codes_g1")
    assert os.path.exists(f"{idx}/codes_g2")

    # stale artifact refuses compaction
    import shutil

    part = next(f for f in os.listdir(f"{idx}/full_g2")
                if f.endswith(".parquet"))
    shutil.copy(f"{idx}/full_g2/{part}", f"{idx}/full_g2/part-x.parquet")
    with pytest.raises(ValueError, match="stale"):
        similarity.compact_code_index(spark, idx)

    # jl_sq8 goes through the same path
    jl = str(tmp_path / "jl_cmp")
    similarity.save_jl_sq8_index(base, jl, out_dim=16)
    similarity.append_jl_sq8_index(
        base.filter(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000)), jl)
    jb = sorted(tuple(r) for r in similarity.jl_sq8_topk_prebuilt(
        spark, jl, queries, k=5, rerank=20).collect())
    similarity.compact_code_index(spark, jl)
    ja = sorted(tuple(r) for r in similarity.jl_sq8_topk_prebuilt(
        spark, jl, queries, k=5, rerank=20).collect())
    assert ja == jb


def test_sq8_prebuilt_probe_releases_its_cache(spark, sf_dir, tmp_path):
    """_code_table_probe persists its candidate stage for the ids-collect
    + rerank join; that cache must be released when the caller drops the
    result — one pinned cache per probe for the session's life is a
    storage leak on any long-lived serving session."""
    import gc

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    idx = str(tmp_path / "sq8_leak")
    similarity.save_sq8_index(emb, idx)
    queries = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")

    gc.collect()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = similarity.sq8_topk_prebuilt(spark, idx, queries, k=3, rerank=5)
    assert len(out.collect()) == 3
    during = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert during > before  # the probe did cache its candidates
    del out
    gc.collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"probe cache leaked: {before} persistent RDDs before, "
        f"{after} after the result was dropped")


def test_sq8_prebuilt_refuses_stale_or_missing_sidecar(
        spark, sf_dir, tmp_path):
    """Same consistency contract as the IVF artifact (reference
    tdbcli/tdb_index.c:439-451): rewritten codes/ -> hard refusal;
    missing sidecar -> FileNotFoundError naming the fix."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    idx = str(tmp_path / "sq8_stale")
    similarity.save_sq8_index(emb, idx)
    queries = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")

    # rewrite codes/ after the sidecar: fingerprints no longer match
    spark.read.parquet(f"{idx}/codes").limit(50).write.mode(
        "overwrite").parquet(f"{idx}/codes")
    with pytest.raises(ValueError, match="stale"):
        similarity.sq8_topk_prebuilt(spark, idx, queries).collect()

    with pytest.raises(FileNotFoundError, match="save_sq8_index"):
        similarity.sq8_topk_prebuilt(
            spark, str(tmp_path / "nowhere"), queries)


def test_jl_sq8_prebuilt_matches_direct(spark, sf_dir, tmp_path):
    """save_jl_sq8_index / jl_sq8_topk_prebuilt: the persisted 16-byte
    stacked-code probe is BIT-identical to the direct jl_sq8_topk run;
    a kind mismatch (probing a jl_sq8 artifact as sq8 or vice versa)
    refuses loudly instead of silently scoring the wrong code space."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "jlsq8")
    similarity.save_jl_sq8_index(emb, idx, out_dim=16)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")

    got = sorted(tuple(r) for r in similarity.jl_sq8_topk_prebuilt(
        spark, idx, queries, k=5, rerank=20).collect())
    want = sorted(tuple(r) for r in similarity.jl_sq8_topk(
        emb, queries, k=5, rerank=20, out_dim=16).collect())
    assert got == want and len(got) == 15

    # 16 bytes per vector on disk (codes column, before parquet framing)
    row = spark.read.parquet(f"{idx}/codes").first()
    assert len(row["code"]) == 16

    with pytest.raises(ValueError, match="kind"):
        similarity.sq8_topk_prebuilt(spark, idx, queries).collect()
    idx2 = str(tmp_path / "plainsq8")
    similarity.save_sq8_index(emb.limit(50), idx2)
    with pytest.raises(ValueError, match="kind"):
        similarity.jl_sq8_topk_prebuilt(spark, idx2, queries).collect()
