"""Curation operator tests: splits, decontamination, quotas."""

import pytest
from pyspark.sql import functions as F

from traildb_spark.operators import curation


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in curation.hash_split(docs, w).collect()}
    b = {r["doc_id"]: r["split"] for r in curation.hash_split(docs, w).collect()}
    assert a == b  # rerun-stable, no seed
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.6 <= frac_train <= 0.95  # 500 ids: loose proportion check
    # different salt => different (but still deterministic) assignment
    c = {r["doc_id"]: r["split"] for r in curation.hash_split(docs, w, salt="v2").collect()}
    assert c != a


def test_hash_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        curation.hash_split(df, {"train": 0.5, "val": 0.1})


def test_decontaminate(spark):
    bench_sentence = "the capital of france is paris and it has many museums to visit"
    rows = [
        (1, f"some long prefix text here {bench_sentence} and a long suffix follows"),
        (2, "totally unrelated document about spark shuffle partitions and parquet files ok"),
        (3, "short exact dup"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, bench_sentence), (101, "short exact dup")], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in curation.decontaminate(docs, bench, n=13).collect())
    # doc 1 contains a benchmark 13-gram; doc 3 (< 13 words) matches whole-doc gram
    assert kept == [2]


def test_per_source_quota(spark):
    rows = [(i, f"src{i % 2}", 100 + i) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = curation.per_source_quota(
        df, "source", 2, order_by=[F.col("n_chars").desc()]
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # largest two per source
    assert sorted(by_src["src0"]) == [6, 8]
    assert sorted(by_src["src1"]) == [7, 9]


def test_pack_sequences_two_phase_prefix(spark):
    # 10 docs of 100 tokens each, budget 256: offsets 0,100,...,900;
    # shard_size=3 forces the multi-shard prefix path
    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: (r["token_offset"], r["seq_start"], r["seq_end"])
        for r in curation.pack_sequences(df, budget=256, shard_size=3).collect()
    }
    assert len(got) == 10
    for i in range(10):
        off = i * 100
        assert got[i] == (off, off // 256, (off + 99) // 256)
    # doc 2 (offset 200) crosses the 256 boundary -> spans seqs 0..1
    assert got[2] == (200, 0, 1)


def test_pack_sequences_zero_token_doc(spark):
    # a zero-token doc occupies no space but still gets a (degenerate)
    # sequence assignment at its offset
    df = spark.createDataFrame([(1, 5), (2, 0), (3, 7)], ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: (r["token_offset"], r["seq_start"], r["seq_end"])
        for r in curation.pack_sequences(df, budget=8, shard_size=2).collect()
    }
    assert got[1] == (0, 0, 0)
    assert got[2] == (5, 0, 0)
    assert got[3] == (5, 0, 1)


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # all-of-a, none-of-b: thresholds act per stratum
    kept = curation.stratified_sample(
        df, rates={"a": 1.0, "b": 0.0}, stratum_col="source"
    ).collect()
    assert {r["source"] for r in kept} == {"a"}
    assert len(kept) == 100
    # unlisted strata use default_rate
    none_kept = curation.stratified_sample(df, rates={}, default_rate=0.0).count()
    assert none_kept == 0
    # deterministic across calls, and a subset relation: rate 0.2 ⊆ rate 0.5
    s2 = {r["doc_id"] for r in curation.stratified_sample(df, {"a": 0.2}).collect()}
    s5 = {r["doc_id"] for r in curation.stratified_sample(df, {"a": 0.5}).collect()}
    assert s2 <= s5
    assert s2 == {r["doc_id"] for r in curation.stratified_sample(df, {"a": 0.2}).collect()}


def test_mix_corpus_budget_and_nesting(spark):
    rows = [(i, "a" if i < 100 else "b", 10) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    # each source holds 1000 tokens; budget 500 at 50/50 → rate 0.25 each
    out = curation.mix_corpus(df, {"a": 0.5, "b": 0.5}, budget_tokens=500)
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    # md5 buckets ≈ uniform: expect ~25 docs per source (loose bounds)
    assert set(by_src) == {"a", "b"} and all(10 <= v <= 40 for v in by_src.values())
    # rate >= 1 keeps everything; unlisted strata are dropped
    all_a = curation.mix_corpus(df, {"a": 1.0}, budget_tokens=10_000)
    assert all_a.count() == 100 and all_a.filter("source = 'b'").count() == 0
    # nested samples: a bigger budget strictly grows each stratum's sample
    small = {r["doc_id"] for r in curation.mix_corpus(df, {"a": 1.0}, 200).collect()}
    large = {r["doc_id"] for r in curation.mix_corpus(df, {"a": 1.0}, 600).collect()}
    assert small <= large


def test_per_source_quota_salted_matches_plain_window(spark):
    """The salted two-phase plan must equal the naive global window on a
    whale-skewed input (one source holds 90% of rows)."""
    from pyspark.sql import Window

    from traildb_spark.operators.curation import per_source_quota

    rows = [(i, "whale" if i < 900 else f"s{i % 7}", float(i % 37)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    order = [F.col("score").desc()]
    got = {
        (r["doc_id"], r["source"])
        for r in per_source_quota(
            df, quota=13, order_by=order, salt_buckets=8
        ).collect()
    }
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    naive = {
        (r["doc_id"], r["source"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 13)
        .collect()
    }
    assert got == naive and len(got) > 13


def test_decontaminate_semantic_modes_agree(spark, sf_dir):
    """Benchmark members drop (self-cosine 1), survivors are identical
    between the oracle-twin pairs mode and the broadcast-GEMM kernel, and
    an empty benchmark is a no-op."""
    from pyspark.sql import functions as F

    from traildb_spark.operators import curation

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") % 25 == 0)
    pairs = {r["vec_id"] for r in
             curation.decontaminate_semantic(emb, bench, threshold=0.5).collect()}
    gemm = {r["vec_id"] for r in
            curation.decontaminate_semantic(emb, bench, threshold=0.5, mode="gemm").collect()}
    assert pairs == gemm
    n = emb.count()
    assert 0 < len(pairs) < n  # bench members (at least) dropped
    assert not any(v % 25 == 0 for v in pairs)
    empty = curation.decontaminate_semantic(emb, bench.filter(F.lit(False)), mode="gemm")
    assert empty.count() == n


def test_chunk_documents_windows_and_overlap(spark):
    from traildb_spark.operators.curation import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, words), (1, "a b"), (2, "")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3 over 10 words -> starts 0,3,6,9; last chunk is a partial
    assert got[(0, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(0, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(0, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(0, 3)] == ("w9", 1)
    assert got[(1, 0)] == ("a b", 2)
    # empty doc emits nothing
    assert not any(k[0] == 2 for k in got)
    # consecutive chunks overlap by exactly `overlap` tokens
    assert got[(0, 0)][0].split()[-1] == got[(0, 1)][0].split()[0]

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_uniform_sample_exact_k_and_stability(spark):
    from traildb_spark.operators import curation

    df = spark.createDataFrame([(i, f"s{i%3}") for i in range(500)], ["doc_id", "source"])
    a = curation.uniform_sample_exact(df, 40, seed="x:")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert len(ids_a) == 40
    # stable under repartitioning
    b = curation.uniform_sample_exact(df.repartition(13), 40, seed="x:")
    assert sorted(r["doc_id"] for r in b.collect()) == ids_a
    # different seed → (almost surely) different set
    c = curation.uniform_sample_exact(df, 40, seed="y:")
    assert sorted(r["doc_id"] for r in c.collect()) != ids_a


def test_rank_buckets_ties_one_bucket(spark):
    from traildb_spark.operators import curation

    # values: 1×4, 2×4, 3×2 → N=10; rank_before: 1→0, 2→4, 3→8
    rows = [(i, v) for i, v in enumerate([1] * 4 + [2] * 4 + [3] * 2)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        r["id"]: r["bucket"]
        for r in curation.rank_buckets(df, "v", n_buckets=5).collect()
    }
    # floor(5*0/10)=0, floor(5*4/10)=2, floor(5*8/10)=4
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(4, 8)} == {2}
    assert {got[i] for i in range(8, 10)} == {4}


def test_rank_buckets_null_values_excluded(spark):
    from traildb_spark.operators import curation

    rows = [(i, None if i < 3 else (i % 2)) for i in range(13)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["bucket"] for r in curation.rank_buckets(df, "v", 2).collect()}
    # 3 nulls → bucket NULL; 5×0 → bucket 0; 5×1 → floor(2*5/10)=1
    assert all(got[i] is None for i in range(3))
    reals = {got[i] for i in range(3, 13)}
    assert reals == {0, 1}


def test_pack_sequences_empty_input(spark):
    from traildb_spark.operators import curation

    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert curation.pack_sequences(df, budget=128).count() == 0


def test_temperature_allocations_properties():
    """Apportionment invariants across α: exact total (min(total, N)),
    never past a source's cap, α=1 ≈ proportional, α=0 ≈ uniform,
    0<α<1 strictly between (tail upsampled vs proportional), capped
    excess redistributed, deterministic tie-breaks."""
    from traildb_spark.operators.curation import temperature_allocations

    counts = {"web": 10_000, "books": 400, "code": 100, "tiny": 3}
    for alpha in (0.0, 0.3, 0.5, 0.7, 1.0):
        a = temperature_allocations(counts, 500, alpha)
        assert sum(a.values()) == 500, alpha
        assert all(a[s] <= counts[s] for s in counts), alpha
    prop = temperature_allocations(counts, 500, 1.0)
    half = temperature_allocations(counts, 500, 0.5)
    # α=1 ~ proportional: web gets ~476; α=0.5 upsamples the tail
    assert prop["web"] > 450 and half["web"] < prop["web"]
    assert half["books"] > prop["books"] and half["code"] > prop["code"]
    # α=0: uniform over sources; 'tiny' (3) AND 'code' (100) cap, and
    # their excess redistributes evenly over the uncapped pair
    uni = temperature_allocations(counts, 400, 0.0)
    assert uni["tiny"] == 3 and uni["code"] == 100
    assert sum(uni.values()) == 400
    assert abs(uni["web"] - uni["books"]) <= 1
    # total beyond the corpus: everything allocated, nothing more
    full = temperature_allocations(counts, 10**9, 0.5)
    assert full == counts
    # empty / zero-total edge
    assert temperature_allocations({}, 10, 0.5) == {}
    assert temperature_allocations(counts, 0, 0.5) == {s: 0 for s in counts}

    # generic-α robustness: log-space weights survive counts that would
    # overflow a direct n**alpha float (10^200 squared >> float max) —
    # ratios still honor α (bigger source dominates harder at α=2)
    huge = {"a": 10**200, "b": 10**199}
    big = temperature_allocations(huge, 1000, 2.0)
    assert sum(big.values()) == 1000 and big["a"] > big["b"]
    # invalid α values fail fast, not mid-apportionment
    import math as _math

    import pytest as _pytest

    for bad in (-0.5, float("nan"), float("inf")):
        with _pytest.raises(ValueError, match="alpha"):
            temperature_allocations(counts, 100, bad)
    assert not any(
        _math.isnan(v) for v in temperature_allocations(counts, 100, 3.0).values()
    )


def test_temperature_mix_exact_and_stable(spark):
    """temperature_mix returns EXACTLY the allocated rows, stable under
    repartitioning (md5 rank is a pure function of id), and respects
    caps on starved sources."""
    from pyspark.sql import functions as F

    from traildb_spark.operators.curation import (
        temperature_allocations,
        temperature_mix,
    )

    rows = [(i, "web" if i % 10 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = temperature_mix(df, 150, alpha=0.5)
    per = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = temperature_allocations({"web": 900, "rare": 100}, 150, 0.5)
    assert per == {s: q for s, q in want.items() if q}
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(
        r["doc_id"] for r in temperature_mix(df.repartition(13), 150, alpha=0.5).collect()
    )
    assert a == b  # partitioning-independent selection


def test_temperature_mix_refuses_null_sources(spark):
    import pytest as _pytest

    from traildb_spark.operators.curation import temperature_mix

    df = spark.createDataFrame(
        [(1, "web"), (2, None)], "doc_id long, source string"
    )
    with _pytest.raises(ValueError, match="NULL values in the source"):
        temperature_mix(df, 1)


def test_source_overlap_matrix_hand_computed(spark):
    from traildb_spark.operators import curation

    # n=2 grams. s1 doc: "a b c" -> grams {ab, bc}; s2: "b c d" -> {bc, cd};
    # s3: "x y" -> {xy}. Shared: (s1,s2)={bc} -> jaccard 1/3 -> 333333 ppm.
    # s3 shares nothing -> absent from the matrix.
    df = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "b c d"), ("s3", "x y")],
        "source string, text string",
    )
    rows = curation.source_overlap_matrix(df, n=2).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (2, 2, 1)
    assert r["jaccard_ppm"] == 333333


def test_source_overlap_matrix_ubiquity_cap(spark):
    from traildb_spark.operators import curation

    # gram "a b" in all three sources: with cap=2 it is excluded
    # EVERYWHERE (pairs and totals); each source keeps only its private
    # gram, so no pair shares anything.
    df = spark.createDataFrame(
        [("s1", "a b p q"), ("s2", "a b r s"), ("s3", "a b t u")],
        "source string, text string",
    )
    assert curation.source_overlap_matrix(df, n=2, max_sources_per_gram=2).count() == 0
    # without the cap the three pairs appear
    assert curation.source_overlap_matrix(df, n=2, max_sources_per_gram=64).count() == 3


def test_source_overlap_matrix_validation(spark):
    import pytest as _pytest

    from traildb_spark.operators import curation

    df = spark.createDataFrame([("s", "a b")], "source string, text string")
    with _pytest.raises(ValueError, match="n must be"):
        curation.source_overlap_matrix(df, n=0)
    with _pytest.raises(ValueError, match="max_sources_per_gram"):
        curation.source_overlap_matrix(df, max_sources_per_gram=1)


def test_upsample_corpus_epochs_and_fractional(spark):
    from traildb_spark.operators import curation

    df = spark.createDataFrame(
        [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(200)],
        "doc_id long, source string",
    )
    out = curation.upsample_corpus(df, {"a": 3.0, "b": 1.5})
    per_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src["a"] == 300  # exactly 3 epochs
    # 1.5: 200 base + ~100 fractional (md5 threshold, deterministic)
    assert 260 <= per_src["b"] <= 340
    # determinism: identical on rerun
    again = {
        r["source"]: r["n"]
        for r in curation.upsample_corpus(df, {"a": 3.0, "b": 1.5})
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert again == per_src
    # epoch indices are dense per doc
    [r] = out.filter("doc_id = 5").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("es")
    ).collect()
    assert r["es"] == [0, 1, 2]
    # factor 0 drops; absent source passes through once
    zero = curation.upsample_corpus(df, {"a": 0.0})
    assert zero.filter("source = 'a'").count() == 0
    assert zero.filter("source = 'b'").count() == 200
    import pytest as _pytest

    with _pytest.raises(ValueError, match="negative"):
        curation.upsample_corpus(df, {"a": -1.0})


def test_contamination_report_pairs(spark):
    from traildb_spark.operators import curation

    leak = "alpha beta gamma delta"
    corpus = spark.createDataFrame(
        [(1, f"x {leak} y"), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"q {leak} r"), (200, "unrelated benchmark item")],
        "doc_id long, text string",
    )
    rows = curation.contamination_report(corpus, bench, n=4).collect()
    assert [(r["bench_id"], r["doc_id"]) for r in rows] == [(100, 1)]
    assert rows[0]["shared_grams"] == 1


def test_leakage_safe_split_clusters_move_together(spark):
    from traildb_spark.operators import curation

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0,1,2}, {10,11}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = curation.leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.2}
    ).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    comp = {r["doc_id"]: r["component"] for r in out}
    assert comp[0] == comp[1] == comp[2] == 0
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    assert comp[50] == 50  # singleton labels itself
    # both splits are populated across the 200 docs
    assert {r["split"] for r in out} == {"train", "val"}
    # and the assignment equals plain hash_split on the component label
    import collections

    by_comp = collections.Counter(
        (comp[d], split[d]) for d in split
    )
    assert all(
        len({s for (c2, s) in by_comp if c2 == c}) == 1
        for c in set(comp.values())
    )


def test_curriculum_order_interleaves_sources(spark):
    """Sources a(3 docs), b(2), c(1): position (r-1)*3 + gi round-robins
    best-first; ties on score break by id; positions are unique and
    sort to a->b->c within each rank round."""
    from traildb_spark.operators.curation import curriculum_order

    rows = [
        (0, "a", 0.9), (1, "a", 0.5), (2, "a", 0.7),
        (3, "b", 0.8), (4, "b", 0.8),       # tie -> id order
        (5, "c", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {r.doc_id: (r.rank_in_group, r.position)
           for r in curriculum_order(df, "score").collect()}
    assert got == {
        0: (1, 0), 2: (2, 3), 1: (3, 6),      # a: gi 0
        3: (1, 1), 4: (2, 4),                  # b: gi 1, tie by id
        5: (1, 2),                             # c: gi 2
    }
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [0, 3, 5, 2, 4, 1]


def test_curriculum_order_matches_plain_window(spark):
    """Two-phase rank == plain per-group window rank on a shuffled
    200-row fixture (the scalable construction must be a pure
    optimization)."""
    from pyspark.sql import Window as W

    from traildb_spark.operators.curation import curriculum_order

    rows = [(i, f"s{i % 7}", float((i * 37) % 50) / 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {r.doc_id: r.rank_in_group for r in curriculum_order(df, "score").collect()}
    w = W.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id"))
    want = {r.doc_id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


def test_perplexity_buckets_hand_computed(spark):
    """6 docs in one source with distinct whole-bit surprisal ordering:
    ranks 1-2 -> head, 3-4 -> middle, 5-6 -> tail. A second 1-doc source
    lands rank 1 of 1 -> (0*3) div 1 = 0 -> head. Repeated-rare-word
    docs rank above common-word docs; ties break by doc_id."""
    from traildb_spark.operators.curation import perplexity_buckets

    rows = [
        # source A: "a" appears in every doc (common), xN unique (rare)
        (1, "a a a a", "A"), (2, "a a a x2", "A"), (3, "a a x3 x3b", "A"),
        (4, "a x4 x4b x4c", "A"), (5, "x5 x5b x5c x5d", "A"),
        (6, "x6 x6b x6c x6d x6e x6f", "A"),
        (7, "a a", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: (r.source, r.rank_in_group, r.n_in_group, r.ppl_bucket)
           for r in perplexity_buckets(df).collect()}
    assert out[7] == ("B", 1, 1, "head")
    assert [out[i][1] for i in range(1, 7)] == [1, 2, 3, 4, 5, 6]
    assert [out[i][3] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail"]


def test_perplexity_buckets_validates_args(spark):
    import pytest
    from traildb_spark.operators.curation import perplexity_buckets
    df = spark.createDataFrame([(1, "a", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        perplexity_buckets(df, n_buckets=0)


def test_dsir_importance_matches_python_reference(spark):
    """Whole-bit DSIR weights vs an independent python mirror of the
    binary-digit-count model, including the absent-from-target smoothing
    (count-0 -> one binary digit) and negative weights for docs made of
    target-rare terms."""
    from traildb_spark.operators.curation import dsir_importance

    raw_rows = [
        (1, "cat cat"), (2, "dog"), (3, "cat dog bird"),
        (4, "zed zed zed"), (5, ""),
    ]
    tgt_rows = [(10, "cat cat cat"), (11, "cat dog")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    # python mirror
    from collections import Counter
    cr = Counter(w for _, t in raw_rows for w in t.split() if w)
    ct = Counter(w for _, t in tgt_rows for w in t.split() if w)
    tr, tt = sum(cr.values()), sum(ct.values())
    bits_r = {w: len(bin(tr)[2:]) - len(bin(c)[2:]) for w, c in cr.items()}
    bits_t = {w: len(bin(tt)[2:]) - len(bin(ct.get(w, 0))[2:] or "0")
              for w in cr}
    want = {}
    for d, t in raw_rows:
        ws = [w for w in t.split() if w]
        wb = sum(bits_r[w] - bits_t[w] for w in ws)
        n = len(ws)
        milli = 0 if n == 0 else int(1000 * wb / n) if wb >= 0 else -(
            (1000 * -wb) // n)
        want[d] = (n, wb, milli)

    got = {r.doc_id: (r.n_tokens, r.weight_bits, r.milliweight_per_token)
           for r in dsir_importance(raw, tgt).collect()}
    assert got == want
    # the target-rare doc must score below the target-like doc
    assert got[4][1] < got[1][1]


def test_sample_exact_by_key_sizes_and_determinism(spark):
    """Exact sizes per key (uniform k and per-key dict), deterministic
    membership under re-partitioning, unlisted dict keys keep 0."""
    from traildb_spark.operators.curation import sample_exact_by_key

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_exact_by_key(df, 7, seed="s1:")
    got = {r.source: r.n for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 7, "b": 7}
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in sample_exact_by_key(df.repartition(13), 7, seed="s1:").collect()
    )
    assert ids1 == ids2
    outd = sample_exact_by_key(df, {"a": 3}, seed="s1:")
    gotd = {r.source: r.n for r in
            outd.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert gotd == {"a": 3}
    # k larger than the stratum keeps the whole stratum
    assert sample_exact_by_key(df, {"b": 999}, seed="x").count() == 20
    import pytest
    with pytest.raises(ValueError):
        sample_exact_by_key(df, -1)


def test_forget_uuids_and_report(spark):
    from traildb_spark.operators import curation

    rows = [("u1", 1), ("u1", 2), ("u2", 3), ("u3", 4)]
    df = spark.createDataFrame(rows, "uuid string, event_id long")
    kept = curation.forget_uuids(df, ["u1", "u9"]).collect()
    assert sorted(r.uuid for r in kept) == ["u2", "u3"]
    rep = curation.forget_report(df, ["u1", "u9", "u9"]).collect()[0]
    assert (rep.n_requested, rep.n_present) == (2, 1)
    assert (rep.n_events_removed, rep.n_events_kept) == (2, 2)
    # DataFrame-side panel
    panel = spark.createDataFrame([("u2",), ("u3",)], "uuid string")
    rep2 = curation.forget_report(df, panel).collect()[0]
    assert (rep2.n_requested, rep2.n_present,
            rep2.n_events_removed, rep2.n_events_kept) == (2, 2, 2, 2)
    assert curation.forget_uuids(df, panel).count() == 2


def test_weighted_systematic_sample_hand_computed(spark):
    """Weights 10,10,10,10 with k=2 -> stride 20 -> boundaries at 20
    select the docs whose intervals cross 20 and 40; a heavy doc
    spanning several boundaries appears ONCE with its crossing count;
    zero-weight rows never select; rerun-identical."""
    from traildb_spark.operators import curation

    rows = [(1, 10), (2, 10), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = {r.id: (r.offset, r.n_boundaries) for r in
           curation.weighted_systematic_sample(df, 2).collect()}
    # offsets 0,10,20,30; stride 20; crossing = off <= m*20 <= off+n-1:
    # only doc3 [20,29] holds boundary 20 (40 > 39, doc4 misses it)
    assert got == {3: (20, 1)}
    # heavy doc: weights 1, 100, 1 with k=4 -> W=102, stride 25
    rows2 = [(1, 1), (2, 100), (3, 1)]
    df2 = spark.createDataFrame(rows2, "doc_id long, weight long")
    out = {r.id: r.n_boundaries for r in
           curation.weighted_systematic_sample(df2, 4).collect()}
    # doc2 spans [1,101): crosses 25,50,75,100 -> 4 boundaries
    assert out[2] == 4 and 1 not in out
    out_again = {r.id: r.n_boundaries for r in
                 curation.weighted_systematic_sample(df2, 4).collect()}
    assert out == out_again
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.weighted_systematic_sample(df2, 0)
    with _pytest.raises(ValueError):
        curation.weighted_systematic_sample(
            df2.withColumn("doc_id", df2.doc_id.cast("string")), 2)


def test_plan_mixture_hand_values(spark):
    from traildb_spark.operators import curation

    counts = spark.createDataFrame(
        [("web", 1000), ("code", 50), ("books", 0)],
        ["source", "n_tokens"],
    )
    plan = {r.source: r for r in curation.plan_mixture(
        counts, {"web": 500_000, "code": 400_000},
        budget_tokens=1000, max_epochs_ppm=4_000_000,
    ).collect()}
    web = plan["web"]     # target 500, cap 4000 -> planned 500
    assert (web.target_tokens, web.planned_tokens,
            web.epochs_ppm, web.deficit_tokens) == (500, 500, 500_000, 0)
    code = plan["code"]   # target 400, cap 200 -> deficit 200, 4 epochs
    assert (code.target_tokens, code.planned_tokens,
            code.epochs_ppm, code.deficit_tokens) == (400, 200,
                                                      4_000_000, 200)
    books = plan["books"]  # no target, zero inventory
    assert (books.target_share_ppm, books.planned_tokens,
            books.epochs_ppm) == (0, 0, 0)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="absent"):
        curation.plan_mixture(counts, {"nosuch": 1}, budget_tokens=10)


def test_ngram_novelty_hand_computed(spark):
    """n=2 grams: doc0 all-novel, doc1 half-novel (shares 'a b'),
    doc2 a re-combination of seen grams scores 0."""
    from traildb_spark.operators.curation import ngram_novelty

    df = spark.createDataFrame(
        [
            (0, "a b c", "s0"),
            (1, "a b x", "s0"),
            (2, "a b c", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in ngram_novelty(df, n=2).collect()}
    assert out[0].novelty_ppm == 1_000_000 and out[0].n_grams == 2
    assert out[1].novelty_ppm == 500_000 and out[1].novel_grams == 1
    assert out[2].novelty_ppm == 0 and out[2].source == "s1"


def test_dedup_impact_report_hand_computed(spark):
    """One exact clone (removed by exact), one near-clone of a survivor
    (removed by near), one unique doc per source; token accounting
    follows the kept set."""
    from traildb_spark.operators.curation import dedup_impact_report

    words = "alpha beta gamma delta epsilon zeta eta theta"
    base = " ".join([words] * 3)  # J(base, base+' omega') = 0.902 and
    # the fixed md5 hash family provably bands the pair at 16/4
    # (checked offline against _portable_perms — deterministic forever)
    rows = [
        (1, base, "s0"),
        (2, base, "s0"),                 # exact clone -> exact_removed
        (3, base + " omega", "s1"),      # near-dup of surviving 1
        (4, "completely different content entirely unrelated", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in dedup_impact_report(df).collect()}
    s0, s1 = out["s0"], out["s1"]
    assert (s0.n_docs, s0.exact_removed, s0.near_removed, s0.n_kept) == (2, 1, 0, 1)
    assert (s1.n_docs, s1.exact_removed, s1.near_removed, s1.n_kept) == (2, 0, 1, 1)
    assert s0.tokens_before == 48 and s0.tokens_kept == 24
    assert s1.tokens_before == 30 and s1.tokens_kept == 5
