"""as_of_join semantics: backward/forward, inclusive equal-timestamp match,
unmatched-left nulls, multi-key, column collision suffix.

Oracle-style: expected values computed by hand on a tiny fixture (the
sf0.01 differential against DuckDB's native ASOF JOIN runs in
tools/check_correctness.py q24)."""

from pyspark.sql import functions as F

from traildb_spark.operators.joins import as_of_join


def _fixture(spark):
    quotes = spark.createDataFrame(
        [
            ("a", 10, 1.0),
            ("a", 20, 2.0),
            ("a", 30, 3.0),
            ("b", 15, 10.0),
        ],
        ["sym", "qt", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("a", 5, 100),   # before any quote -> null
            ("a", 20, 101),  # equal ts -> inclusive match (2.0)
            ("a", 25, 102),  # between -> 2.0
            ("a", 99, 103),  # after all -> 3.0
            ("b", 15, 104),  # equal ts on other key -> 10.0
            ("c", 50, 105),  # key with no quotes -> null
        ],
        ["sym", "tt", "trade_id"],
    )
    return quotes, trades


def test_asof_backward(spark):
    quotes, trades = _fixture(spark)
    out = as_of_join(trades, quotes, on="sym", left_time="tt", right_time="qt")
    got = {r["trade_id"]: (r["qt"], r["px"]) for r in out.collect()}
    assert got == {
        100: (None, None),
        101: (20, 2.0),
        102: (20, 2.0),
        103: (30, 3.0),
        104: (15, 10.0),
        105: (None, None),
    }


def test_asof_forward(spark):
    quotes, trades = _fixture(spark)
    out = as_of_join(
        trades, quotes, on="sym", left_time="tt", right_time="qt", direction="forward"
    )
    got = {r["trade_id"]: (r["qt"], r["px"]) for r in out.collect()}
    assert got == {
        100: (10, 1.0),
        101: (20, 2.0),
        102: (30, 3.0),
        103: (None, None),
        104: (15, 10.0),
        105: (None, None),
    }


def test_asof_collision_suffix(spark):
    quotes, trades = _fixture(spark)
    quotes2 = quotes.withColumnRenamed("qt", "tt")  # collide with left's time col
    out = as_of_join(trades, quotes2, on="sym", left_time="tt", right_time="tt")
    assert "tt_right" in out.columns and "tt" in out.columns
    row = {r["trade_id"]: r["tt_right"] for r in out.collect()}
    assert row[102] == 20


def test_asof_preserves_left_rowcount(spark):
    quotes, trades = _fixture(spark)
    out = as_of_join(trades, quotes, on="sym", left_time="tt", right_time="qt")
    assert out.count() == trades.count()


def test_asof_bad_direction(spark):
    quotes, trades = _fixture(spark)
    try:
        as_of_join(trades, quotes, on="sym", left_time="tt", right_time="qt", direction="nearest")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_range_join_binned_equals_naive(spark):
    """Binned range join == naive inequality join on a random-ish fixture,
    across bin sizes (including bins much smaller/larger than intervals)."""
    from traildb_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(200)], ["lid", "t"]
    )
    right = spark.createDataFrame(
        [(j, (j * 91) % 900, (j * 91) % 900 + 10 + (j % 50)) for j in range(40)],
        ["rid", "s", "e"],
    )
    naive = sorted(
        (l["lid"], r["rid"])
        for l in left.collect()
        for r in right.collect()
        if r["s"] <= l["t"] < r["e"]
    )
    for bin_size in (7, 64, 2000):
        got = sorted(
            map(
                tuple,
                range_join(left, right, left_time="t", start_col="s", end_col="e",
                           bin_size=bin_size).select("lid", "rid").collect(),
            )
        )
        assert got == naive, f"bin_size={bin_size}"


def test_range_join_with_keys(spark):
    from traildb_spark.operators.joins import range_join

    left = spark.createDataFrame([("a", 5), ("b", 5)], ["k", "t"])
    right = spark.createDataFrame([("a", 0, 10)], ["k", "s", "e"])
    out = range_join(left, right, left_time="t", start_col="s", end_col="e", on="k")
    assert [tuple(r) for r in out.select("k", "t").collect()] == [("a", 5)]


def test_range_join_no_nested_loop_plan(spark):
    from traildb_spark.operators.joins import range_join
    from traildb_spark.plans import audit

    left = spark.createDataFrame([(1, 1)], ["lid", "t"])
    right = spark.createDataFrame([(1, 0, 5)], ["rid", "s", "e"])
    out = range_join(left, right, left_time="t", start_col="s", end_col="e")
    plan = audit.explain_str(out, "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_asof_join_fractional_times(spark):
    """Sub-second numeric timestamps must not be truncated: right@10.7 is
    in the FUTURE of left@10.5 and may not match backward."""
    from traildb_spark.operators.joins import as_of_join

    left = spark.createDataFrame([("a", 10.5, 1)], ["k", "t", "x"])
    right = spark.createDataFrame(
        [("a", 10.7, "future"), ("a", 10.2, "past")], ["k", "t2", "y"]
    )
    got = as_of_join(left, right, on="k", left_time="t", right_time="t2").collect()
    assert len(got) == 1 and got[0]["y"] == "past"


def test_range_join_inverted_interval_matches_nothing(spark):
    """A zeroed/sentinel end (end <= start) is an empty interval: zero
    pairs, and crucially zero bin explosion."""
    from traildb_spark.operators.joins import range_join

    left = spark.createDataFrame([(1.7e9, "e")], ["time", "ev"])
    right = spark.createDataFrame(
        [(1.7e9 - 10, 0.0, "bad"), (1.7e9 - 10, 1.8e9, "good")],
        ["start", "end", "tag"],
    )
    got = range_join(left, right).collect()
    assert [r["tag"] for r in got] == ["good"]


def test_asof_null_right_time_is_not_a_match(spark):
    from traildb_spark.operators.joins import as_of_join

    left = spark.createDataFrame([("k", 5)], ["k", "time"])
    right = spark.createDataFrame(
        [("k", None, 99)], "k string, rt long, px long"
    )
    out = as_of_join(left, right, on="k", left_time="time", right_time="rt").collect()
    assert len(out) == 1 and out[0]["px"] is None


def test_range_join_rejects_ambiguous_columns(spark):
    import pytest as _pytest

    from traildb_spark.operators.joins import range_join

    left = spark.createDataFrame([("k", 5, "x")], ["k", "time", "shared"])
    right = spark.createDataFrame(
        [("k", 0, 10, "y")], ["k", "start", "end", "shared"]
    )
    with _pytest.raises(ValueError, match="ambiguous"):
        range_join(left, right, on="k")


def test_range_join_sentinel_interval_fails_fast(spark):
    import pytest as _pytest

    from traildb_spark.operators.joins import range_join

    left = spark.createDataFrame([("k", 5)], ["k", "time"])
    right = spark.createDataFrame(
        [("k", 0, 253402300800)], ["k", "start", "end"]  # open-ended sentinel
    )
    with _pytest.raises(Exception, match="bins"):
        range_join(left, right, on="k", bin_size=3600).collect()


def test_join_skew_report_exact_fanout_and_order(spark):
    from traildb_spark.operators.joins import join_skew_report

    a = spark.createDataFrame(
        [("k1",)] * 3 + [("k2",)] * 2 + [("only_a",)] + [(None,)],
        "uuid string",
    )
    b = spark.createDataFrame(
        [("k1",)] * 4 + [("k2",)] * 10 + [(None,)] * 5, "uuid string"
    )
    rows = join_skew_report(a, b, "uuid", top_k=10).collect()
    # k2: 2*10=20 beats k1: 3*4=12; only_a / NULL excluded
    assert [(r["key"], r["cnt_a"], r["cnt_b"], r["fanout"]) for r in rows] == [
        ("k2", 2, 10, 20),
        ("k1", 3, 4, 12),
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_k"):
        join_skew_report(a, b, "uuid", top_k=0)


def test_as_of_join_tolerance_matches_pandas(spark):
    """tolerance semantics == pandas merge_asof(tolerance=...) in both
    directions, including the inclusive boundary and equal-timestamp
    matches."""
    import pandas as pd

    from traildb_spark.operators.joins import as_of_join

    left = [("k1", 10), ("k1", 100), ("k1", 101), ("k2", 50), ("k2", 5)]
    right = [("k1", 7, 1.0), ("k1", 90, 2.0), ("k2", 50, 3.0), ("k2", 400, 4.0)]
    ldf = spark.createDataFrame(left, "k string, time long")
    rdf = spark.createDataFrame(right, "k string, time long, px double")
    lpd = pd.DataFrame(left, columns=["k", "time"]).sort_values("time")
    rpd = pd.DataFrame(right, columns=["k", "time", "px"]).sort_values("time")
    for direction, tol in (("backward", 10), ("backward", 3), ("forward", 50),
                           ("backward", 0), ("forward", 0)):
        got = {
            (r.k, r.time): r.px
            for r in as_of_join(
                ldf, rdf, "k", direction=direction, tolerance=tol
            ).collect()
        }
        want_pd = pd.merge_asof(
            lpd, rpd, on="time", by="k", direction=direction,
            tolerance=tol, allow_exact_matches=True,
        )
        want = {
            (r.k, r.time): (None if pd.isna(r.px) else r.px)
            for r in want_pd.itertuples()
        }
        assert got == want, (direction, tol, got, want)


def test_as_of_join_tolerance_none_unchanged_and_validates(spark):
    import pytest

    from traildb_spark.operators.joins import as_of_join

    ldf = spark.createDataFrame([("k", 10)], "k string, time long")
    rdf = spark.createDataFrame([("k", 5, 1.0)], "k string, time long, px double")
    assert as_of_join(ldf, rdf, "k").collect()[0].px == 1.0
    with pytest.raises(ValueError):
        as_of_join(ldf, rdf, "k", tolerance=-1)


def test_hard_negatives_excludes_same_label(spark):
    """Anchors get top-k among DIFFERENT-label vectors only: v0 (label
    A) is most similar to v1 (A, identical direction) but must skip it
    and return v2/v3 (B); ranks order by cosine."""
    from traildb_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),       # label 0, same dir
        (2, [0.9, 0.1], 1), (3, [0.0, 1.0], 1),       # label 1
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label")
    got = [(r.corpus_id, r.rank, r.corpus_label)
           for r in hard_negatives(emb, q, k=2).orderBy("rank").collect()]
    assert got == [(2, 1, 1), (3, 2, 1)]
    import pytest
    with pytest.raises(ValueError):
        hard_negatives(emb, q, k=0)
