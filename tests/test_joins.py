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
