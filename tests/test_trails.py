"""Trail-semantics tests — sessionization (FIXTURES F6), only-diff
(reference tests/c-tests/opt_only_diff_items.c), trail ids, k-way merge
oracle (reference tests/c-tests/multi_cursor.c:129-146)."""

from pyspark.sql import functions as F

from traildb_spark.operators import trails


def test_trail_lengths(spark):
    rows = [(f"{i:032x}", t) for i in range(3) for t in range(i + 1)]
    df = spark.createDataFrame(rows, ["uuid", "time"])
    got = {r["uuid"]: r["trail_length"] for r in trails.trail_lengths(df).collect()}
    assert got == {f"{0:032x}": 1, f"{1:032x}": 2, f"{2:032x}": 3}


def test_collect_trails_time_order(spark):
    rows = [("u1", 3, "c"), ("u1", 1, "a"), ("u1", 2, "b")]
    df = spark.createDataFrame(rows, ["uuid", "time", "x"])
    r = trails.collect_trails(df).collect()[0]
    assert [e["x"] for e in r["events"]] == ["a", "b", "c"]
    assert r["trail_length"] == 3


def test_sessionize():
    pass  # covered by test_session_stats


def test_session_stats(spark):
    # gaps straddle the 1800 s limit (FIXTURES F6)
    rows = [
        ("u1", 0), ("u1", 100), ("u1", 2000),  # gap 1900 > 1800 → 2 sessions
        ("u2", 0), ("u2", 1800), ("u2", 3600),  # gaps exactly 1800 → 1 session
        ("u3", 0),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time"])
    got = {r["uuid"]: (r["num_sessions"], r["num_events"]) for r in
           trails.session_stats(df, gap=1800).collect()}
    assert got == {"u1": (2, 3), "u2": (1, 3), "u3": (1, 1)}


def test_only_diff_items(spark):
    # reference opt_only_diff_items.c: constant field emitted only on first
    # event; two-field variant with mid-trail change
    rows = [
        ("u", 1, "x", "p"),
        ("u", 2, "x", "q"),
        ("u", 3, "y", "q"),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "a", "b"])
    got = {r["time"]: (r["a"], r["b"]) for r in trails.only_diff_items(df).collect()}
    assert got == {1: ("x", "p"), 2: ("", "q"), 3: ("y", "")}


def test_trail_ids_sorted_dense(spark):
    rows = [(u, 1) for u in ["cc", "aa", "bb", "aa"]]
    df = spark.createDataFrame(rows, ["uuid", "time"])
    got = {r["uuid"]: r["trail_id"] for r in trails.trail_ids(df).collect()}
    assert got == {"aa": 0, "bb": 1, "cc": 2}


def test_multi_cursor_merge_oracle(spark):
    # FIXTURES F7 multi_merge, scaled down: K datasets, same uuids,
    # merge must equal concatenate-then-sort oracle
    import itertools

    lengths = [40, 10, 0, 5]
    dfs = []
    all_rows = []
    for k, ln in enumerate(lengths):
        rows = [(f"{i:032x}", 1000 + k * (j + 1), f"d{k}") for i in range(3) for j in range(ln)]
        all_rows += rows
        dfs.append(spark.createDataFrame(rows, ["uuid", "time", "src"]) if rows
                   else spark.createDataFrame([], "uuid string, time long, src string"))
    merged = trails.merged_trail_stream(dfs)
    got = [(r["uuid"], r["time"]) for r in merged.orderBy("uuid", "event_pos").collect()]
    oracle = sorted((u, t) for u, t, _ in all_rows)
    assert got == oracle


def test_apply_to_trails(spark):
    rows = [("u1", 3, 1.0), ("u1", 1, 2.0), ("u2", 5, 7.0)]
    df = spark.createDataFrame(rows, ["uuid", "time", "value"])

    def first_last(pdf):
        import pandas as pd
        return pd.DataFrame(
            {"uuid": [pdf["uuid"].iloc[0]],
             "first_value": [pdf["value"].iloc[0]],
             "n": [len(pdf)]}
        )

    got = {r["uuid"]: (r["first_value"], r["n"]) for r in
           trails.apply_to_trails(df, first_last,
                                  "uuid string, first_value double, n long").collect()}
    assert got == {"u1": (2.0, 2), "u2": (7.0, 1)}
