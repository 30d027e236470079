"""Property-based tests (hypothesis), mirroring the reference's test
strategy (SURVEY §5): "what you write is what you read" round-trips
(reference tests/c-tests/what_you_write_you_get_back.c, basic_cursor.c) and
CNF filter semantics against an independent Python evaluator (reference
tests/tdbcli/test_tdbcli.py:92-141 computes expectations in pure Python).
"""

from collections import Counter

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from traildb_spark import EventFilter, TrailDataset
from traildb_spark.dataset import normalize_events

VALUES = ["", "a", "b", "xyz", None]

event = st.tuples(
    st.sampled_from(["u0", "u1", "u2"]),        # uuid
    st.integers(min_value=0, max_value=10**9),  # time
    st.sampled_from(VALUES),                    # f1
    st.sampled_from(VALUES),                    # f2
)
event_lists = st.lists(event, min_size=0, max_size=40)


def _mk(spark, rows):
    df = spark.createDataFrame(
        [(u, t, a, b) for (u, t, a, b) in rows],
        "uuid string, time long, f1 string, f2 string",
    )
    return normalize_events(df, "uuid", "time")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=event_lists)
def test_what_you_write_you_get_back(spark, tmp_path_factory, rows):
    """finalize → open round-trip preserves the exact event multiset with
    '' normalization of NULLs (reference round-trip property)."""
    df = _mk(spark, rows)
    path = str(tmp_path_factory.mktemp("prop") / "db")
    TrailDataset(df).finalize(path, num_buckets=2)
    back = TrailDataset.open(spark, path)
    got = Counter(map(tuple, back.df.select("uuid", "time", "f1", "f2").collect()))
    want = Counter(
        (u, t, a or "", b or "") for (u, t, a, b) in rows
    )
    assert got == want
    # per-trail time order within the layout
    ordered = back.df.withColumn(
        "ok",
        F.col("time")
        >= F.lag("time", 1, 0).over(Window.partitionBy("uuid").orderBy("time")),
    )
    assert ordered.filter(~F.col("ok")).count() == 0


clause = st.lists(
    st.tuples(
        st.sampled_from(["f1", "f2", "nosuch"]),
        st.sampled_from(["", "a", "b", "zzz"]),
        st.booleans(),  # negative
    ),
    min_size=1,
    max_size=3,
)
cnf = st.lists(clause, min_size=1, max_size=3)


def _py_eval(filters, row):
    """Independent CNF evaluator with reference semantics: ''≡NULL, unknown
    field item-0 (positive never matches, negated always)."""
    fields = {"f1": row[2] or "", "f2": row[3] or ""}
    for cl in filters:
        hit = False
        for (fld, val, neg) in cl:
            if fld not in fields:
                term = neg
            else:
                term = (fields[fld] != val) if neg else (fields[fld] == val)
            hit = hit or term
        if not hit:
            return False
    return True


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=event_lists, filters=cnf)
def test_cnf_filter_matches_python_oracle(spark, rows, filters):
    df = _mk(spark, rows)
    f = EventFilter()
    for cl in filters:
        f.new_clause()
        for (fld, val, neg) in cl:
            f.add_term(fld, val, negative=neg)
    got = Counter(
        map(tuple, df.filter(f.compile(df.columns)).collect())
    )
    want = Counter(
        (u, t, a or "", b or "")
        for (u, t, a, b) in rows
        if _py_eval(filters, (u, t, a, b))
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=30, unique=True),
    w=st.sampled_from(
        [
            {"train": 1.0},
            {"train": 0.9, "val": 0.1},
            {"train": 0.8, "val": 0.1, "test": 0.1},
            {"a": 0.25, "b": 0.25, "c": 0.25, "d": 0.25},
        ]
    ),
)
def test_hash_split_is_a_partition(spark, ids, w):
    """Every id gets exactly one split from the weight keys, assignment is
    id-order- and partitioning-independent, and salt='' matches a rerun."""
    from traildb_spark.operators import curation

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = curation.hash_split(df, w).collect()
    assert len(got) == len(ids)
    assert {r["split"] for r in got} <= set(w)
    again = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(df.repartition(7).sort(F.desc("doc_id")), w).collect()
    }
    assert {r["doc_id"]: r["split"] for r in got} == again


# --- funnel fold vs independent Python min-time-chain ---------------------

funnel_event = st.tuples(
    st.sampled_from(["u0", "u1", "u2"]),
    st.integers(min_value=0, max_value=50),     # small range → many ties
    st.sampled_from(["a", "b", "c", "x"]),
)


def _py_funnel(rows, steps, within=None):
    """Independent oracle: per uuid, s0 = min time matching steps[0];
    s_i = min time matching steps[i] strictly after s_{i-1} (and within
    the conversion window when set)."""
    out = {}
    for u in {r[0] for r in rows}:
        evs = [(t, v) for (uu, t, v) in rows if uu == u]
        times = []
        prev = None
        for i, sv in enumerate(steps):
            cand = [
                t for (t, v) in evs
                if v == sv
                and (i == 0 or (prev is not None and t > prev
                                and (within is None or t <= prev + within)))
            ]
            cur = min(cand) if cand and (i == 0 or prev is not None) else None
            times.append(cur)
            prev = cur
        out[u] = tuple(times)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(funnel_event, min_size=0, max_size=40))
def test_funnel_fold_matches_min_chain(spark, rows):
    from traildb_spark.operators import analytics

    if not rows:
        return
    df = spark.createDataFrame(rows, "uuid string, time long, event_type string")
    steps = [F.col("event_type") == s for s in ("a", "b", "c")]
    for within in (None, 7):
        got = {
            r["uuid"]: (r["s0"], r["s1"], r["s2"])
            for r in analytics.funnel_times(df, steps, within=within).collect()
        }
        assert got == _py_funnel(rows, ["a", "b", "c"], within)
