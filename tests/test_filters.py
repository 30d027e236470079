"""CNF filter truth tables — mirrors reference
tests/c-tests/event_filter_simple.c:51-158 and
time_range_filter_simple.c:57-148 (counts from FIXTURES.md F2)."""

from pyspark.sql import functions as F

from traildb_spark import EventFilter, parse_filter, uuid_whitelist


def n(df, filt):
    return filt.apply(df).count()


def test_single_term(filter_basic):
    assert n(filter_basic, EventFilter().add_term("a", "foo")) == 3


def test_or_within_clause(filter_basic):
    f = EventFilter().add_term("a", "foo").add_term("b", "sun")
    assert n(filter_basic, f) == 4


def test_empty_value_matches_empty(filter_basic):
    assert n(filter_basic, EventFilter().add_term("c", "")) == 3


def test_empty_value_matches_null(spark):
    # '' ≡ NULL (reference src/tdb.c:488-524)
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, ""), ("u", 3, "x")], ["uuid", "time", "a"]
    )
    assert n(df, EventFilter().add_term("a", "")) == 2
    assert n(df, EventFilter().add_term("a", "x", negative=True)) == 2


def test_negated(filter_basic):
    assert n(filter_basic, EventFilter().add_term("a", "foo", negative=True)) == 1
    assert n(filter_basic, EventFilter().add_term("c", "", negative=True)) == 1


def test_neg_or_pos(filter_basic):
    f = EventFilter().add_term("b", "sun", negative=True).add_term("a", "foo")
    assert n(filter_basic, f) == 3


def test_and_clauses(filter_basic):
    f = EventFilter().new_clause().add_term("b", "sun").new_clause().add_term("c", "nam")
    assert n(filter_basic, f) == 1
    f3 = (
        EventFilter()
        .new_clause().add_term("a", "foo")
        .new_clause().add_term("b", "bar")
        .new_clause().add_term("c", "")
    )
    assert n(filter_basic, f3) == 1


def test_empty_clause_matches_nothing(filter_basic):
    assert n(filter_basic, EventFilter().new_clause()) == 0


def test_no_clauses_matches_all(filter_basic):
    assert n(filter_basic, EventFilter()) == 4


def test_unknown_field_item0(filter_basic):
    # reference src/tdb_decode.c:47-52: positive → 0 rows, negated → all
    assert n(filter_basic, EventFilter().add_term("nosuch", "x")) == 0
    assert n(filter_basic, EventFilter().add_term("nosuch", "x", negative=True)) == 4


def test_unknown_value(filter_basic):
    assert n(filter_basic, EventFilter().add_term("a", "zzz")) == 0
    assert n(filter_basic, EventFilter().add_term("a", "zzz", negative=True)) == 4


def test_match_all_none(filter_basic):
    assert n(filter_basic, EventFilter.all()) == 4
    assert n(filter_basic, EventFilter.none()) == 0


def test_time_ranges(filter_basic):
    assert n(filter_basic, EventFilter().add_time_range(0, 5)) == 4
    assert n(filter_basic, EventFilter().add_time_range(0, 4)) == 3
    assert n(filter_basic, EventFilter().add_time_range(2, 3)) == 1
    # AND of disjoint ranges → 0
    f = EventFilter().new_clause().add_time_range(0, 2).new_clause().add_time_range(3, 5)
    assert n(filter_basic, f) == 0
    # OR of ranges within one clause
    f = EventFilter().add_time_range(1, 2).add_time_range(4, 5)
    assert n(filter_basic, f) == 2


def test_time_range_or_item(filter_basic):
    # range OR item term inside one clause (reference src/tdb.c:861-879)
    f = EventFilter().add_time_range(4, 5).add_term("a", "foo")
    assert n(filter_basic, f) == 4


def test_parser(filter_basic):
    assert n(filter_basic, parse_filter("a=foo")) == 3
    assert n(filter_basic, parse_filter("a=foo b=sun")) == 4
    assert n(filter_basic, parse_filter("b=sun & c=nam")) == 1
    assert n(filter_basic, parse_filter("a!=foo")) == 1
    assert n(filter_basic, parse_filter("c=")) == 3
    assert n(filter_basic, parse_filter("")) == 4
    assert n(filter_basic, parse_filter("time:[0,4)")) == 3


def test_uuid_whitelist(spark):
    rows = [(f"{i:032x}", t, str(i)) for i in range(5) for t in (1, 2)]
    df = spark.createDataFrame(rows, ["uuid", "time", "v"])
    wl = [f"{1:032x}", f"{3:032x}"]
    got = uuid_whitelist(df, wl)
    assert got.count() == 4
    assert set(r["v"] for r in got.collect()) == {"1", "3"}


def test_trail_filter_overrides(spark):
    from traildb_spark import trail_filter_overrides

    rows = [(f"{i:032x}", t, "x" if t == 1 else "y") for i in range(3) for t in (1, 2)]
    df = spark.createDataFrame(rows, ["uuid", "time", "v"])
    u0 = f"{0:032x}"
    # db filter: v=x; override for trail 0: match-all
    got = trail_filter_overrides(
        df, EventFilter().add_term("v", "x"), {u0: EventFilter.all()}
    )
    assert got.count() == 4  # 2 events of trail 0 + 1 'x' event each of trails 1,2
    # blacklist: override trail 0 to match-none, db match-all
    got2 = trail_filter_overrides(df, EventFilter.all(), {u0: EventFilter.none()})
    assert got2.count() == 4
    assert all(r["uuid"] != u0 for r in got2.collect())


def test_uuid_whitelist_case_and_empty(spark):
    from traildb_spark.operators.filters import uuid_whitelist

    df = spark.createDataFrame([("ab12", 1), ("cd34", 2)], ["uuid", "time"])
    # ingest lowercases uuids; an uppercase whitelist must still match
    got = uuid_whitelist(df, ["AB12"]).collect()
    assert [r["uuid"] for r in got] == ["ab12"]
    # empty whitelist = match-none (the reference's match-none db filter),
    # not a schema-inference crash
    assert uuid_whitelist(df, []).count() == 0


def test_parse_filter_value_containing_neq(spark):
    """Reference grammar scans for the FIRST '=': 'note=a!=b' is a
    positive term on field 'note' with value 'a!=b'."""
    from traildb_spark.operators.filters import parse_filter

    f = parse_filter("note=a!=b")
    t = f.get_term(0, 0)
    assert (t.field, t.value, t.negative) == ("note", "a!=b", False)
    f2 = parse_filter("note!=x")
    t2 = f2.get_term(0, 0)
    assert (t2.field, t2.value, t2.negative) == ("note", "x", True)


def test_parse_filter_rejects_stray_amp():
    import pytest as _pytest

    from traildb_spark.operators.filters import parse_filter

    for bad in ("a=1 &", "& a=1", "a=1 && b=2"):
        with _pytest.raises(ValueError, match="empty clause"):
            parse_filter(bad)


def test_trail_overrides_uppercase_uuid_keys(spark):
    from traildb_spark import EventFilter
    from traildb_spark.operators.filters import trail_filter_overrides

    df = spark.createDataFrame(
        [("ab12", 1, "x"), ("cd34", 2, "y")], ["uuid", "time", "f"]
    )
    # uppercase key must still match the canonical lowercase uuid
    out = trail_filter_overrides(
        df, None, {"AB12": EventFilter.none()}
    ).collect()
    assert {r["uuid"] for r in out} == {"cd34"}


def test_trail_filter_spec_join_equals_case_form(spark):
    """The join-based filter-spec TABLE (million-trail scale form) must
    agree exactly with the CASE-expression trail_filter_overrides on the
    same overrides — including ''==NULL terms, negation, unknown-field
    item-0 semantics, and the db-filter fallback for trails without an
    override."""
    import random

    from traildb_spark.operators.filters import (
        EventFilter,
        trail_filter_overrides,
        trail_filter_spec_join,
    )

    rng = random.Random(11)
    uuids = [f"u{i}" for i in range(6)]
    vals = ["", "a", "b", None]
    rows = [
        (u, t, rng.choice(vals), rng.choice(vals), 1000 + 10 * t + i)
        for i, (u, t) in enumerate(
            (rng.choice(uuids), rng.randrange(100)) for _ in range(120)
        )
    ]
    df = spark.createDataFrame(
        rows, "uuid string, time long, f1 string, f2 string, event_id long"
    )

    # overrides for half the trails: random CNF over f1/f2/nosuch
    overrides = {}
    spec_rows = []
    for u in uuids[:3]:
        f = EventFilter()
        for ci in range(rng.randint(1, 2)):
            f.new_clause()
            for _ in range(rng.randint(1, 2)):
                fld = rng.choice(["f1", "f2", "nosuch"])
                val = rng.choice(["", "a", "zzz"])
                neg = rng.random() < 0.5
                f.add_term(fld, val, negative=neg)
                spec_rows.append((u, ci, fld, val, neg))
        overrides[u] = f
    spec = spark.createDataFrame(
        spec_rows, "uuid string, clause long, field string, value string, negative boolean"
    )
    db_f = EventFilter().new_clause().add_term("f1", "a").add_term("f2", "b")

    want = sorted(
        map(tuple, trail_filter_overrides(df, db_f, overrides).collect())
    )
    got = sorted(
        map(
            tuple,
            trail_filter_spec_join(
                df, spec, ("uuid", "time", "event_id"), db_f
            ).collect(),
        )
    )
    assert got == want and len(want) > 0

    # regression: a positive non-empty term against a NULL column must be
    # FALSE, not SQL NULL — a NULL keep flag would silently flip the row
    # into the no-override db-filter branch
    df2 = spark.createDataFrame(
        [("ux", 1, None, None, 1), ("ux", 2, "b", None, 2)],
        "uuid string, time long, f1 string, f2 string, event_id long",
    )
    spec2 = spark.createDataFrame(
        [("ux", 0, "f2", "b", False)],
        "uuid string, clause long, field string, value string, negative boolean",
    )
    kept = trail_filter_spec_join(df2, spec2, ("uuid", "time", "event_id")).collect()
    assert kept == []  # neither row has f2 = 'b'


def test_trail_filter_spec_join_guards(spark):
    """The spec-join's 'bounded by spec-per-trail' claim is enforced: a
    pathological spec (one whale trail with > max_terms_per_trail terms)
    raises loudly before the events-by-terms join runs, and a spec row
    with a NULL field/value/negative raises at execution instead of
    silently flipping the trail onto the db-filter branch."""
    import pytest as _pytest

    from traildb_spark.operators.filters import trail_filter_spec_join

    df = spark.createDataFrame(
        [("u0", 1, "a", 1), ("u0", 2, "b", 2)],
        "uuid string, time long, f1 string, event_id long",
    )
    big_spec = spark.createDataFrame(
        [("u0", 0, "f1", f"v{i}", False) for i in range(25)],
        "uuid string, clause long, field string, value string, negative boolean",
    )
    with _pytest.raises(ValueError, match="max_terms_per_trail"):
        trail_filter_spec_join(
            df, big_spec, ("uuid", "time", "event_id"), max_terms_per_trail=10
        )
    # same spec under a raised cap (or None) runs fine
    assert (
        trail_filter_spec_join(
            df, big_spec, ("uuid", "time", "event_id"), max_terms_per_trail=None
        ).count()
        == 0
    )

    null_spec = spark.createDataFrame(
        [("u0", 0, "f1", None, False)],
        "uuid string, clause long, field string, value string, negative boolean",
    )
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception, match="NULL"):
        try:
            trail_filter_spec_join(
                df, null_spec, ("uuid", "time", "event_id")
            ).collect()
        except Py4JJavaError as e:  # surface the JVM message for the match
            raise RuntimeError(str(e)) from e


def test_json_field_null_on_malformed_and_missing(spark):
    from pyspark.sql import functions as F

    from traildb_spark.functions.core import json_field

    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"other": 1}',), ("not json",), ("",), (None,)],
        "props string",
    )
    got = [
        r["k"]
        for r in df.select(
            json_field(F.col("props"), "$.k").cast("long").alias("k")
        ).collect()
    ]
    assert got == [7, None, None, None, None]
