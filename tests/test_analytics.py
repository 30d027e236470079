"""Trail-analytics operator tests (hand-computed fixtures)."""

from pyspark.sql import functions as F

from traildb_spark.operators import analytics


def _ev(spark):
    # two trails; u1: a@1 b@2 a@3 c@4   u2: b@10 b@20 a@30
    rows = [
        ("u1", 1, "a"),
        ("u1", 2, "b"),
        ("u1", 3, "a"),
        ("u1", 4, "c"),
        ("u2", 10, "b"),
        ("u2", 20, "b"),
        ("u2", 30, "a"),
    ]
    return spark.createDataFrame(rows, ["uuid", "time", "event_type"])


def test_value_frequencies_topk(spark):
    df = _ev(spark)
    got = {r["value"]: r["freq"] for r in analytics.value_frequencies(df, "event_type").collect()}
    assert got == {"a": 3, "b": 3, "c": 1}
    top1 = analytics.value_frequencies(df, "event_type", top_k=1).collect()
    assert [(r["value"], r["freq"]) for r in top1] == [("a", 3)]  # tie → alphabetical


def test_transition_counts(spark):
    df = _ev(spark)
    got = {(r["src"], r["dst"]): r["freq"] for r in analytics.transition_counts(df, "event_type").collect()}
    # u1: a→b, b→a, a→c ; u2: b→b, b→a
    assert got == {("a", "b"): 1, ("b", "a"): 2, ("a", "c"): 1, ("b", "b"): 1}


def test_funnel_times_chain_and_break(spark):
    df = _ev(spark)
    steps = [F.col("event_type") == s for s in ("a", "b", "c")]
    got = {r["uuid"]: (r["s0"], r["s1"], r["s2"]) for r in analytics.funnel_times(df, steps).collect()}
    # u1: a@1 → b@2 → c@4 ; u2: a@30 but no b AFTER it → chain breaks
    assert got["u1"] == (1, 2, 4)
    assert got["u2"] == (30, None, None)


def test_funnel_strictly_after_same_timestamp(spark):
    rows = [("u", 5, "a"), ("u", 5, "b"), ("u", 6, "b")]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    steps = [F.col("event_type") == "a", F.col("event_type") == "b"]
    r = analytics.funnel_times(df, steps).first()
    # b@5 is NOT after a@5; b@6 is
    assert (r["s0"], r["s1"]) == (5, 6)


def test_funnel_counts(spark):
    df = _ev(spark)
    steps = [F.col("event_type") == s for s in ("a", "b", "c")]
    got = {r["step"]: r["trails"] for r in analytics.funnel_counts(df, steps).collect()}
    assert got == {0: 2, 1: 1, 2: 1}


def test_retention_triangle(spark):
    # u1 active buckets {0,1,3}; u2 active {1}
    rows = [
        ("u1", 10, "x"),
        ("u1", 86_410, "x"),
        ("u1", 3 * 86_400 + 5, "x"),
        ("u2", 86_500, "x"),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    got = {(r["cohort"], r["offset"]): r["trails"] for r in analytics.retention(df).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_percentiles_exact_and_approx(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    got = {r["event_type"]: r for r in analytics.percentiles(df, probs=(0.5, 0.9)).collect()}
    assert got["a"]["p50"] == 50.5  # interpolated median of 1..100
    assert abs(got["a"]["p90"] - 90.1) < 1e-9  # 1 + 0.9*99, up to fp repr
    assert got["b"]["p50"] == 10.0
    # approx mode: same schema, values within rank-error of exact
    ap = {r["event_type"]: r for r in analytics.percentiles(df, probs=(0.5, 0.9), approx=True).collect()}
    assert abs(ap["a"]["p50"] - 50.5) <= 1.0


def test_funnel_within_window(spark):
    rows = [("u", 0, "a"), ("u", 100, "b"), ("u", 5, "b")]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    steps = [F.col("event_type") == "a", F.col("event_type") == "b"]
    # no window: earliest b after a is t=5
    r = analytics.funnel_times(df, steps).first()
    assert (r["s0"], r["s1"]) == (0, 5)
    # within=3: b@5 misses the window, b@100 too → chain breaks
    r = analytics.funnel_times(df, steps, within=3).first()
    assert (r["s0"], r["s1"]) == (0, None)
    # within=10: b@5 qualifies
    r = analytics.funnel_times(df, steps, within=10).first()
    assert (r["s0"], r["s1"]) == (0, 5)


def test_event_path_ngrams(spark):
    from traildb_spark.operators.analytics import event_path_ngrams

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "b"),
        ("u2", 1, "a"), ("u2", 2, "b"), ("u2", 3, "c"),
        ("u3", 1, "x"), ("u3", 2, "y"),  # shorter than k -> no path
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    got = {
        (r["s1"], r["s2"], r["s3"]): r["freq"]
        for r in event_path_ngrams(df, "event_type", 3).collect()
    }
    # windows never cross trail boundaries; (a,b,c) occurs in u1 and u2
    assert got == {("a", "b", "c"): 2, ("b", "c", "b"): 1}


def _attr_ev(spark):
    # u1: view@10, click@20, purchase@30(v=1.00), purchase@200000(v=2.50)
    #     (second purchase: last touch click@20 is outside lookback=100)
    # u2: purchase@5(v=0.40)  (no prior touch at all)
    # u3: click@1, view@2, purchase@50(v=10.00)  (last touch = view)
    rows = [
        ("u1", 10, 1, "view", 9.99),
        ("u1", 20, 2, "click", 0.0),
        ("u1", 30, 3, "purchase", 1.00),
        ("u1", 200000, 4, "purchase", 2.50),
        ("u2", 5, 5, "purchase", 0.40),
        ("u3", 1, 6, "click", 0.0),
        ("u3", 2, 7, "view", 0.0),
        ("u3", 50, 8, "purchase", 10.00),
    ]
    return spark.createDataFrame(
        rows, ["uuid", "time", "event_id", "event_type", "value"]
    )


def test_attribution_last_touch_lookback(spark):
    df = _attr_ev(spark)
    got = {
        r["channel"]: (r["conversions"], r["attributed_cents"])
        for r in analytics.attribution(
            df, "purchase", ["click", "view"], 100, "last_touch",
            "event_type", "value", "uuid", "time", "event_id",
        ).collect()
    }
    # u1@30 → click@20 (within 100); u1@200000 → expired; u2 → none;
    # u3@50 → view@2 (50-100 < 2, within)
    assert got == {
        "click": (1, 100),
        "view": (1, 1000),
        "(none)": (2, 290),
    }


def test_attribution_first_touch_ignores_lookback(spark):
    df = _attr_ev(spark)
    got = {
        r["channel"]: r["conversions"]
        for r in analytics.attribution(
            df, "purchase", ["click", "view"], 100, "first_touch",
            "event_type", "value", "uuid", "time", "event_id",
        ).collect()
    }
    # u1 both purchases → first touch view@10; u2 → none; u3 → click@1
    assert got == {"view": (2), "click": 1, "(none)": 1}


def test_attribution_strict_prefix(spark):
    # a touch AT the conversion row itself must not self-attribute
    rows = [("u", 7, 1, "click", 0.0), ("u", 7, 2, "purchase", 1.0)]
    df = spark.createDataFrame(
        rows, ["uuid", "time", "event_id", "event_type", "value"]
    )
    r = analytics.attribution(
        df, "purchase", ["click", "purchase"], None, "last_touch",
        "event_type", "value", "uuid", "time", "event_id",
    ).collect()
    # prefix is by row order (time, event_id): click@(7,1) precedes
    # purchase@(7,2) → attributed to click, never to itself
    assert {x["channel"] for x in r} == {"click"}


def test_attribution_bad_model_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        analytics.attribution(_attr_ev(spark), "purchase", [], None, "u_shaped")


def test_session_cooccurrence_basket(spark):
    # u1 session1: a,b,c (times 0,10,20); gap>30 → session2: a,b
    # u2 session1: a,b
    rows = [
        ("u1", 0, "a"), ("u1", 10, "b"), ("u1", 20, "c"),
        ("u1", 100, "a"), ("u1", 110, "b"),
        ("u2", 5, "a"), ("u2", 6, "b"),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    got = {
        (r["v1"], r["v2"]): (r["support"], r["lift_bits"])
        for r in analytics.session_cooccurrence(df, gap=30, min_support=1).collect()
    }
    # 3 sessions; (a,b) in all 3; (a,c),(b,c) in 1
    assert got[("a", "b")][0] == 3
    assert got[("a", "c")][0] == 1
    assert got[("b", "c")][0] == 1
    # lift_bits(a,b) = bits(3)+bits(3)-bits(3)-bits(3) = 0
    assert got[("a", "b")][1] == 0
    # lift_bits(a,c) = bits(1)+bits(3)-bits(3)-bits(1) = 0
    assert got[("a", "c")][1] == 0
    # min_support filters
    got2 = analytics.session_cooccurrence(df, gap=30, min_support=2).collect()
    assert {(r["v1"], r["v2"]) for r in got2} == {("a", "b")}


def test_burst_windows_peak_and_tiebreak(spark):
    # u1: events at 0,10,20, then 5000,5010 → peak 3 at t=20
    # u2: two equal peaks of 2 (at 10 and 5010) → earliest wins
    rows = [
        ("u1", 0), ("u1", 10), ("u1", 20), ("u1", 5000), ("u1", 5010),
        ("u2", 0), ("u2", 10), ("u2", 5000), ("u2", 5010),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time"])
    got = {
        r["uuid"]: (r["peak_events"], r["peak_time"])
        for r in analytics.burst_windows(df, window=3600).collect()
    }
    assert got["u1"] == (3, 20)
    assert got["u2"] == (2, 10)


def test_countmin_overestimates_and_merges(spark):
    rows = [(v,) for v in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]]
    df = spark.createDataFrame(rows, ["v"])
    vals = df.distinct()
    # narrow sketch: estimates may collide but never underestimate
    sk = analytics.countmin_build(df, "v", width=4, depth=2)
    est = {
        r["value"]: r["est"]
        for r in analytics.countmin_probe(sk, vals, "v", width=4, depth=2).collect()
    }
    true = {"a": 50, "b": 20, "c": 5, "d": 1}
    assert all(est[v] >= c for v, c in true.items())
    # wide sketch: exact
    skw = analytics.countmin_build(df, "v", width=4096, depth=4)
    estw = {
        r["value"]: r["est"]
        for r in analytics.countmin_probe(skw, vals, "v", width=4096, depth=4).collect()
    }
    assert estw == true
    # mergeable: union + re-sum == sketch of the concatenation
    h1, h2 = df.limit(30), df.subtract(spark.createDataFrame([], df.schema))
    s1 = analytics.countmin_build(h1, "v", width=4096, depth=4)
    s2 = analytics.countmin_build(df.exceptAll(h1), "v", width=4096, depth=4)
    merged = (
        s1.unionByName(s2).groupBy("d", "cell").agg(F.sum("c").alias("c"))
    )
    est_m = {
        r["value"]: r["est"]
        for r in analytics.countmin_probe(merged, vals, "v", width=4096, depth=4).collect()
    }
    assert est_m == true


def test_pattern_match_absence_constraint(spark):
    rows = [
        # u1: view@1, purchase@5 → matched
        ("u1", 1, 1, "view"), ("u1", 5, 2, "purchase"),
        # u2: view@1, error@3, purchase@5 → error between → not matched
        ("u2", 1, 3, "view"), ("u2", 3, 4, "error"), ("u2", 5, 5, "purchase"),
        # u3: error@1, view@3, purchase@5 → error BEFORE view → matched
        ("u3", 1, 6, "error"), ("u3", 3, 7, "view"), ("u3", 5, 8, "purchase"),
        # u4: purchase@5 with no view → not matched
        ("u4", 5, 9, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_id", "event_type"])
    got = {
        r["uuid"]: (r["n_then"], r["n_matched"])
        for r in analytics.pattern_match(
            df, "view", "purchase", "error", "event_type", "uuid", "time", "event_id"
        ).collect()
    }
    assert got == {"u1": (1, 1), "u2": (1, 0), "u3": (1, 1), "u4": (1, 0)}


def test_time_to_convert_buckets_and_censoring(spark):
    rows = [
        ("u1", 0, "signup"), ("u1", 100, "purchase"),          # bucket 1
        ("u2", 0, "signup"), ("u2", 250, "purchase"),          # bucket 2
        ("u3", 0, "signup"),                                   # censored
        ("u4", 50, "purchase"), ("u4", 60, "signup"),          # purchase BEFORE signup → censored
        ("u5", 0, "click"),                                    # never signed up → excluded
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_type"])
    got = {
        r["bucket"]: r["trails"]
        for r in analytics.time_to_convert(df, "signup", "purchase", bucket=100).collect()
    }
    assert got == {1: 1, 2: 1, -1: 2}


def test_rolling_active_window(spark):
    rows = [("u1", 0), ("u1", 90000), ("u2", 0)]  # u1 days 0,1; u2 day 0
    df = spark.createDataFrame(rows, ["uuid", "time"])
    got = {
        r["day"]: r["active_trails"]
        for r in analytics.rolling_active(df, window_days=2, period=86400).collect()
    }
    # u1 active in day-windows ending 0..1 (from day 0) and 1..2 (day 1);
    # u2 in windows 0..1 — but day 2 is AFTER the last observed day
    # (max d = 1): a prospective partial WAU row must not be emitted
    assert got == {0: 2, 1: 2}


def test_attribution_linear_credit_conserves(spark):
    rows = [
        # u1: click@1, view@2, purchase@10 → 2 touches: 5000 each
        ("u1", 1, 1, "click"), ("u1", 2, 2, "view"), ("u1", 10, 3, "purchase"),
        # u2: click@1, click@2, view@3, purchase@10 → 3 touches:
        #   10000//3=3333 each, most recent (view@3) gets 3334
        ("u2", 1, 4, "click"), ("u2", 2, 5, "click"), ("u2", 3, 6, "view"),
        ("u2", 10, 7, "purchase"),
        # u3: purchase@5 no touches → (none) 10000
        ("u3", 5, 8, "purchase"),
        # u4: touch outside lookback → (none)
        ("u4", 0, 9, "click"), ("u4", 1000, 10, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_id", "event_type"])
    got = {
        r["channel"]: (r["conversions_touched"], r["credit_bp"])
        for r in analytics.attribution_linear(
            df, "purchase", ["click", "view"], 100
        ).collect()
    }
    assert got["click"] == (2, 5000 + 2 * 3333)
    assert got["view"] == (2, 5000 + 3334)
    assert got["(none)"] == (2, 20000)
    total = sum(bp for _, bp in got.values())
    assert total == 4 * 10000  # exact conservation


def test_gap_histogram_bit_buckets(spark):
    rows = [
        ("u", 0, 1, "a"), ("u", 1, 2, "b"),     # gap 1 → bucket 1 (prev a)
        ("u", 4, 3, "a"),                        # gap 3 → bucket 2 (prev b)
        ("u", 4, 4, "c"),                        # gap 0 → bucket 0 (prev a)
        ("u", 1028, 5, "a"),                     # gap 1024 → bucket 11 (prev c)
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "event_id", "event_type"])
    got = {
        (r["value"], r["gap_bucket"]): r["n_gaps"]
        for r in analytics.gap_histogram(df, "event_type", "uuid", "time", "event_id").collect()
    }
    assert got == {("a", 1): 1, ("b", 2): 1, ("a", 0): 1, ("c", 11): 1}


def test_mg_summary_bounds_and_guarantee(spark):
    """Misra-Gries invariants: (1) every value with true count > N/(k+1)
    appears in the summary; (2) lo <= true <= hi for every reported
    value; (3) state stays <= k rows per partition regardless of the
    distinct-value universe; (4) heavy_hitters_exact returns EXACTLY the
    > N/(k+1) set with exact counts."""
    import numpy as np

    from traildb_spark.operators.analytics import heavy_hitters_exact, mg_summary

    rng = np.random.default_rng(23)
    # zipf-ish universe: few hot values over a wide cold tail
    hot = [f"hot{i}" for i in range(5)]
    vals = []
    for i, h in enumerate(hot):
        vals += [h] * (4000 // (i + 1))
    vals += [f"cold{i}" for i in range(6000)]  # 6000 singletons
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(7)
    n = len(vals)
    k = 50
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1

    summ = {r["value"]: (r["lo"], r["hi"]) for r in mg_summary(df, "v", k).collect()}
    guaranteed = {v for v, c in true.items() if c * (k + 1) > n}
    assert guaranteed  # the fixture must actually exercise the guarantee
    assert guaranteed <= set(summ), "frequent value missing from MG summary"
    for v, (lo, hi) in summ.items():
        assert lo <= true[v] <= hi, (v, lo, true[v], hi)
    assert len(summ) <= k * 7 + 7  # sketch-sized, never universe-sized

    got = {r["value"]: r["n"] for r in heavy_hitters_exact(df, "v", k).collect()}
    assert got == {v: true[v] for v in guaranteed}

    # tiny Arrow batches force MANY per-batch merge+trim steps per
    # partition — the invariants must hold under chunked arrival too
    old_conf = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
    try:
        summ2 = {
            r["value"]: (r["lo"], r["hi"])
            for r in mg_summary(df, "v", k).collect()
        }
        assert guaranteed <= set(summ2)
        for v, (lo, hi) in summ2.items():
            assert lo <= true[v] <= hi
        got2 = {
            r["value"]: r["n"] for r in heavy_hitters_exact(df, "v", k).collect()
        }
        assert got2 == got
    finally:
        if old_conf is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old_conf
            )


def test_sequence_match_order_ties_and_nulls(spark):
    """sequence_match renders trails ordered by (time, tiebreak), NULL
    as the empty token, and the regex is an unanchored search — the
    exact contract the oracle mirrors."""
    from traildb_spark.operators.analytics import sequence_match

    rows = [
        ("u1", 10, 1, "view"), ("u1", 20, 2, "click"), ("u1", 20, 3, "view"),
        ("u1", 30, 4, "purchase"),
        ("u2", 10, 1, "view"), ("u2", 20, 2, "error"), ("u2", 30, 3, "purchase"),
        ("u3", 5, 1, None), ("u3", 6, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, event_id long, event_type string")
    got = {
        r["uuid"]: r["seq"]
        for r in sequence_match(
            df, " view ((click|view) )*purchase ", "event_type",
            "uuid", "time", ("event_id",),
        ).collect()
    }
    # u1 matches and the tie at t=20 resolves by event_id (click before view)
    assert got == {"u1": " view click view purchase "}
    # NULL renders as the empty token (double space), matchable explicitly
    got2 = {r["uuid"] for r in sequence_match(df, "  purchase ", "event_type").collect()}
    assert got2 == {"u3"}


def test_sequence_match_whale_guard(spark):
    """The per-trail string materialization is guarded: a trail past
    max_events_per_trail raises loudly at execution; None bypasses."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from traildb_spark.operators.analytics import sequence_match

    rows = [("u1", t, t, "a") for t in range(50)] + [("u2", 1, 1, "b")]
    df = spark.createDataFrame(rows, "uuid string, time long, event_id long, event_type string")
    with _pytest.raises(Exception, match="max_events_per_trail"):
        try:
            sequence_match(df, " a ", max_events_per_trail=10).collect()
        except Py4JJavaError as e:
            raise RuntimeError(str(e)) from e
    got = {r["uuid"] for r in sequence_match(df, " a ", max_events_per_trail=None).collect()}
    assert got == {"u1"}


def test_sequence_match_rejects_spaced_values(spark):
    """The token contract is enforced, not just documented: a field value
    containing a space would silently split into two tokens — the
    aggregate raises on the first offending row instead. Clean
    vocabularies (including NULL -> empty token) are unaffected."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from traildb_spark.operators.analytics import sequence_match

    bad = spark.createDataFrame(
        [("u1", 1, 1, "view"), ("u1", 2, 2, "add to cart")],
        "uuid string, time long, event_id long, event_type string",
    )
    with _pytest.raises(Exception, match="contains a space"):
        try:
            sequence_match(bad, " view ").collect()
        except Py4JJavaError as e:
            raise RuntimeError(str(e)) from e

    ok = spark.createDataFrame(
        [("u1", 1, 1, "view"), ("u1", 2, 2, None), ("u2", 1, 1, "click")],
        "uuid string, time long, event_id long, event_type string",
    )
    got = {r["uuid"]: r["seq"] for r in sequence_match(ok, " view ").collect()}
    assert got == {"u1": " view  "}  # NULL renders as the empty token


def test_recency_scores_exact_dyadic(spark):
    # t_ref=1000, half_life=100: b = floor((1000 - t)/100) clamped >= 0.
    # u1: t=950 (b=0, w=2^40), t=850 (b=1, w=2^39), t=1050 (future, b=0).
    # u2: t=0 -> b=10, w=2^30; t far past horizon -> w=0.
    rows = [
        ("u1", 950), ("u1", 850), ("u1", 1050),
        ("u2", 0), ("u2", -999_999),
    ]
    df = spark.createDataFrame(rows, "uuid string, time long")
    got = {
        r["uuid"]: (r["score_q"], r["n_events"], r["last_seen"])
        for r in analytics.recency_scores(df, t_ref=1000, half_life=100).collect()
    }
    assert got["u1"] == (2**40 + 2**39 + 2**40, 3, 1050)
    assert got["u2"] == (2**30, 2, 0)


def test_recency_scores_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("u", 1)], "uuid string, time long")
    with _pytest.raises(ValueError, match="half_life"):
        analytics.recency_scores(df, t_ref=0, half_life=0)
    with _pytest.raises(ValueError, match="max_buckets"):
        analytics.recency_scores(df, t_ref=0, half_life=1, max_buckets=63)


def test_distribution_drift_exact_tvd(spark):
    # key k1: window A (t<100) values 0,0,15 -> bins {0:2, 1:1}, tot_a=3
    #         window B values 0,15,15,25    -> bins {0:1, 1:2, 2:1}, tot_b=4
    # numer = |2*4-1*3| + |1*4-2*3| + |0*4-1*3| = 5+2+3 = 10
    # tvd = 10/(2*3*4) = 0.41666... -> 416666 ppm (truncating)
    # key k2: only window A -> tvd_ppm NULL
    # NULL value forms its own bin: k3 has NULL in A and in B, identical -> 0
    rows = [
        ("k1", 50, 0.0), ("k1", 60, 5.0), ("k1", 70, 15.0),
        ("k1", 150, 3.0), ("k1", 160, 15.0), ("k1", 170, 19.0),
        ("k1", 180, 25.0),
        ("k2", 10, 1.0),
        ("k3", 20, None), ("k3", 120, None),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, time long, value double"
    )
    got = {
        r["key"]: (r["tot_a"], r["tot_b"], r["tvd_ppm"])
        for r in analytics.distribution_drift(
            df, t_split=100, bin_width=10.0
        ).collect()
    }
    assert got["k1"] == (3, 4, 416666)
    assert got["k2"] == (1, 0, None)
    assert got["k3"] == (1, 1, 0)


def test_distribution_drift_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("k", 1, 1.0)], "event_type string, time long, value double"
    )
    with _pytest.raises(ValueError, match="bin_width"):
        analytics.distribution_drift(df, t_split=0, bin_width=0)


def test_rolling_median_hand_computed(spark):
    # u1 values in time order: 1, 9, 5, NULL, 3  (k=3)
    # frames: [1]->1; [1,9]->5.0 (avg); [1,9,5]->5; [9,5,N]->7.0; [5,N,3]->4.0
    rows = [
        ("u1", 1, 1, 1.0), ("u1", 2, 2, 9.0), ("u1", 3, 3, 5.0),
        ("u1", 4, 4, None), ("u1", 5, 5, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, value double"
    )
    out = {
        r["event_id"]: (r["rolling_med"], r["n_window"])
        for r in analytics.rolling_median(df, k=3).collect()
    }
    assert out == {
        1: (1.0, 1), 2: (5.0, 2), 3: (5.0, 3), 4: (7.0, 2), 5: (4.0, 2),
    }


def test_rolling_median_tiebreak_and_validation(spark):
    import pytest as _pytest

    # same timestamp: event_id breaks the tie deterministically
    rows = [("u", 1, 2, 10.0), ("u", 1, 1, 0.0)]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, value double"
    )
    out = {
        r["event_id"]: r["rolling_med"]
        for r in analytics.rolling_median(df, k=2).collect()
    }
    assert out == {1: 0.0, 2: 5.0}
    with _pytest.raises(ValueError, match="k must be"):
        analytics.rolling_median(df, k=0)


def test_histogram_tvd_matches_distribution_drift(spark):
    # pairwise form on split histograms must equal the one-pass form,
    # including bins existing on only one side
    rows = [
        ("k", 10, 1.0), ("k", 20, 1.0), ("k", 30, 25.0),
        ("k", 110, 1.0), ("k", 120, 99.0), ("k", 130, 99.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, time long, value double")
    one = {
        r["key"]: (r["tot_a"], r["tot_b"], r["tvd_ppm"])
        for r in analytics.distribution_drift(df, t_split=100, bin_width=10.0).collect()
    }
    ha = analytics.value_histogram(df.filter("time < 100"), bin_width=10.0)
    hb = analytics.value_histogram(df.filter("time >= 100"), bin_width=10.0)
    two = {
        r["key"]: (r["tot_a"], r["tot_b"], r["tvd_ppm"])
        for r in analytics.histogram_tvd(ha, hb).collect()
    }
    assert one == two and one["k"][2] > 0


def test_trend_by_key_exact_slope(spark):
    # bucket_seconds=10. Global buckets 0..3 (n=4): Sx=6, Sxx=14.
    # k_up counts per bucket: [1, 2, 3, 4] (present every bucket)
    #   sum_y=10, sum_xy=0+2+6+12=20; num=4*20-6*10=20; den=4*14-36=20
    #   slope=1 exactly -> ppm 1_000_000
    # k_gap: events only in buckets 0 (y=2) and 3 (y=0-filled others)
    #   counts [2,0,0,1]: sum_y=3, sum_xy=3; num=12-18=-6; den=20
    #   slope=-0.3 -> ppm -300000
    rows = (
        [("k_up", t) for t in [5, 12, 15, 22, 25, 27, 31, 33, 35, 38]]
        + [("k_gap", 1), ("k_gap", 2), ("k_gap", 30)]
    )
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        r["key"]: (
            r["n_buckets"], r["total"], r["slope_num"], r["slope_den"],
            r["slope_ppm_per_bucket"],
        )
        for r in analytics.trend_by_key(df, bucket_seconds=10).collect()
    }
    assert got["k_up"] == (4, 10, 20, 20, 1_000_000)
    assert got["k_gap"] == (4, 3, -6, 20, -300_000)


def test_trend_by_key_single_bucket_null(spark):
    df = spark.createDataFrame(
        [("k", 1), ("k", 2)], "event_type string, time long"
    )
    [r] = analytics.trend_by_key(df, bucket_seconds=100).collect()
    assert r["n_buckets"] == 1 and r["slope_num"] is None
    assert r["slope_ppm_per_bucket"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_seconds"):
        analytics.trend_by_key(df, bucket_seconds=0)


def test_anomalous_buckets_spike_and_blackout(spark):
    # k1, bucket_seconds=10, range buckets 0..9 (n=10): counts
    # [1]*9 + one spike bucket with 11 -> S=20, Q=9+121=130
    # mean=2, var=(10*130-400)/100=9 -> sigma 3; k=2 -> bound 4*900=3600
    # spike y=11: dev=(10*11-20)^2=8100 > 3600 -> flagged
    # normal y=1: dev=(10-20)^2=100 -> not flagged
    rows = [("k1", b * 10) for b in range(9)] + [
        ("k1", 95)] * 11
    # note: bucket 9 gets 11 events, buckets 0..8 one each -> exactly above
    df = spark.createDataFrame(rows, "event_type string, time long")
    out = {
        (r["key"], r["bucket"]): (r["y"], r["dev_num"], r["bound_num"])
        for r in analytics.anomalous_buckets(
            df, bucket_seconds=10, k=2
        ).collect()
    }
    assert out == {("k1", 9): (11, 8100, 3600)}


def test_anomalous_buckets_zero_bucket_flagged(spark):
    # k constant at 10/bucket except one missing bucket (y=0):
    # buckets 0,1,3 present (10 each), bucket 2 absent.
    # n=4, S=30, Q=300; var=(4*300-900)/16=18.75, mean 7.5
    # zero bucket: dev=(0-30)^2=900; k=1 -> bound=1*(1200-900)=300
    # 900 > 300 -> blackout flagged; present buckets: dev=(40-30)^2=100 < 300
    rows = [("k", b * 10 + i) for b in (0, 1, 3) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    out = {
        r["bucket"]: r["y"]
        for r in analytics.anomalous_buckets(df, bucket_seconds=10, k=1).collect()
    }
    assert out == {2: 0}


def test_anomalous_buckets_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("k", 1)], "event_type string, time long")
    with _pytest.raises(ValueError, match="bucket_seconds"):
        analytics.anomalous_buckets(df, bucket_seconds=0)
    with _pytest.raises(ValueError, match="k must be"):
        analytics.anomalous_buckets(df, k=0)


def test_attribution_markov_hand_computed(spark):
    # journeys: u1 A->CONV, u2 A->B->CONV, u3 B->(no conv)
    # chain: START{A:2/3,B:1/3} A{CONV:1/2,B:1/2} B{CONV:1/2,NULL:1/2}
    # P(conv)=2/3; remove A -> 1/6 (effect 3/4); remove B -> 1/3 (effect 1/2)
    # credits: 2 conversions split 3/4 : 1/2 -> A 1.2, B 0.8
    rows = [
        ("u1", 1, "A"), ("u1", 2, "conv"),
        ("u2", 1, "A"), ("u2", 2, "B"), ("u2", 3, "conv"),
        ("u3", 1, "B"),
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, event_type string")
    got = {
        r["channel"]: (r["removal_effect"], r["attributed_conversions"])
        for r in analytics.attribution_markov(df, "conv", ["A", "B"]).collect()
    }
    assert abs(got["A"][0] - 0.75) < 1e-9 and abs(got["A"][1] - 1.2) < 1e-9
    assert abs(got["B"][0] - 0.5) < 1e-9 and abs(got["B"][1] - 0.8) < 1e-9


def test_attribution_markov_matches_sequential_reference(spark, sf_dir):
    """Differential test: the distributed transition counting + solve
    must match an independent sequential Python implementation that
    walks each trail, segments journeys, counts transitions and runs
    the same removal-effect definition via fixed-point iteration
    (NOT a linear solve — independent numerics)."""
    from collections import Counter, defaultdict

    from tests.conftest import load_events

    ev = load_events(spark, sf_dir)
    touches = ["click", "view", "error"]
    conv = "purchase"
    got = {
        r["channel"]: (r["removal_effect"], r["attributed_conversions"])
        for r in analytics.attribution_markov(ev, conv, touches).collect()
    }

    # --- sequential reference ---
    trails = defaultdict(list)
    for r in ev.collect():
        if r["event_type"] in touches or r["event_type"] == conv:
            trails[r["uuid"]].append((r["time"], r["event_type"]))
    counts = Counter()
    n_conv = 0
    for uuid, evs in trails.items():
        evs.sort()
        journey = ["__START__"]
        for _, s in evs:
            journey.append(s)
            if s == conv:
                n_conv += 1
                for a, b in zip(journey, journey[1:]):
                    counts[(a, b)] += 1
                journey = ["__START__"]
        if len(journey) > 1:
            journey.append("__NULL__")
            for a, b in zip(journey, journey[1:]):
                counts[(a, b)] += 1

    def p_conv(removed=None):
        out_tot, to = Counter(), defaultdict(Counter)
        for (a, b), c in counts.items():
            if a == removed:
                continue
            out_tot[a] += c
            to[a][b] += c

        # iterative absorption: value iteration until convergence
        states = {a for a in out_tot}
        v = {s: 0.0 for s in states}
        for _ in range(10000):
            nv = {}
            for s in states:
                tot = out_tot[s]
                acc = 0.0
                for b, c in to[s].items():
                    if b == removed:
                        continue  # redirected to NULL
                    if b == conv:
                        acc += c / tot
                    elif b in states:
                        acc += c / tot * v[b]
                nv[s] = acc
            if max(abs(nv[s] - v[s]) for s in states) < 1e-14:
                v = nv
                break
            v = nv
        return v.get("__START__", 0.0)

    base = p_conv()
    effects = {}
    for t in touches:
        if any(t in (a, b) for (a, b) in counts):
            effects[t] = 1.0 - p_conv(removed=t) / base
    tot_eff = sum(effects.values())
    for t, e in effects.items():
        assert abs(got[t][0] - e) < 1e-9, (t, got[t][0], e)
        assert abs(got[t][1] - n_conv * e / tot_eff) < 1e-6
    assert set(got) == set(effects)


def test_hll_distinct_accuracy_and_determinism(spark):
    # 6000 distinct values at p=10 (m=1024, raw-estimator range starts
    # ~2.5m=2560): estimate within 10% of truth; identical under
    # repartitioning (the dyadic-exact sum claim)
    df = spark.range(6000).select(F.concat_ws("-", F.lit("v"), F.col("id")).alias("v"))
    a = analytics.hll_distinct(df, "v", p=10).collect()[0]
    b = analytics.hll_distinct(df.repartition(13), "v", p=10).collect()[0]
    assert a["m"] == 1024
    assert abs(a["estimate"] - 6000) / 6000 < 0.10
    assert (a["numer_d"], a["estimate"], a["n_present"]) == (
        b["numer_d"], b["estimate"], b["n_present"])
    # duplicates don't move the sketch
    c = analytics.hll_distinct(
        df.union(df).union(df), "v", p=10
    ).collect()[0]
    assert c["estimate"] == a["estimate"]


def test_hll_distinct_empty_and_validation(spark):
    df = spark.createDataFrame([], "v string")
    [r] = analytics.hll_distinct(df, "v", p=4).collect()
    assert r["n_present"] == 0 and r["numer_d"] == float(16 * 2**57)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="p must be"):
        analytics.hll_distinct(df, "v", p=3)


def test_volume_correlation_hand_computed(spark):
    # bucket=10, range buckets 0..2 (n=3)
    # A counts [1,2,3]; B counts [2,4,6] -> perfectly correlated (+1)
    # C counts [3,0,0] (zero-filled) vs A: num=3*3-6*3=-9,
    #   dxA=3*14-36=6, dyC=3*9-9=18 -> corr=-9/sqrt(108)=-0.866025
    rows = (
        [("A", 5)] + [("A", 15)] * 2 + [("A", 25)] * 3
        + [("B", 1)] * 2 + [("B", 11)] * 4 + [("B", 21)] * 6
        + [("C", 2)] * 3
    )
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        (r["key_a"], r["key_b"]): r["corr"]
        for r in analytics.volume_correlation_pairs(df, bucket_seconds=10).collect()
    }
    assert got[("A", "B")] == 1.0
    assert got[("A", "C")] == -0.866025
    assert got[("B", "C")] == -0.866025


def test_volume_correlation_constant_key_null(spark):
    # D constant 1/bucket -> zero variance -> NULL corr in its pairs
    rows = [("A", 5), ("A", 15), ("A", 15), ("D", 5), ("D", 15)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        (r["key_a"], r["key_b"]): r["corr"]
        for r in analytics.volume_correlation_pairs(df, bucket_seconds=10).collect()
    }
    assert got == {("A", "D"): None}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_seconds"):
        analytics.volume_correlation_pairs(df, bucket_seconds=0)


def test_cdf_drift_ks_and_gap_weighted_emd(spark):
    # k: A values {0, 10} (bins 0,1); B values {30} (bin 3); tot 2/1
    # cum lattice |cum_a*tot_b - cum_b*tot_a| at bins:
    #   bin0: |1*1-0*2|=1 gap 1; bin1: |2*1-0|=2 gap 2; bin3: |2-2|=0
    # KS = max = 2 -> ks_ppm = 2*1e6 div (2*1) = 1_000_000 (full shift)
    # EMD = 1*1 + 2*2 = 5 -> emd_ppm = 5*1e6 div 2 = 2_500_000 (2.5 bins)
    rows = [("k", 10, 0.0), ("k", 20, 10.0), ("k", 150, 30.0),
            ("k", 30, None)]  # NULL excluded from CDF stats
    df = spark.createDataFrame(rows, "event_type string, time long, value double")
    [r] = analytics.cdf_drift(df, t_split=100, bin_width=10.0).collect()
    assert (r["tot_a"], r["tot_b"]) == (2, 1)
    assert r["ks_ppm"] == 1_000_000
    assert r["emd_ppm_bins"] == 2_500_000


def test_cdf_drift_identical_windows_zero(spark):
    rows = [("k", 10, 5.0), ("k", 150, 5.0)]
    df = spark.createDataFrame(rows, "event_type string, time long, value double")
    [r] = analytics.cdf_drift(df, t_split=100, bin_width=10.0).collect()
    assert r["ks_ppm"] == 0 and r["emd_ppm_bins"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_width"):
        analytics.cdf_drift(df, t_split=0, bin_width=0)


def test_histogram_percentiles_nearest_rank(spark):
    # k: values 0..99 (bin_width 10 -> bins 0..9, 10 each)
    # nearest-rank p50: cum >= 50 -> bin 4 (cum 50); p90: cum >= 90 ->
    # bin 8; p99: cum >= 99 -> bin 9; p100 -> bin 9
    rows = [("k", float(v)) for v in range(100)] + [("k", None)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    [r] = analytics.histogram_percentiles(
        df, probs=(0.5, 0.9, 0.99, 1.0), bin_width=10.0
    ).collect()
    assert r["n_values"] == 100  # NULL excluded
    assert (r["p50_bin"], r["p90_bin"], r["p99_bin"], r["p100_bin"]) == (
        4, 8, 9, 9)
    assert r["p50"] == 40.0 and r["p90"] == 80.0


def test_histogram_percentiles_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("k", 1.0)], "event_type string, value double")
    with _pytest.raises(ValueError, match="bin_width"):
        analytics.histogram_percentiles(df, bin_width=0)
    with _pytest.raises(ValueError, match="out of"):
        analytics.histogram_percentiles(df, probs=(0.0,))
    with _pytest.raises(ValueError, match="multiple"):
        analytics.histogram_percentiles(df, probs=(0.12345,))


def test_hll_by_key_accuracy_per_key(spark):
    rows = [("a", f"a-{i}") for i in range(4000)] + [
        ("b", f"b-{i % 40}") for i in range(4000)  # only 40 distinct
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r["key"]: r for r in
           analytics.hll_distinct_by_key(df, "k", "v", p=10).collect()}
    assert abs(got["a"]["estimate"] - 4000) / 4000 < 0.10
    # 40 distinct << 2.5m: raw estimator floor, but monotonically far
    # below key a (the per-key separation is what the op is for)
    assert got["b"]["estimate"] < got["a"]["estimate"] / 2


def test_conversion_rates_wilson(spark):
    # 4 trails, 1 converts: rate 0.25; Wilson bounds vs scipy-free
    # closed form computed here in python with the same float ops
    rows = [
        ("u1", "purchase"), ("u1", "click"),
        ("u2", "click"), ("u3", "view"), ("u4", "click"),
    ]
    df = spark.createDataFrame(rows, "uuid string, event_type string")
    [r] = analytics.conversion_rates(df, "purchase").collect()
    assert (r["n_trails"], r["n_converted"], r["rate"]) == (4, 1, 0.25)
    import math

    n, x, z = 4.0, 1.0, 1.96
    z2 = z * z
    p = x / n
    denom = 1.0 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4 * n * n)) / denom
    assert abs(r["wilson_lo"] - round(center - half, 6)) <= 1e-6
    assert abs(r["wilson_hi"] - round(center + half, 6)) <= 1e-6
    assert 0 <= r["wilson_lo"] < r["rate"] < r["wilson_hi"] <= 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="z must be"):
        analytics.conversion_rates(df, "purchase", z=0)


def test_trail_entropy_whole_bit(spark):
    # u1: 4 events of one type -> cnt=4 bits=3, n=4 bits=3 ->
    #   1000*(4*3 - 4*3) div 4 = 0 (monotone bot)
    # u2: 2+2 of two types -> n=4 bits 3; each cnt=2 bits 2 ->
    #   1000*(12 - 8) div 4 = 1000 millibits (exactly 1 bit: true H=1)
    # u3: 3+1 -> n=4: 1000*(12 - (3*2 + 1*1)) div 4 = 1250
    rows = (
        [("u1", "a")] * 4
        + [("u2", "a")] * 2 + [("u2", "b")] * 2
        + [("u3", "a")] * 3 + [("u3", "b")]
    )
    df = spark.createDataFrame(rows, "uuid string, event_type string")
    got = {
        r["uuid"]: (r["n_events"], r["n_distinct"], r["entropy_millibits"])
        for r in analytics.trail_entropy(df).collect()
    }
    assert got == {"u1": (4, 1, 0), "u2": (4, 2, 1000), "u3": (4, 2, 1250)}


def test_session_funnel_resets_across_sessions(spark):
    # u1 session0: a@0 b@10 (complete); session1 (gap>1800): a@10000
    # only — the whole-trail funnel would credit b@10 BEFORE a@10000?
    # no: whole-trail latches a@0,b@10; the session form must give
    # session1 an incomplete funnel instead of inheriting session0's.
    rows = [
        ("u1", 0, "a"), ("u1", 10, "b"),
        ("u1", 10000, "a"), ("u1", 10005, "b"),
        ("u2", 0, "b"),  # step-0 never fires
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, event_type string")
    steps = [F.col("event_type") == "a", F.col("event_type") == "b"]
    got = {
        (r["uuid"], r["session_id"]): (r["s0"], r["s1"])
        for r in analytics.session_funnel(df, steps, gap=1800).collect()
    }
    assert got == {
        ("u1", 0): (0, 10),
        ("u1", 1): (10000, 10005),
        ("u2", 0): (None, None),
    }


def test_transition_entropy_predictable_vs_branching(spark):
    # A always -> B (entropy 0); B branches to A/C evenly (1 bit)
    rows = [
        ("u", 1, "A"), ("u", 2, "B"), ("u", 3, "A"), ("u", 4, "B"),
        ("u", 5, "C"), ("u", 6, "B"), ("u", 7, "A"), ("u", 8, "B"),
        ("u", 9, "C"),
    ]
    # transitions: A->B x3; B->A x2? sequence: A B A B C B A B C
    # pairs: AB, BA, AB, BC, CB, BA, AB, BC
    # A: {B:3} -> 0 bits; B: {A:2, C:2} n=4 -> 1000*(4*3-(2*2+2*2))div4=1000
    # C: {B:1} n=1 -> 0
    df = spark.createDataFrame(rows, "uuid string, time long, event_type string")
    got = {
        r["src"]: (r["n_out"], r["n_dst"], r["entropy_millibits"])
        for r in analytics.transition_entropy(df).collect()
    }
    assert got == {"A": (3, 1, 0), "B": (4, 2, 1000), "C": (1, 1, 0)}


def test_survival_table_hand_computed(spark):
    """4 users, obs_end = 100: u1 lifetime 0 (single event, silent 90 >
    gap 50 -> churned@0), u2 lifetime 25 (silent 60 -> churned@2),
    u3 lifetime 30 (silent 10 -> censored@3), u4 lifetime 35 ending AT
    obs_end (silent 0 -> censored@3). bucket=10."""
    rows = [
        ("u1", 10),
        ("u2", 15), ("u2", 40),
        ("u3", 60), ("u3", 90),
        ("u4", 65), ("u4", 100),
    ]
    df = spark.createDataFrame(rows, "uuid string, time long")
    got = {
        r["duration_bucket"]: (r["at_risk"], r["churned"], r["censored"])
        for r in analytics.survival_table(
            df, churn_gap_seconds=50, bucket_seconds=10
        ).collect()
    }
    assert got == {0: (4, 1, 0), 2: (3, 1, 0), 3: (2, 0, 2)}


def test_survival_table_validates_args(spark):
    df = spark.createDataFrame([("u", 1)], "uuid string, time long")
    import pytest
    with pytest.raises(ValueError):
        analytics.survival_table(df, churn_gap_seconds=-1)
    with pytest.raises(ValueError):
        analytics.survival_table(df, bucket_seconds=0)


def test_diurnal_profile_hand_computed(spark):
    """cron: 4 events all at hour 2 -> peak 2, ppm 1e6, entropy 0.
    human: 2 at hour 1, 2 at hour 5 -> tie breaks to EARLIEST hour;
    entropy of (2,2): 1000*(4*3 - 2*2*2 - ... whole-bit: bits(4)=3,
    bits(2)=2 -> 1000*(12-8)//4 = 1000."""
    rows = [
        ("cron", 2 * 3600), ("cron", 2 * 3600 + 60),
        ("cron", 26 * 3600), ("cron", 50 * 3600 + 5),
        ("human", 1 * 3600), ("human", 25 * 3600),
        ("human", 5 * 3600), ("human", 29 * 3600),
    ]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        r["key"]: (
            r["n_events"], r["peak_hour"], r["peak_ppm"],
            r["hours_active"], r["entropy_millibits"],
        )
        for r in analytics.diurnal_profile(df).collect()
    }
    assert got == {
        "cron": (4, 2, 1000000, 1, 0),
        "human": (4, 1, 500000, 2, 1000),
    }


def test_diurnal_profile_tz_offset_shifts_hours(spark):
    df = spark.createDataFrame([("a", 0)], "event_type string, time long")
    r = analytics.diurnal_profile(df, tz_offset_seconds=3 * 3600).collect()[0]
    assert r["peak_hour"] == 3


def test_volume_autocorrelation_perfect_period(spark):
    """Volume alternating 2,1,2,1,... over 8 buckets: lag-2 correlation
    is exactly +1, lag-1 exactly -1 (interior n keeps the series
    balanced); checked against python floats on the same closed form."""
    rows = []
    for b in range(8):
        n = 2 if b % 2 == 0 else 1
        rows += [("a", b * 3600 + i) for i in range(n)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        r["lag"]: (r["n_buckets"], r["autocorr"])
        for r in analytics.volume_autocorrelation(df, lags=[1, 2]).collect()
    }
    assert got == {1: (7, -1.0), 2: (6, 1.0)}


def test_volume_autocorrelation_constant_is_null(spark):
    rows = [("a", b * 3600) for b in range(6)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = analytics.volume_autocorrelation(df, lags=[1]).collect()
    assert len(got) == 1 and got[0]["autocorr"] is None


def test_volume_autocorrelation_zero_filled_gap(spark):
    """A key observed only at buckets 0 and 10: the zero-filled range
    makes n = 11 - k; the conditional sub-range sums must count the
    missing buckets as zeros, matching a python reference exactly."""
    import math
    rows = [("a", 0), ("a", 1), ("a", 10 * 3600)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {r["lag"]: r["autocorr"]
           for r in analytics.volume_autocorrelation(df, lags=[1, 10]).collect()}
    series = [2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    def ref(k):
        x, y = series[:-k], series[k:]
        n = len(x)
        sx, sy = sum(x), sum(y)
        qx, qy = sum(v*v for v in x), sum(v*v for v in y)
        sxy = sum(a*b for a, b in zip(x, y))
        num, dx, dy = n*sxy - sx*sy, n*qx - sx*sx, n*qy - sy*sy
        if dx <= 0 or dy <= 0:
            return None
        v = num / math.sqrt(dx * dy)
        from decimal import Decimal, ROUND_HALF_UP
        return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
    # lag 10 leaves n = 1 < 2: the operator drops the row entirely
    assert got == {1: ref(1)}


def test_volume_autocorrelation_validates_args(spark):
    import pytest
    df = spark.createDataFrame([("a", 1)], "event_type string, time long")
    with pytest.raises(ValueError):
        analytics.volume_autocorrelation(df, bucket_seconds=0)
    with pytest.raises(ValueError):
        analytics.volume_autocorrelation(df, lags=[0])
    with pytest.raises(ValueError):
        analytics.volume_autocorrelation(df, lags=[])


def test_robot_trails_hand_computed(spark):
    """Perfect 10s clock -> cv2 0, robot. Irregular human -> large cv2.
    Single-timestamp trail -> NULL cv2, never a robot. Short trail ->
    below min_events."""
    rows = (
        [("bot", 100 + 10 * i, i) for i in range(12)]
        + [("hum", t, i) for i, t in enumerate(
            [0, 7, 9, 30, 31, 55, 80, 81, 90, 140, 141, 200])]
        + [("few", 5, 0), ("few", 9, 1)]
        + [("zero", 50, 0), ("zero", 50, 1), ("zero", 50, 2)]
    )
    df = spark.createDataFrame(rows, "uuid string, time long, event_id long")
    got = {
        r.uuid: (r.n_events, r.mean_gap, r.cv2_ppm, r.is_robot)
        for r in analytics.robot_trails(
            df, min_events=10, max_cv2_ppm=10_000
        ).collect()
    }
    # hum reference: n*sum(g^2) - s^2 over s^2, scaled 1e6, truncated
    ts = [0, 7, 9, 30, 31, 55, 80, 81, 90, 140, 141, 200]
    gs = [b - a for a, b in zip(ts, ts[1:])]
    n, s, q = len(gs), sum(gs), sum(g * g for g in gs)
    hum_cv2 = (1_000_000 * (n * q - s * s)) // (s * s)
    assert got == {
        "bot": (12, 10, 0, True),
        "hum": (12, s // n, hum_cv2, False),
        "few": (2, 4, 0, False),
        "zero": (3, 0, None, False),
    }


def test_robot_trails_validates_args(spark):
    import pytest
    df = spark.createDataFrame([("u", 1, 0)], "uuid string, time long, event_id long")
    with pytest.raises(ValueError):
        analytics.robot_trails(df, min_events=1)


def test_burstiness_index_hand_computed(spark):
    """'clock': 1 event in each of 4 buckets -> variance 0 -> fano 0.
    'burst': 4 events in one bucket over the same 4-bucket range ->
    S=4, Q=16, n=4: fano = (4*16-16)*1e6 // (4*4) = 3_000_000."""
    rows = (
        [("clock", b * 3600) for b in range(4)]
        + [("burst", 10) for _ in range(4)]
        + [("burst", 3 * 3600)]  # pins burst's range... actually global range
    )
    # global range = buckets 0..3 from 'clock'; drop the pin row for clarity
    rows = rows[:-1]
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        r.key: (r.n_buckets, r.n_events, r.fano_ppm)
        for r in analytics.burstiness_index(df).collect()
    }
    assert got == {
        "clock": (4, 4, 0),
        "burst": (4, 4, 3000000),
    }


def test_burstiness_index_validates_args(spark):
    import pytest
    df = spark.createDataFrame([("a", 1)], "event_type string, time long")
    with pytest.raises(ValueError):
        analytics.burstiness_index(df, bucket_seconds=0)


def test_time_weighted_average_hand_computed(spark):
    """LOCF integral: value 1.00 for 10s then 3.00 for 30s over a 40s
    span -> (100*10 + 300*30) / 40 = 250 cents (NOT the 200-cent
    arithmetic mean). Single-event trail reports its own cents.
    Negative values truncate toward zero (Spark div semantics)."""
    rows = [
        ("u1", 0, 1, 1.00), ("u1", 10, 2, 3.00), ("u1", 40, 3, 9.99),
        ("one", 5, 4, 7.25),
        ("neg", 0, 5, -1.00), ("neg", 3, 6, 0.0),   # ws = -300, span 3
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, event_id long, value double")
    got = {r.uuid: (r.n_events, r.span_seconds, r.twap_cents)
           for r in analytics.time_weighted_average(df).collect()}
    assert got == {
        "u1": (3, 40, 250),
        "one": (1, 0, 725),
        "neg": (2, 3, -100),
    }


def test_ohlc_bars_hand_computed(spark):
    """Open/close pick by (time, event_id) order incl. same-timestamp
    ties; high/low independent of order."""
    rows = [
        ("a", 10, 1, 5.00), ("a", 10, 2, 1.00),    # tie: open by event_id
        ("a", 3599, 3, 9.00),
        ("a", 3600, 4, 2.50),                       # next bucket
    ]
    df = spark.createDataFrame(rows, "event_type string, time long, event_id long, value double")
    got = {(r.key, r.bucket): (r.n_events, r.open_cents, r.high_cents,
                               r.low_cents, r.close_cents)
           for r in analytics.ohlc_bars(df).collect()}
    assert got == {
        ("a", 0): (3, 500, 900, 100, 900),
        ("a", 1): (1, 250, 250, 250, 250),
    }
    import pytest
    with pytest.raises(ValueError):
        analytics.ohlc_bars(df, bucket_seconds=0)


def test_trail_value_outliers_hand_computed(spark):
    """One spike in an otherwise-flat trail flags exactly that event;
    constant trails and short trails flag nothing."""
    rows = (
        [("u1", t, t, 1.00) for t in range(6)] + [("u1", 6, 6, 50.00)]
        + [("flat", t, 10 + t, 2.00) for t in range(6)]
        + [("short", 0, 100, 0.0), ("short", 1, 101, 99.0)]
    )
    df = spark.createDataFrame(rows, "uuid string, time long, event_id long, value double")
    got = analytics.trail_value_outliers(df, k=2, min_events=5).collect()
    assert [(r.uuid, r.time, r.cents) for r in got] == [("u1", 6, 5000)]
    r = got[0]
    # exact-integer magnitudes: n=7, S=5600, Q=25060000
    n, S, Q, c = 7, 600 + 5000, 6 * 100 * 100 + 5000 * 5000, 5000
    assert r.dev_num == float((n * c - S) ** 2)
    assert r.bound_num == float(4 * (n * Q - S * S))
    import pytest
    with pytest.raises(ValueError):
        analytics.trail_value_outliers(df, k=0)
    with pytest.raises(ValueError):
        analytics.trail_value_outliers(df, min_events=1)


def test_cusum_changepoint_hand_computed(spark):
    """'shift': counts 1,1,1,3,3,3 over buckets 0..5 -> D_i =
    |6*S_i - 12i| peaks at 18 for i=3 -> cp_bucket 2, rates 1000/3000.
    'flat': 1/bucket -> D == 0 everywhere, earliest boundary wins.
    'late': 2 events only in bucket 5 with the range pinned 0..5 by the
    other keys -> the leading zero plateau's endpoint i=5 (D = 10) beats
    the observed bucket (D = 0): the zero-fill candidates matter."""
    rows = (
        [("shift", b * 3600) for b in range(3)]
        + [("shift", b * 3600) for b in range(3, 6) for _ in range(3)]
        + [("flat", b * 3600) for b in range(6)]
        + [("late", 5 * 3600), ("late", 5 * 3600 + 10)]
    )
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {
        r.key: (
            r.n_buckets, r.n_events, r.cp_bucket, r.cp_index,
            r.cusum_stat, r.rate_before_ppm_mille, r.rate_after_ppm_mille,
        )
        for r in analytics.cusum_changepoint(df).collect()
    }
    assert got == {
        "shift": (6, 12, 2, 3, 18.0, 1000, 3000),
        "flat": (6, 6, 0, 1, 0.0, 1000, 1000),
        "late": (6, 2, 4, 5, 10.0, 0, 2000),
    }


def test_cusum_changepoint_single_bucket_and_args(spark):
    import pytest
    df = spark.createDataFrame([("solo", 100)], "event_type string, time long")
    [r] = analytics.cusum_changepoint(df).collect()
    assert (r.n_buckets, r.n_events) == (1, 1)
    assert r.cp_bucket is None and r.cusum_stat is None
    assert r.rate_before_ppm_mille is None and r.rate_after_ppm_mille is None
    with pytest.raises(ValueError):
        analytics.cusum_changepoint(df, bucket_seconds=0)


def test_ab_conversion_test_hand_computed(spark):
    """A: 4 trails / 2 conversions, B: 4 / 1 -> diff = 2*4-1*4 = 4,
    z2 = 16*8/(4*4*3*5) = 0.5333..., rates 500000/250000 ppm, not
    significant. C/D pair has zero pooled conversions -> NULL z2."""
    rows = []
    for i in range(4):
        rows += [(f"a{i}", "A", "view"), (f"b{i}", "B", "view")]
    rows += [("a0", "A", "purchase"), ("a1", "A", "purchase"),
             ("b0", "B", "purchase"),
             ("c0", "C", "view"), ("d0", "D", "view")]
    df = spark.createDataFrame(rows, "uuid string, variant string, event_type string")
    out = {(r.variant_a, r.variant_b): r
           for r in analytics.ab_conversion_test(df).collect()}
    ab = out[("A", "B")]
    assert (ab.n_a, ab.conv_a, ab.n_b, ab.conv_b) == (4, 2, 4, 1)
    assert (ab.rate_a_ppm, ab.rate_b_ppm) == (500000, 250000)
    assert abs(ab.z2 - 128.0 / 240.0) < 1e-15 and ab.significant_95 is False
    cd = out[("C", "D")]
    assert cd.z2 is None and cd.significant_95 is None
    # an overwhelming split is significant: E 50/50 vs F 50/0
    rows2 = [(f"e{i}", "E", "purchase") for i in range(50)]
    rows2 += [(f"f{i}", "F", "view") for i in range(50)]
    df2 = spark.createDataFrame(rows2, "uuid string, variant string, event_type string")
    [ef] = analytics.ab_conversion_test(df2).collect()
    assert ef.significant_95 is True and ef.z2 == 100.0


def test_pagerank_transitions_hand_computed(spark):
    """Two-node cycle a->b->a (one trail 'a b a b'): symmetric graph ->
    both ranks equal base + 85% of the other's full rank; 1 iteration
    from r0 = SCALE/2 gives each 75000000000 + 425000000000 =
    500000000000 (mass conserved, no dangling). A sink variant
    'x -> y' (trail 'x y'): y never redistributes, so total mass
    decays; hand-roll the same integer recurrence in python and
    compare bit-for-bit over 10 iterations."""
    from traildb_spark.operators.analytics import (
        PAGERANK_SCALE, pagerank_transitions,
    )

    cyc = [("u", t, v) for t, v in enumerate(["a", "b", "a", "b"])]
    df = spark.createDataFrame(cyc, "uuid string, time long, event_type string")
    got = {r.event_type: r.rank_q12
           for r in pagerank_transitions(df, iterations=1).collect()}
    base = 15 * PAGERANK_SCALE // (100 * 2)
    each = base + 85 * (PAGERANK_SCALE // 2) // 100
    assert got == {"a": each, "b": each}

    sink = [("u", 0, "x"), ("u", 1, "y")]
    df2 = spark.createDataFrame(sink, "uuid string, time long, event_type string")
    got2 = {r.event_type: r.rank_q12
            for r in pagerank_transitions(df2, iterations=10).collect()}
    # python mirror: edges {(x,y):1}, outw x=1, y dangling
    r = {"x": PAGERANK_SCALE // 2, "y": PAGERANK_SCALE // 2}
    b2 = 15 * PAGERANK_SCALE // 200
    for _ in range(10):
        c = {"x": 0, "y": r["x"] * 1 // 1}
        r = {v: b2 + 85 * c[v] // 100 for v in ("x", "y")}
    assert got2 == r and got2["y"] > got2["x"]


def test_pagerank_transitions_validates_args(spark):
    import pytest
    df = spark.createDataFrame(
        [("u", 0, "a"), ("u", 1, "b")], "uuid string, time long, event_type string")
    with pytest.raises(ValueError):
        analytics.pagerank_transitions(df, damping_pct=101)
    with pytest.raises(ValueError):
        analytics.pagerank_transitions(df, iterations=0)
    with pytest.raises(ValueError):
        analytics.pagerank_transitions(df, max_nodes=1)


def test_rfm_segments_hand_computed(spark):
    """5 trails with strictly ordered recency/frequency/monetary in the
    SAME order -> scores 5,4,3,2,1 on every axis; segments '555'..'111'.
    Quintiles: rank r of 5 -> 5 - (r-1)*5 div 5 = 6 - r."""
    rows = []
    for i in range(5):  # trail u{i}: last event at 1000*(5-i), i+1 extra events
        u = f"u{i}"
        rows.append((u, 1000 * (5 - i), 10.0 * (5 - i)))
        for j in range(4 - i):
            rows.append((u, 10 + j, 0.0))
    df = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = {r.uuid: r for r in analytics.rfm_segments(df, t_ref=10000).collect()}
    for i in range(5):
        r = out[f"u{i}"]
        want = 5 - i
        assert (r.r_score, r.f_score, r.m_score) == (want, want, want), r
        assert r.segment == f"{want}{want}{want}"
        assert r.recency_seconds == 10000 - 1000 * (5 - i)
        assert r.n_events == 5 - i
        assert r.monetary_cents == 1000 * (5 - i)


def test_weekly_profile_hand_computed(spark):
    """1970-01-01 (epoch day 0) was a THURSDAY -> dow 3. Key 'work':
    3 events on day 0 (thu), 1 on day 4 (monday, dow 0) -> peak thu
    750000 ppm, 2 active days, entropy = whole-bit H over (3,1).
    Tie key: 1 event thu + 1 event friday -> earliest dow (3) wins."""
    rows = (
        [("work", 10), ("work", 20), ("work", 30), ("work", 4 * 86400)]
        + [("tie", 100), ("tie", 86400 + 100)]
    )
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {r.key: (r.n_events, r.peak_dow, r.peak_ppm, r.days_active)
           for r in analytics.weekly_profile(df).collect()}
    assert got["work"] == (4, 3, 750000, 2)
    assert got["tie"] == (2, 3, 500000, 2)


def test_longest_streak_hand_computed(spark):
    """Active days {0,1,2, 5,6, 9} -> runs 3/2/1: longest 3 ending day
    2; duplicate events per day collapse; a tie between two 2-runs
    reports the EARLIER end."""
    rows = (
        [("u", d * 86400 + off) for d in (0, 1, 2, 5, 6, 9) for off in (0, 100)]
        + [("tie", d * 86400) for d in (0, 1, 4, 5)]
    )
    df = spark.createDataFrame(rows, "uuid string, time long")
    got = {r.uuid: (r.active_buckets, r.longest_streak, r.streak_end_bucket)
           for r in analytics.longest_streak(df).collect()}
    assert got["u"] == (6, 3, 2)
    assert got["tie"] == (4, 2, 1)
    import pytest
    with pytest.raises(ValueError):
        analytics.longest_streak(df, bucket_seconds=0)


def test_peak_concurrency_hand_computed(spark):
    """Three single-session trails: [0,100], [50,150], [140,200] ->
    concurrency peaks at 2 (first at t=50); closed intervals mean a
    session ending AT another's start still overlaps (u4 [100,100]
    makes t=100 a 3-peak)."""
    rows = (
        [("a", 0), ("a", 100), ("b", 50), ("b", 150), ("c", 140), ("c", 200)]
    )
    df = spark.createDataFrame(rows, "uuid string, time long")
    [r] = analytics.peak_concurrency(df, gap=1800).collect()
    assert (r.n_sessions, r.peak_concurrency, r.peak_time) == (3, 2, 50)
    df2 = df.unionByName(
        spark.createDataFrame([("d", 100)], "uuid string, time long"))
    [r2] = analytics.peak_concurrency(df2, gap=1800).collect()
    assert (r2.n_sessions, r2.peak_concurrency, r2.peak_time) == (4, 3, 100)
    # gap splits: one trail, two sessions, never concurrent with itself
    df3 = spark.createDataFrame(
        [("x", 0), ("x", 10_000)], "uuid string, time long")
    [r3] = analytics.peak_concurrency(df3, gap=1800).collect()
    assert (r3.n_sessions, r3.peak_concurrency) == (2, 1)


def test_percentiles_by_bucket_matches_per_bucket_histogram(spark):
    """Bucketed form == histogram_percentiles run on each bucket's
    slice independently (hour 0 and hour 1 carry different value
    distributions)."""
    rows = [("a", t, float(v)) for t, v in
            [(0, 1), (10, 2), (20, 9), (3600, 50), (3700, 60), (3800, 70)]]
    df = spark.createDataFrame(rows, "event_type string, time long, value double")
    got = {(r.key, r.bucket): (r.n_values, r.p50, r.p99)
           for r in analytics.percentiles_by_bucket(df).collect()}
    for bucket in (0, 1):
        sl = df.filter((F.col("time") / 3600).cast("long") == bucket)
        [want] = analytics.histogram_percentiles(sl).collect()
        assert got[("a", bucket)] == (want.n_values, want.p50, want.p99)
    assert got[("a", 0)][1] != got[("a", 1)][1]


def test_mad_outliers_hand_computed(spark):
    """Lower-median + MAD selection hand-checked; key 'a' exercises the
    MAD=0 degeneracy (any off-median value flags), key 'b' the normal
    k·MAD threshold (only the whale crosses 5·MAD)."""
    rows = [("a", f"u{i}", i, v) for i, v in
            enumerate([1.0, 1.0, 1.0, 2.0, 100.0])]
    rows += [("b", f"u{i}", i, float(v)) for i, v in
             enumerate(list(range(1, 11)) + [1000])]
    df = spark.createDataFrame(
        rows, "event_type string, uuid string, time long, value double")
    got = analytics.mad_outliers_by_key(df, k=5).collect()
    a = sorted((r.cents, r.med_cents, r.mad_cents)
               for r in got if r.key == "a")
    b = sorted((r.cents, r.med_cents, r.mad_cents)
               for r in got if r.key == "b")
    assert a == [(200, 100, 0), (10000, 100, 0)]
    assert b == [(100000, 600, 300)]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.mad_outliers_by_key(df, k=0)


def test_interarrival_percentiles_hand_computed(spark):
    """Gaps partition per (trail, key): u1 clicks at 0/10/30 -> gaps
    10,20; u2's lone click adds nothing; view events interleaved in the
    same trail don't break click gaps. Equal timestamps give a 0 gap."""
    rows = [
        ("u1", 0, 1, "click"), ("u1", 5, 2, "view"), ("u1", 10, 3, "click"),
        ("u1", 30, 4, "click"), ("u2", 100, 5, "click"),
        ("u3", 7, 6, "view"), ("u3", 7, 7, "view"),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.key: r for r in analytics.interarrival_percentiles(
        df, probs=(0.5, 0.99)).collect()}
    assert got["click"].n_values == 2
    assert (got["click"].p50, got["click"].p99) == (10.0, 20.0)
    assert got["view"].n_values == 1
    assert got["view"].p50 == 0.0  # the u3 same-timestamp pair


def test_percentiles_from_counts_parity_and_null_bin(spark):
    """value_histogram -> percentiles_from_counts equals the one-shot
    histogram_percentiles (delegation makes it so by construction —
    this pins the contract); NULL value bins are excluded; prob
    validation raises."""
    rows = [("a", float(v)) for v in [1, 2, 9, 50, 60, 70]] + [("a", None)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    per = analytics.value_histogram(df, bin_width=10.0)
    assert per.filter(F.col("bin").isNull()).count() == 1
    got = analytics.percentiles_from_counts(per, (0.5, 0.99), bin_width=10.0)
    want = analytics.histogram_percentiles(df, (0.5, 0.99), bin_width=10.0)
    assert sorted(map(tuple, got.collect())) == \
           sorted(map(tuple, want.collect()))
    [r] = got.collect()
    assert r.n_values == 6  # the NULL row never counts
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.percentiles_from_counts(per, (0.00001,))
    with _pytest.raises(ValueError):
        analytics.percentiles_from_counts(per, (0.5,), bin_width=0)


def test_contingency_chisq_hand_computed(spark):
    """3x2 table with a structurally-empty cell: dev = N*O - R*C and
    chi2_ppm = dev^2*1e6 // (N*R*C) hand-checked per cell; NULL
    categories drop."""
    rows = ([("x", 0)] * 3 + [("x", 1)] + [("y", 0)] + [("y", 1)] * 3
            + [("z", 1)] * 2 + [(None, 0)])
    df = spark.createDataFrame(rows, "a string, b int")
    got = {(r.a, r.b): (r.observed, r.dev_num, r.chi2_cell_ppm)
           for r in analytics.contingency_chisq(df, "a", "b").collect()}
    assert got == {
        ("x", 0): (3, 14, 1_225_000), ("x", 1): (1, -14, 816_666),
        ("y", 0): (1, -6, 225_000), ("y", 1): (3, 6, 150_000),
        ("z", 0): (0, -8, 800_000), ("z", 1): (2, 8, 533_333),
    }


def test_edge_savings_hand_computed(spark):
    """u1: types a,a,b -> 1 repeat of 2 comparisons; value NULL->NULL
    counts as a repeat (the decoder carry); a lone-event trail adds no
    comparisons."""
    rows = [
        ("u1", 0, 1, "a", 1.0), ("u1", 10, 2, "a", None),
        ("u1", 20, 3, "b", None), ("u2", 5, 4, "a", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string,"
        " value double")
    got = {r.field: r for r in analytics.edge_savings_by_field(
        df, fields=("event_type", "value")).collect()}
    assert got["event_type"].n_comparisons == 2
    assert (got["event_type"].n_repeats, got["event_type"].repeat_ppm) == (1, 500_000)
    assert (got["value"].n_repeats, got["value"].repeat_ppm) == (1, 500_000)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.edge_savings_by_field(df, fields=())


def test_attribution_decay_hand_computed(spark):
    """2-vs-1 half-life ages give the exact 2:1 weight split (3333 /
    6667 with the remainder to the most recent); an untouched
    conversion credits '(none)'; total credit conserves at 10000 per
    conversion."""
    hl = 86400
    rows = [
        ("u1", 0, 1, "click"), ("u1", hl, 2, "view"),
        ("u1", 2 * hl, 3, "purchase"),
        ("u2", 0, 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.channel: (r.conversions_touched, r.credit_bp)
           for r in analytics.attribution_decay(
               df, "purchase", ["click", "view"], half_life=hl).collect()}
    assert got == {"click": (1, 3333), "view": (1, 6667),
                   "(none)": (1, 10000)}
    assert sum(v[1] for v in got.values()) == 20000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.attribution_decay(df, "purchase", ["click"], half_life=0)


def test_field_mutual_information_hand_computed(spark):
    """Perfectly correlated fields score bits(2)+bits(4)-bits(2)-bits(2)
    = 1 whole bit per event (1000 millibits); independent uniform fields
    score exactly 0."""
    rows = [("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = analytics.field_mutual_information(df, "x", "y").collect()[0]
    assert (r.n_events, r.n_cells) == (4, 2)
    assert (r.mi_bits_weighted, r.mi_millibits_per_event) == (4, 1000)
    rows = [("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = analytics.field_mutual_information(df, "x", "y").collect()[0]
    assert (r.n_events, r.n_cells) == (4, 4)
    assert (r.mi_bits_weighted, r.mi_millibits_per_event) == (0, 0)


def test_ordered_pair_support_hand_computed(spark):
    """min(src time) < max(dst time) equivalence: u1 a@1 b@2 a@3 yields
    a->b, b->a, a->a but NOT b->b; support threshold counts trails."""
    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "a"),
            ("u2", 5, 4, "b"), ("u2", 6, 5, "a")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {(r.src, r.dst): r.n_trails
           for r in analytics.ordered_pair_support(df, min_trails=1).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 2, ("a", "a"): 1}
    got2 = {(r.src, r.dst): r.n_trails
            for r in analytics.ordered_pair_support(df, min_trails=2).collect()}
    assert got2 == {("b", "a"): 2}


def test_transition_surprisal_hand_computed(spark):
    """u1 alternates a/b (its transitions are the corpus's common ones ->
    0 bits); u2's a->a is 1-of-3 from 'a' -> bits(3)-bits(1) = 1 bit."""
    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "a"),
            ("u1", 4, 4, "b"), ("u1", 5, 5, "a"),
            ("u2", 1, 6, "a"), ("u2", 2, 7, "a")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.uuid: (r.n_steps, r.surprisal_bits, r.millibits_per_step)
           for r in analytics.transition_surprisal(
               df, "event_type", "uuid", "time", "event_id").collect()}
    assert got == {"u1": (4, 0, 0), "u2": (1, 1, 1000)}


def test_rolling_features_hand_computed(spark):
    """Window is the k most recent INCLUDING current; NULL values occupy
    a slot but don't aggregate; roll_n counts non-NULLs only."""
    rows = [("u1", 1, 1, 1.0), ("u1", 2, 2, 2.0), ("u1", 3, 3, None),
            ("u1", 4, 4, 4.0)]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, value double")
    got = {r.event_id: (r.roll_n, r.roll_sum_cents, r.roll_min_cents,
                        r.roll_max_cents)
           for r in analytics.rolling_features(
               df, 2, "value", "uuid", "time", "event_id").collect()}
    assert got[1] == (1, 100, 100, 100)
    assert got[2] == (2, 300, 100, 200)
    assert got[3] == (1, 200, 200, 200)   # window = [2.0, NULL]
    assert got[4] == (1, 400, 400, 400)   # window = [NULL, 4.0]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.rolling_features(df, 0)


def test_column_profile_hand_computed(spark):
    """Modal value excludes '' and breaks ties lexicographically; NULL
    coalesces into the '' bucket; an all-empty field has NULL top."""
    rows = [("a", ""), ("a", None), ("b", ""), ("b", ""), ("", "")]
    df = spark.createDataFrame(rows, "x string, y string")
    got = {r.field: r for r in
           analytics.column_profile(df, ["x", "y"]).collect()}
    rx = got["x"]
    assert (rx.n_rows, rx.n_empty, rx.n_distinct) == (5, 1, 3)
    assert (rx.top_value, rx.top_freq) == ("a", 2)  # a==b tie -> 'a'
    ry = got["y"]
    assert (ry.n_rows, ry.n_empty, ry.n_distinct) == (5, 5, 1)
    assert ry.top_value is None and ry.top_freq is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.column_profile(df, [])


def test_label_propagation_hand_computed(spark):
    """Two triangles (ab=2, bc=2, ca=1 / xy=2, yz=2, zx=1) with a weak
    c-x bridge: one synchronous round adopts each node's max-weight
    neighbor label with min-label ties — hand-traced."""
    seq1 = ["a", "b", "c", "a", "b", "c"]
    seq2 = ["x", "y", "z", "x", "y", "z"]
    rows = (
        [("u1", t, t, v) for t, v in enumerate(seq1)]
        + [("u2", t, 10 + t, v) for t, v in enumerate(seq2)]
        + [("u3", 0, 100, "c"), ("u3", 1, 101, "x")]
    )
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.value: r.community
           for r in analytics.label_propagation(
               df, "event_type", "uuid", "time", "event_id",
               iterations=1).collect()}
    assert got == {"a": "b", "b": "a", "c": "b",
                   "x": "y", "y": "x", "z": "y"}
    got2 = {r.value: r.community
            for r in analytics.label_propagation(
                df, "event_type", "uuid", "time", "event_id",
                iterations=2).collect()}
    assert got2 == {"a": "a", "b": "b", "c": "a",
                    "x": "x", "y": "y", "z": "x"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.label_propagation(df, iterations=0)
    with _pytest.raises(ValueError):
        analytics.label_propagation(
            df, "event_type", "uuid", "time", max_nodes=2)


def test_k_anonymity_hand_computed(spark):
    from traildb_spark.operators import curation

    rows = [("u1", "a"), ("u2", "a"), ("u3", "a"), ("u1", "a"),
            ("u1", "b")]
    df = spark.createDataFrame(rows, "uuid string, event_type string")
    got = {r.event_type: (r.n_uuids, r.n_events, r.at_risk)
           for r in curation.k_anonymity(df, ["event_type"], k=3).collect()}
    assert got == {"a": (3, 4, False), "b": (1, 1, True)}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.k_anonymity(df, [], k=3)
    with _pytest.raises(ValueError):
        curation.k_anonymity(df, ["event_type"], k=1)


def test_seasonal_anomalies_hand_computed(spark):
    """A 20-day hour-3 cell of constant 2s with one 22 spike flags only
    the spike: dev² = (20·22−60)² = 144400 > 9·(20·560−3600) = 68400;
    a key containing '|' still splits back correctly."""
    rows = []
    eid = 0
    for d in range(20):
        n = 22 if d == 7 else 2
        for i in range(n):
            rows.append(("u1", d * 86400 + 3 * 3600 + i, eid, "k|x"))
            eid += 1
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    out = analytics.seasonal_anomalies(df, "event_type", "time", k=3,
                                       period="day").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.key, r.phase_hour, r.bucket, r.y) == ("k|x", 3, 7, 22)
    assert (r.dev_num, r.bound_num) == (144400, 68400)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.seasonal_anomalies(df, period="month")


def test_transition_prediction_accuracy_hand_computed(spark):
    """Model from all trails: from 'a' the argmax is 'b' (2 vs 1);
    ties break to the smallest dst; accuracy is exact ppm."""
    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "a"),
            ("u1", 4, 4, "b"),
            ("u2", 1, 5, "a"), ("u2", 2, 6, "c")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    # transitions: u1 ab, ba, ab ; u2 ac -> from a: b=2, c=1 -> pred b
    # from b: a=1 -> pred a
    got = {r.uuid: (r.n_steps, r.n_correct, r.accuracy_ppm)
           for r in analytics.transition_prediction_accuracy(
               df, "event_type", "uuid", "time", "event_id").collect()}
    assert got == {"u1": (3, 3, 1000000), "u2": (1, 0, 0)}
    # tie: from 'x' both 'p' and 'q' once -> predicts 'p'
    rows2 = [("v1", 1, 1, "x"), ("v1", 2, 2, "p"),
             ("v2", 1, 3, "x"), ("v2", 2, 4, "q")]
    df2 = spark.createDataFrame(
        rows2, "uuid string, time long, event_id long, event_type string")
    got2 = {r.uuid: r.n_correct
            for r in analytics.transition_prediction_accuracy(
                df2, "event_type", "uuid", "time", "event_id").collect()}
    assert got2 == {"v1": 1, "v2": 0}


def test_state_dwell_times_hand_computed(spark):
    """Each event owns time-to-next; last events own nothing;
    same-timestamp successors contribute zero."""
    rows = [("u1", 0, 1, "a"), ("u1", 10, 2, "b"), ("u1", 10, 3, "a"),
            ("u1", 25, 4, "b"),
            ("u2", 5, 5, "a")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.value: (r.n_intervals, r.total_dwell_seconds, r.mean_dwell_ms)
           for r in analytics.state_dwell_times(
               df, "event_type", "uuid", "time", "event_id").collect()}
    # u1: a@0 owns 10, b@10 owns 0 (tie), a@10 owns 15; b@25 last;
    # u2: single event owns nothing
    assert got == {"a": (2, 25, 12500), "b": (1, 0, 0)}


def test_benford_deviation_hand_computed(spark):
    """Digits from |round(v*100)|; zeros dropped; all nine rows present
    with the fixed Benford lattice."""
    rows = [(1.0,), (1.5,), (-2.0,), (9.99,), (0.0,), (None,)]
    df = spark.createDataFrame(rows, "value double")
    got = {r.digit: (r.n, r.observed_ppm, r.benford_ppm, r.abs_diff_ppm)
           for r in analytics.benford_deviation(df, "value").collect()}
    assert len(got) == 9
    # cents: 100, 150, 200, 999 -> digits 1, 1, 2, 9
    assert got[1] == (2, 500000, 301029, 198971)
    assert got[2] == (1, 250000, 176091, 73909)
    assert got[9] == (1, 250000, 45757, 204243)
    assert got[5] == (0, 0, 79181, 79181)


def test_ewma_features_hand_computed(spark):
    """alpha=1/2 exact shifts: most recent value carries 2^(L-1);
    NULLs occupy frame slots but no weight; negative sums sign-factor."""
    rows = [("u1", 1, 1, 1.0), ("u1", 2, 2, 2.0), ("u1", 3, 3, None),
            ("u1", 4, 4, 4.0), ("u1", 5, 5, -1.0)]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, value double")
    got = {r.event_id: r.ewma_cents
           for r in analytics.ewma_features(
               df, 3, "value", "uuid", "time", "event_id").collect()}
    # e1 [100] -> 100 ; e2 [100,200] -> 500//3=166
    # e3 frame {e1,e2,NULL} -> [100,200] -> 166
    # e4 frame {e2,NULL,e4} -> [200,400] -> 1000//3=333
    # e5 frame {NULL,e4,e5} -> [400,-100] -> 200//3=66
    assert got == {1: 100, 2: 166, 3: 166, 4: 333, 5: 66}
    # all-negative truncates toward zero in both engines
    rows2 = [("u2", 1, 1, -1.0), ("u2", 2, 2, -2.0)]
    df2 = spark.createDataFrame(
        rows2, "uuid string, time long, event_id long, value double")
    got2 = {r.event_id: r.ewma_cents
            for r in analytics.ewma_features(
                df2, 3, "value", "uuid", "time", "event_id").collect()}
    assert got2 == {1: -100, 2: -166}  # -500 -> sign * (500 div 3)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.ewma_features(df, 0)
    with _pytest.raises(ValueError):
        analytics.ewma_features(df, 41)


def test_json_schema_report_hand_computed(spark):
    """Per-key presence/numeric stats; non-object / corrupt / empty
    payloads all land in __invalid__; string values count as present
    but not numeric."""
    rows = [('{"a": 1, "b": "x"}',), ('{"a": 2.5}',), ('{"b": "-3"}',),
            ("not json",), ("",), ("[1, 2]",)]
    df = spark.createDataFrame(rows, "props string")
    got = {r.key: (r.n_present, r.n_numeric, r.min_num, r.max_num)
           for r in analytics.json_schema_report(df, "props").collect()}
    assert got["a"] == (2, 2, 1.0, 2.5)
    assert got["b"] == (2, 1, -3.0, -3.0)
    assert got["__invalid__"][0] == 3


def test_conversion_paths_hand_computed(spark):
    """Last-3 touches oldest->newest; ties on time break by event_id;
    touchless conversions count under (none)."""
    rows = [("u1", 1, 1, "click"), ("u1", 2, 2, "view"),
            ("u1", 3, 3, "click"), ("u1", 4, 4, "view"),
            ("u1", 5, 5, "purchase"),
            ("u2", 9, 6, "purchase")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {r.path: r.n_conversions
           for r in analytics.conversion_paths(
               df, "purchase", ["click", "view"], n_last=3).collect()}
    # last 3 of [click view click view] = view>click>view
    assert got == {"view>click>view": 1, "(none)": 1}
    got2 = {r.path: r.n_conversions
            for r in analytics.conversion_paths(
                df, "purchase", ["click", "view"], n_last=2,
                lookback=2).collect()}
    # lookback 2s from t=5 keeps touches at t>=3: click@3, view@4
    assert got2 == {"click>view": 1, "(none)": 1}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.conversion_paths(df, "purchase", ["click"], n_last=0)


def test_run_length_distribution_hand_computed(spark):
    """a,a,b,a in one trail -> runs (a,2),(b,1),(a,1); a second trail's
    single b pools into (b,1)."""
    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "a"), ("u1", 3, 3, "b"),
            ("u1", 4, 4, "a"), ("u2", 1, 5, "b")]
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string")
    got = {(r.value, r.run_length): r.n_runs
           for r in analytics.run_length_distribution(
               df, "event_type", "uuid", "time", "event_id").collect()}
    assert got == {("a", 2): 1, ("a", 1): 1, ("b", 1): 2}


def test_lorenz_points_hand_computed(spark):
    """Trails with 1, 1, 2, 6 events: bottom half (2 trails) holds
    2/10 events -> 200000 ppm; full curve ends at 1e6."""
    rows = ([("a", i) for i in range(1)] + [("b", i) for i in range(1)]
            + [("c", i) for i in range(2)] + [("d", i) for i in range(6)])
    df = spark.createDataFrame(rows, "uuid string, x long")
    got = {r.point: (r.trails_cum, r.trail_share_ppm, r.event_share_ppm)
           for r in analytics.lorenz_points(df, n_points=4).collect()}
    assert got[1] == (1, 250000, 100000)   # bottom 1 trail: 1/10
    assert got[2] == (2, 500000, 200000)   # bottom 2: 2/10
    assert got[3] == (3, 750000, 400000)   # bottom 3: 4/10
    assert got[4] == (4, 1000000, 1000000)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.lorenz_points(df, n_points=0)


def test_adoption_curve_hand_computed(spark):
    """First-touch per (trail, value); cumulative runs over active
    buckets per value."""
    rows = [("u1", 0, "a"), ("u1", 90000, "a"), ("u2", 90000, "a"),
            ("u2", 90001, "b"), ("u3", 180000, "a")]
    df = spark.createDataFrame(rows, "uuid string, time long, event_type string")
    got = {(r.value, r.bucket): (r.n_first_trails, r.cum_trails)
           for r in analytics.adoption_curve(df, "event_type", 86400).collect()}
    assert got == {("a", 0): (1, 1), ("a", 1): (1, 2), ("a", 2): (1, 3),
                   ("b", 1): (1, 1)}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        analytics.adoption_curve(df, bucket_seconds=0)


def test_markov_stationary_hand_computed(spark):
    """Deterministic 2-cycle keeps the uniform start; a dangling sink
    absorbs all mass through its explicit self-loop."""
    from traildb_spark.operators.analytics import markov_stationary

    cycle = spark.createDataFrame(
        [("u", 0, 0, "A"), ("u", 1, 1, "B"), ("u", 2, 2, "A"), ("u", 3, 3, "B")],
        "uuid string, time long, event_id long, event_type string",
    )
    out = {r.event_type: r.stationary_ppm
           for r in markov_stationary(cycle, "event_type", "uuid", "time",
                                      "event_id", iters=4).collect()}
    assert out == {"A": 500_000, "B": 500_000}

    sink = spark.createDataFrame(
        [("u", 0, 0, "A"), ("u", 1, 1, "C")],
        "uuid string, time long, event_id long, event_type string",
    )
    out = {r.event_type: r.stationary_ppm
           for r in markov_stationary(sink, "event_type", "uuid", "time",
                                      "event_id", iters=4).collect()}
    assert out == {"A": 0, "C": 1_000_000}


def test_lagged_crosscorr_hand_computed(spark):
    """y is x shifted one hour: perfect correlation at lag 1 (and at
    lag 0 for these collinear series); the dense grid supplies the
    missing-hour zeros."""
    from traildb_spark.operators.analytics import lagged_crosscorr

    rows = []
    eid = 0
    x = {0: 1, 1: 2, 2: 3}
    y = {0: 0, 1: 1, 2: 2}   # hour 0 has NO b events: grid must emit 0
    for h, n in x.items():
        for _ in range(n):
            rows.append(("u", h * 3600 + 1, eid, "a")); eid += 1
    for h, n in y.items():
        for _ in range(n):
            rows.append(("u", h * 3600 + 2, eid, "b")); eid += 1
    df = spark.createDataFrame(
        rows, "uuid string, time long, event_id long, event_type string"
    )
    out = {r.lag: r for r in lagged_crosscorr(df, "a", "b",
                                              max_lag_hours=1).collect()}
    assert out[0].n == 3 and out[1].n == 2
    # x=[1,2,3] vs y=[0,1,2] and the lag-1 pairs (1,1),(2,2): both exact
    assert out[0].corr_micro == 1_000_000
    assert out[1].corr_micro == 1_000_000


def test_kmv_distinct_formula_and_partition_invariance(spark):
    """The sketch equals a driver-side replay of the same order
    statistics, exact below k, and is BIT-identical under different
    partitionings (bottom-k of a union == merge of per-partition
    bottom-k's)."""
    import hashlib

    from traildb_spark.operators.analytics import kmv_distinct

    rows = [("big", f"u{i}") for i in range(500)] + [
        ("small", f"u{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "event_type string, uuid string")
    out = {r.event_type: r for r in
           kmv_distinct(df, "uuid", keys=("event_type",), k=64).collect()}
    assert out["small"].kmv_estimate == 10        # n < k -> exact
    assert out["small"].exact_distinct == 10
    hs = sorted(
        int.from_bytes(
            hashlib.md5(f"u{i}".encode()).digest()[:8], "big") >> 4
        for i in range(500)
    )
    expected = (63 * (1 << 60)) // hs[63]
    assert out["big"].kmv_estimate == expected
    assert out["big"].exact_distinct == 500
    # within the expected KMV error envelope at k=64 (~12.5% sigma)
    assert 300 <= out["big"].kmv_estimate <= 700
    a = sorted(map(tuple, kmv_distinct(
        df.repartition(7), "uuid", k=64).collect()))
    b = sorted(map(tuple, kmv_distinct(
        df.coalesce(1), "uuid", k=64).collect()))
    assert a == b

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kmv_distinct(df, "uuid", k=1)


def test_kmv_distinct_null_keys_survive(spark):
    """A null-key group must appear in the output with a correct exact
    count and estimate — pandas groupby drops NaN groups by default and
    SQL inner joins reject nulls, so both the partial pass and the merge
    join need explicit null handling (ADVICE r7)."""
    from traildb_spark.operators.analytics import kmv_distinct

    rows = [("a", f"u{i}") for i in range(5)] + [
        (None, f"n{i}") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "event_type string, uuid string")
    out = {r.event_type: r for r in
           kmv_distinct(df, "uuid", keys=("event_type",), k=64).collect()}
    assert set(out) == {"a", None}
    assert out[None].exact_distinct == 7
    assert out[None].kmv_estimate == 7            # n < k -> exact
    assert out["a"].exact_distinct == 5


def test_kmv_distinct_non_string_value_matches_streaming_hash(spark):
    """kmv over an integer value column works (values are stringified
    before hashing) — the same contract streaming_kmv follows so the
    batch/stream bit-equality law holds for non-string columns."""
    from traildb_spark.operators.analytics import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 9) for i in range(40)], "event_type string, v long"
    )
    out = kmv_distinct(df, "v", keys=("event_type",), k=64).collect()
    assert out[0].exact_distinct == 9 and out[0].kmv_estimate == 9
