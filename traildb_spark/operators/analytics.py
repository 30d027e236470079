"""Trail-analytics operators: the aggregates TrailDB callers write as
cursor programs (`doc/docs/index.md:21-26` — "iterate cursors ... and
compute anything"; e.g. the sessionization tutorial
`examples/tutorial_wikipedia_sessions.c:26-47`), expressed as first-class
DataFrame operators so they distribute instead of looping one cursor at a
time on the driver.

Every operator here is pure Catalyst (no Python in the hot path) and
shuffles at most once on uuid plus once on a small aggregate key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import md5_60
from .trails import TIME_COL, UUID_COL, _trail_window


def value_frequencies(
    df: DataFrame, field: str, top_k: int | None = None
) -> DataFrame:
    """Distinct-value frequency table for one field — the reference's
    compression-model unigram counting (`src/tdb_encode_model.c:444-486`)
    surfaced as a product operator. One shuffle with map-side combine;
    the result is lexicon-sized (bounded by the field's cardinality, not
    the event count). ``top_k`` adds a deterministic global head — a
    second, lexicon-sized sort, never an event-sized one.
    """
    freq = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    if top_k is not None:
        w = Window.orderBy(F.desc("freq"), F.asc("value"))
        freq = (
            freq.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .drop("rank")
        )
    return freq


def transition_counts(
    df: DataFrame,
    field: str,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Markov transition matrix over a field: count per-trail adjacent
    (previous value → value) pairs across all trails — the reference's
    bigram model (`src/tdb_encode_model.c:344-381`) generalized to the
    time axis, and the standard input to flow/funnel visualizations.

    One uuid shuffle for the lag window, then an aggregation keyed on the
    (value, value) pair space — at most lexicon² keys with map-side
    combine, so the second exchange is tiny regardless of event count.
    Trail-initial events (no predecessor) are excluded.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    pairs = df.withColumn("__prev", F.lag(F.col(field)).over(w)).filter(
        F.col("__prev").isNotNull()
    )
    return pairs.groupBy(
        F.col("__prev").alias("src"), F.col(field).alias("dst")
    ).agg(F.count(F.lit(1)).alias("freq"))


def funnel_times(
    df: DataFrame,
    steps: list[Column],
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    within: int | None = None,
) -> DataFrame:
    """Ordered-funnel timestamps per trail: ``s0`` is the first event
    matching ``steps[0]``; ``s_i`` the first event matching ``steps[i]``
    STRICTLY AFTER ``s_{i-1}`` (NULL once the chain breaks). ``within``
    adds the standard conversion-window constraint: step i also requires
    ``t <= s_{i-1} + within``. The classic cursor program — walk the
    trail once, latch each step's time — as a single ``aggregate`` fold
    over the time-sorted trail: ONE shuffle on uuid, no Python, no
    per-step re-scan of the events (the equivalent min-time-chain SQL
    re-aggregates the event table once per step; the DuckDB oracle uses
    exactly that independent formulation).

    Equal-timestamp events cannot satisfy two consecutive steps (strict
    ``>``), so the result is insensitive to tie order within the sort.
    Note the greedy first-match semantics shared with the min-chain
    formulation: each step latches its EARLIEST eligible time, so with
    ``within`` a later s_{i-1} candidate that would have let s_i succeed
    is not explored (the industry-standard funnel definition).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step predicate")
    ev = F.struct(
        F.col(time_col).cast("long").alias("t"),
        *[steps[i].cast("boolean").alias(f"p{i}") for i in range(k)],
    )
    trail = df.groupBy(F.col(uuid_col).alias("uuid")).agg(
        F.sort_array(F.collect_list(ev)).alias("evs")
    )

    init = F.struct(
        *[F.lit(None).cast("long").alias(f"s{i}") for i in range(k)]
    )

    def fold(acc, e):
        news: list[Column] = []
        prev = None
        for i in range(k):
            cur = acc[f"s{i}"]
            if i == 0:
                hit = e["p0"] & cur.isNull()
            else:
                hit = e[f"p{i}"] & cur.isNull() & prev.isNotNull() & (e["t"] > prev)
                if within is not None:
                    hit = hit & (e["t"] <= prev + F.lit(within))
            val = F.when(hit, e["t"]).otherwise(cur)
            news.append(val.alias(f"s{i}"))
            prev = val
        return F.struct(*news)

    out = trail.withColumn("__f", F.aggregate(F.col("evs"), init, fold))
    return out.select(
        "uuid", *[F.col(f"__f.s{i}").alias(f"s{i}") for i in range(k)]
    )


def funnel_counts(
    df: DataFrame,
    steps: list[Column],
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    within: int | None = None,
) -> DataFrame:
    """Funnel summary: how many trails reached each step (in order). The
    per-trail table reduces to ``len(steps)`` rows — metadata-scale."""
    times = funnel_times(df, steps, uuid_col, time_col, within)
    aggs = [
        F.count(F.col(f"s{i}")).alias(f"reached_{i}") for i in range(len(steps))
    ]
    wide = times.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"), F.col(f"reached_{i}").alias("trails")
            )
            for i in range(len(steps))
        ]
    )
    return wide.select(F.explode(pairs).alias("x")).select("x.step", "x.trails")


def retention(
    df: DataFrame,
    period: int = 86400,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Cohort retention: bucket time into ``period``-sized buckets, cohort
    each trail by its first active bucket, and count distinct trails active
    at each (cohort, offset). TWO shuffles total: ``collect_set(bucket)``
    per uuid dedups map-side (partial aggregation) so the uuid exchange
    carries at most trails × active-buckets rows, cohort = ``array_min``
    needs no second pass over events, and the final exchange is keyed on
    the tiny (cohort, offset) triangle. Per-trail set size is bounded by
    the dataset's time span / ``period`` (e.g. a year of daily buckets is
    366 ints), not by event count.
    """
    b = F.floor(F.col(time_col).cast("long") / F.lit(period)).cast("long")
    per_trail = (
        df.select(F.col(uuid_col).alias("uuid"), b.alias("bucket"))
        .groupBy("uuid")
        .agg(F.collect_set("bucket").alias("bs"))
    )
    spread = per_trail.select(
        F.array_min("bs").alias("cohort"), F.explode("bs").alias("bucket")
    )
    return spread.groupBy(
        "cohort", (F.col("bucket") - F.col("cohort")).alias("offset")
    ).agg(F.count(F.lit(1)).alias("trails"))


def percentiles(
    df: DataFrame,
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group value percentiles.

    ``approx=False`` uses exact interpolated percentiles — Spark's
    ``percentile`` buffers each group's values, which is fine while a
    single group fits an executor, and its linear interpolation is
    bit-identical to DuckDB's ``quantile_cont`` (verified by the q62
    oracle). At 100 TB set ``approx=True``: ``percentile_approx`` folds a
    constant-memory sketch map-side (mergeable partial aggregation, one
    pass, no per-group buffering) at ±1/``accuracy`` rank error — the
    same exact/approx dual the engine offers for lexicon sizes.
    """
    aggs = []
    for p in probs:
        label = "p" + ("%g" % (p * 100)).replace(".", "_")
        agg = (
            F.percentile_approx(value_col, F.lit(p), F.lit(accuracy))
            if approx
            else F.percentile(value_col, F.lit(p))
        )
        aggs.append(agg.alias(label))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def event_path_ngrams(
    df: DataFrame,
    field: str,
    k: int = 3,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Trail path mining: count every k-long run of consecutive event
    values within trails, corpus-wide — :func:`transition_counts`
    (the reference's bigram model, `src/tdb_encode_model.c:344-381`)
    generalized to k-grams, the standard input to top-paths and
    next-step-prediction views. Returns ``(s1..sk, freq)``.

    All k-1 leads share ONE window spec (a single uuid shuffle + sort);
    completeness is detected on the always-non-NULL time column, so
    NULL/'' event values participate in paths like any other value. The
    final aggregate keys on at most lexicon^k combinations with map-side
    combine — tiny regardless of event count.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    out = df.select(
        F.col(field).alias("s1"),
        *[F.lead(F.col(field), i).over(w).alias(f"s{i+1}") for i in range(1, k)],
        F.lead(F.col(time_col), k - 1).over(w).alias("__t_end"),
    )
    return (
        out.filter(F.col("__t_end").isNotNull())
        .groupBy(*[f"s{i+1}" for i in range(k)])
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def attribution(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    lookback: int | None = None,
    model: str = "last_touch",
    field: str = "event_type",
    value_col: str | None = None,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Marketing attribution — TrailDB's motivating workload ("events of
    users over time", `doc/docs/index.md:7-14`; AdRoll's attribution use
    case is the reference's origin story). For every ``conversion`` event,
    credit the touch event (``field`` value in ``touches``) that a model
    picks from the trail prefix STRICTLY before the conversion:

    - ``last_touch``: the most recent prior touch, expired to ``(none)``
      when it is older than ``lookback`` seconds (end-exclusive prefix,
      closed lookback: attributed iff touch_time >= conv_time - lookback).
    - ``first_touch``: the earliest touch in the trail prefix; ``lookback``
      is ignored (classic first-touch has no window).

    Returns ``(channel, conversions, attributed_value)`` where ``channel``
    is the credited touch value or ``'(none)'`` and ``attributed_value``
    sums ``round(value*100)`` as integer cents (bit-portable across
    engines — no float-summation order sensitivity).

    Scale: ONE uuid shuffle for the prefix window (shared by both running
    columns), then a channel-keyed aggregate with map-side combine — at
    most |touches|+1 groups. No self-join of conversions against touches
    (the naive formulation is O(conversions × touches) per trail).
    """
    if model not in ("last_touch", "first_touch"):
        raise ValueError(f"unknown attribution model: {model}")
    w = (
        _trail_window(uuid_col, time_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(field).isin(list(touches))
    pick = F.last if model == "last_touch" else F.first
    touch_type = pick(F.when(is_touch, F.col(field)), ignorenulls=True).over(w)
    touch_time = pick(F.when(is_touch, F.col(time_col)), ignorenulls=True).over(w)
    conv = df.select(
        F.col(field).alias("__f"),
        F.col(time_col).alias("__t"),
        (
            F.round(F.col(value_col) * 100).cast("long")
            if value_col
            else F.lit(0).cast("long")
        ).alias("__cents"),
        touch_type.alias("__touch"),
        touch_time.alias("__touch_t"),
    ).filter(F.col("__f") == conversion)
    attributed = F.col("__touch").isNotNull()
    if lookback is not None and model == "last_touch":
        attributed = attributed & (
            F.col("__touch_t") >= F.col("__t") - F.lit(int(lookback))
        )
    return (
        conv.select(
            F.when(attributed, F.col("__touch"))
            .otherwise(F.lit("(none)"))
            .alias("channel"),
            F.col("__cents"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum("__cents").alias("attributed_cents"),
        )
    )


def activity_histogram(
    df: DataFrame,
    field: str = "event_type",
    time_col: str = TIME_COL,
) -> DataFrame:
    """Activity heatmap: event counts by (day-of-week, hour-of-day,
    field value) — the standard "when do users act" TrailDB report,
    computed with pure integer arithmetic on the Unix-seconds time
    column (no timezone/calendar library): 1970-01-01 was a Thursday,
    so ``dow = (time div 86400 + 4) mod 7`` with 0 = Sunday; hour is
    ``time mod 86400 div 3600``. Bit-portable across engines, and the
    aggregate keys on at most 7×24×lexicon values with map-side combine
    — never event-sized.
    """
    t = F.col(time_col)
    return (
        df.groupBy(
            F.pmod(F.floor(t / 86400).cast("long") + 4, F.lit(7)).alias("dow"),
            (F.pmod(t, F.lit(86400)) / 3600).cast("long").alias("hour"),
            F.col(field).alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("events"))
    )


def session_cooccurrence(
    df: DataFrame,
    field: str = "event_type",
    gap: int = 1800,
    min_support: int = 2,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Market-basket analysis over sessions: for every unordered pair of
    distinct ``field`` values co-occurring in one session, the number of
    sessions containing both (support) and a whole-bit lift score —
    ``lift_bits ≈ log2(P(ab)·N / (P(a)·P(b)·N²)·N) = log2(n_ab·N /
    (n_a·n_b))`` integerized as ``bits(n_ab)+bits(N)-bits(n_a)-bits(n_b)``
    (bit-portable, overflow-free — same family as
    ``text.cooccurrence_pmi``). The classic "users who did X in a session
    also did Y" report, i.e. the reference's trail-program idiom
    (`doc/docs/index.md:21-26`) as a distributed operator.

    Scale: sessionize is ONE uuid shuffle (two stacked windows, same
    partitioning); distinct values per session collapse via one
    map-side-combined aggregate to a sorted array bounded by the lexicon,
    pairs explode from that array NARROWLY (≤ lexicon² rows per session,
    lexicon-bounded, never event²), and the final aggregates key on value
    pairs — at most lexicon² groups. Nothing event-quadratic anywhere.

    Returns ``(v1, v2, support, lift_bits)`` with ``v1 < v2``.
    """
    from .trails import sessionize

    from .dedup import _materialize

    sess = sessionize(df, gap=gap, uuid_col=uuid_col, time_col=time_col).select(
        F.concat_ws("#", F.col(uuid_col), F.col("session_id")).alias("sid"),
        F.col(field).alias("v"),
    )
    # the distinct (sid, value) set feeds THREE branches (pairs, singles,
    # session total) — materialize it so the sessionize windows + distinct
    # shuffle run once, not per branch
    d = _materialize(sess.distinct())
    d.count()  # fill the cache distributed, once, before the branches
    # per_sess feeds the session total AND the pair explode — pin the
    # session-sized array table so the groupBy runs once per call
    per_sess = _materialize(
        d.groupBy("sid").agg(
            F.array_sort(F.collect_set("v")).alias("vs")
        )
    )
    n_sessions = per_sess.select(F.count(F.lit(1)).alias("n"))
    singles = d.groupBy("v").agg(F.count(F.lit(1)).alias("nv"))
    pairs = per_sess.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("vs"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("vs"),
                            i + 2,
                            F.greatest(F.size("vs") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("v1"), y.alias("v2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.v1", "p.v2")
    support = (
        pairs.groupBy("v1", "v2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )

    def bits(c: Column) -> Column:
        return F.length(F.bin(c.cast("long")))

    return (
        support.join(
            singles.select(F.col("v").alias("v1"), F.col("nv").alias("n1")), "v1"
        )
        .join(singles.select(F.col("v").alias("v2"), F.col("nv").alias("n2")), "v2")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "v1",
            "v2",
            "support",
            (
                bits(F.col("support")) + bits(F.col("n"))
                - bits(F.col("n1")) - bits(F.col("n2"))
            ).cast("long").alias("lift_bits"),
        )
    )


def burst_windows(
    df: DataFrame,
    window: int = 3600,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Activity-spike detection per trail: the peak number of events in
    any sliding ``window``-second interval ending at an event (the
    standard anchored formulation — the max over a continuous slide is
    always achieved at some event time), plus the earliest time at which
    that peak occurs. Returns ``(uuid, peak_events, peak_time)``.

    ONE uuid shuffle: a RANGE window frame (``[t-window, t]`` on the
    integer time axis) streams per trail in time order — no
    per-trail materialization, whale trails stream like any other — and
    the per-trail argmax folds map-side in the same partitioning.
    """
    w = (
        Window.partitionBy(uuid_col)
        .orderBy(F.col(time_col).cast("long"))
        .rangeBetween(-int(window), 0)
    )
    counted = df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).cast("long").alias("t"),
        F.count(F.lit(1)).over(w).alias("c"),
    )
    # argmax with earliest-time tiebreak via one struct max:
    # max(c, -t) picks highest count, then smallest t
    best = counted.groupBy("uuid").agg(
        F.max(F.struct(F.col("c"), (-F.col("t")).alias("nt"))).alias("b")
    )
    return best.select(
        "uuid",
        F.col("b.c").alias("peak_events"),
        (-F.col("b.nt")).cast("long").alias("peak_time"),
    )


def _cm_cells(col: Column, width: int, depth: int, seed: str) -> Column:
    """depth (row, cell) coordinates for one value under the portable
    60-bit md5 family (exactly reproducible in SQL engines)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    md5_60(
                        F.concat(
                            F.lit(f"{seed}{d}:"),
                            F.coalesce(col.cast("string"), F.lit("")),
                        )
                    )
                    % width
                ).alias("cell"),
            )
            for d in range(depth)
        ]
    )


def countmin_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cm:",
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``(d, cell, c)`` with at most
    ``depth × width`` rows regardless of input size. The heavy-hitter /
    approximate-frequency primitive when the value universe is unbounded
    (URLs, n-grams) and an exact groupBy would carry a key per distinct
    value through the shuffle.

    Spark-native construction: the depth cell coordinates explode
    NARROWLY per row, then ONE aggregate with map-side combine collapses
    to ≤ depth×width groups — the exchange carries the sketch size, not
    the distinct-value count. Sketches are MERGEABLE by construction:
    union two and re-sum (see ``test_countmin_merge``) — the property
    that lets per-day / per-shard sketches roll up without touching raw
    data. Deterministic md5 hashing ⇒ the same sketch is reproducible in
    SQL, so even this approximate op is differentially checkable.
    """
    return (
        df.select(F.explode(_cm_cells(F.col(col), width, depth, seed)).alias("x"))
        .groupBy(F.col("x.d").alias("d"), F.col("x.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def mg_summary(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Misra-Gries heavy-hitter summary with bounded state — the
    deterministic-guarantee sibling of :func:`countmin_build` (count-min
    bounds error probabilistically; MG bounds it absolutely).

    Per partition, a k-counter MG summary runs over Arrow batches (each
    batch's exact ``value_counts`` merges into the counters; when they
    exceed k, the (k+1)-th largest count is deducted from ALL — the
    classic decrement step, O(k log k) per batch, state ≤ k forever).
    Per-partition summaries are MERGEABLE (Agarwal et al., "Mergeable
    Summaries"): the global aggregate sums stored counts per value into
    a LOWER bound ``lo`` and adds the total deducted mass as the shared
    UPPER slack: ``hi = lo + Σ_p deducted_p``.

    Guarantee (the reason this is sound at 100 TB): total deducted mass
    ≤ N/(k+1), so EVERY value with true count > N/(k+1) appears in the
    output — the output is a small superset of the guaranteed-frequent
    set, and one cheap semi-join back to the data turns it into the
    EXACT frequent set (see ``q110``). Shuffle accounting: the exchange
    carries ≤ (k+1) rows per partition, never the distinct-value count —
    the whole point versus an exact groupBy over an unbounded universe.

    Returns ``(value, lo, hi)``; NULL input values count like any other
    value (keyed as NULL).
    """
    k = int(k)
    if k < 1:
        raise ValueError("mg_summary: k must be >= 1")
    summ = df.select(F.col(col).cast("string")).mapInPandas(
        mg_partition_summarize(k), MG_SUMMARY_SCHEMA
    )
    return mg_bounds(summ)


MG_SUMMARY_SCHEMA = "value string, cnt long, is_meta boolean"


def mg_partition_summarize(k: int):
    """The ONE Misra-Gries partition kernel (shared by :func:`mg_summary`
    and ``streaming_heavy_hitters`` so the decrement accounting — the
    part with a proof obligation — lives in exactly one place): an
    Arrow-batched k-counter MG over one partition's rows, emitting
    counter rows plus a single meta row carrying the deducted mass."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        deducted = 0
        for pdf in batches:
            vc = pdf[pdf.columns[0]].value_counts(dropna=False)
            for v, c in vc.items():
                key = None if pd.isna(v) else v
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                deducted += cut
                counters = {
                    v: c - cut for v, c in counters.items() if c > cut
                }
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [deducted],
                "is_meta": [False] * len(counters) + [True],
            }
        )

    return summarize


def mg_bounds(summ: DataFrame) -> DataFrame:
    """(value, lo, hi) projection of an MG counter+meta summary frame:
    lo = stored count, hi = lo + total deducted mass. The summary is
    sketch-sized (≤ (k+1) rows per partition), so the global window for
    the shared deducted mass costs one tiny exchange and stays fully
    lazy — no collect, no persist."""
    w = Window.partitionBy()
    summ = summ.withColumn(
        "__ded",
        F.sum(F.when(F.col("is_meta"), F.col("cnt")).otherwise(0)).over(w),
    )
    return (
        summ.filter(~F.col("is_meta"))
        .groupBy("value")
        .agg(F.sum("cnt").alias("lo"), F.max("__ded").alias("__d"))
        .select(
            "value", "lo", (F.col("lo") + F.col("__d")).alias("hi")
        )
    )


def heavy_hitters_exact(
    df: DataFrame, col: str, k: int = 100
) -> DataFrame:
    """EXACT frequent set via the MG summary: every value with true
    count > N/(k+1) — computed without ever shuffling the full distinct-
    value universe. The MG summary (state ≤ k·partitions rows) is a
    guaranteed superset of that set; a broadcast semi-join back to the
    data counts ONLY the candidates exactly, and the integer threshold
    ``n·(k+1) > N`` keeps the whole query reproducible in SQL. Returns
    ``(value, n)`` — deterministic regardless of partitioning, which is
    what makes an approximate-sketch pipeline oracle-checkable
    end-to-end. NULL keys are not returned (SQL join semantics drop them
    from the semi-join); ``coalesce`` upstream if NULL is a meaningful
    category."""
    cand = mg_summary(df, col, k).select("value")
    vals = df.select(F.col(col).cast("string").alias("value"))
    total = vals.agg(F.count(F.lit(1)).alias("__N"))  # 1-row broadcast total
    counts = (
        vals.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * (k + 1) > F.col("__N"))
        .select("value", "n")
    )


def countmin_probe(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cm:",
) -> DataFrame:
    """Point-query the sketch for each value in ``values[col]``:
    ``est = min over rows of the value's cell counters`` (the classic CM
    estimate — never an underestimate, overestimates bounded by
    collisions ≤ e·N/width with prob 1-e^-depth). The sketch side is
    ≤ depth×width rows, so the join broadcasts; per probed value the
    aggregate folds depth rows. Returns ``(value, est)``.
    """
    pr = values.select(
        F.col(col).alias("value"),
        F.explode(_cm_cells(F.col(col), width, depth, seed)).alias("x"),
    ).select("value", F.col("x.d").alias("d"), F.col("x.cell").alias("cell"))
    joined = pr.join(F.broadcast(sketch), ["d", "cell"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est")
    )


def sequence_match(
    df: DataFrame,
    pattern: str,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak: tuple[str, ...] = ("event_id",),
    max_events_per_trail: int | None = 1_000_000,
) -> DataFrame:
    """Regex over TRAIL SEQUENCES — the general form of
    :func:`pattern_match` (which hard-codes one A-then-B-without-C
    shape) and the engine's answer to SQL MATCH_RECOGNIZE: render each
    trail's ``field`` values, ordered by (time, tiebreak), as a single
    space-separated string `` v1 v2 ... vn `` (one leading and trailing
    space, so every token can be matched as ``" tok "`` without
    word-boundary edge cases), and keep trails where ``pattern`` finds a
    match (unanchored, like ``rlike``).

    Pattern language: any regex over the rendered string — e.g.
    ``" view click purchase "`` (three consecutive events),
    ``" signup ([^ ]+ )*purchase "`` (eventually-follows with arbitrary
    gap), ``" (view |click )+purchase "``. Stick to the
    alternation/class/star/plus subset and the SAME pattern runs
    verbatim in DuckDB/RE2 for oracle checks. ``field`` values must not
    contain spaces (event vocabularies don't) — ENFORCED: a spaced value
    would silently split into two tokens and corrupt every downstream
    match, so the aggregate raises on the first offending row
    (assert_true folded into the token column, zero extra jobs — same
    posture as the whale cap below). NULL renders as the empty token.

    Scale shape: one uuid shuffle into collect_list (map-side partial
    lists), the sort and regex run per trail JVM-side — no Python, no
    joins. The rendered sequence materializes one string PER TRAIL, so
    ``max_events_per_trail`` (default 1M ≈ tens of MB of string) raises
    loudly at execution if a whale trail would blow the aggregation
    buffer — the check rides the same aggregate (assert_true folded
    into the seq column, zero extra jobs); pass ``None`` to bypass for
    corpora whose whales are known-safe. Returns ``(uuid, seq)`` for
    matching trails — keeping ``seq`` makes the match auditable
    downstream."""
    val = F.coalesce(F.col(field).cast("string"), F.lit(""))
    val = F.coalesce(
        F.assert_true(
            ~val.contains(" "),
            F.concat(
                F.lit(
                    "sequence_match: field value contains a space and would "
                    "split into multiple tokens, corrupting the rendered "
                    f"sequence (field={field!r}, value="
                ),
                val,
                F.lit(")"),
            ),
        ).cast("string"),
        val,
    )
    ev = F.struct(
        F.col(time_col).alias("__t"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak)],
        val.alias("__v"),
    )
    seq = F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(ev)), lambda s: s["__v"]
            ),
            " ",
        ),
        F.lit(" "),
    )
    if max_events_per_trail is not None:
        seq = F.coalesce(
            F.assert_true(
                F.count(F.lit(1)) <= int(max_events_per_trail),
                F.lit(
                    "sequence_match: a trail exceeds max_events_per_trail="
                    f"{int(max_events_per_trail)}; its rendered sequence "
                    "would dominate the aggregation buffer. Raise the cap "
                    "explicitly or pass None to bypass."
                ),
            ).cast("string"),
            seq,
        )
    return (
        df.groupBy(uuid_col)
        .agg(seq.alias("seq"))
        .filter(F.col("seq").rlike(pattern))
    )


def pattern_match(
    df: DataFrame,
    first: str,
    then: str,
    without: str | None = None,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Sequence-pattern counts: occurrences of ``first → then`` with an
    optional ABSENCE constraint — no ``without`` event strictly between
    them (the "view → purchase with no error in between" class of trail
    query; regex-over-events restricted to the two-anchor + negation form
    that covers the reference's documented cursor-program patterns).

    Anchor = each ``then`` event; its match uses the most recent prior
    ``first`` (the tightest window, so the absence check is least likely
    to be vacuously broken — standard semantics). One uuid window pass
    carries both running columns; the per-trail aggregate folds map-side.
    Returns ``(uuid, n_then, n_matched)`` per trail.
    """
    w = (
        _trail_window(uuid_col, time_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_first = F.last(
        F.when(F.col(field) == first, F.col(time_col)), ignorenulls=True
    ).over(w)
    last_without = (
        F.last(
            F.when(F.col(field) == without, F.col(time_col)), ignorenulls=True
        ).over(w)
        if without is not None
        else F.lit(None).cast("long")
    )
    anchors = df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(field).alias("__f"),
        last_first.alias("__lf"),
        last_without.alias("__lw"),
    ).filter(F.col("__f") == then)
    matched = F.col("__lf").isNotNull() & (
        F.col("__lw").isNull() | (F.col("__lw") < F.col("__lf"))
    )
    return anchors.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("n_then"),
        F.sum(matched.cast("long")).alias("n_matched"),
    )


def time_to_convert(
    df: DataFrame,
    start: str,
    end: str,
    bucket: int = 86400,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Time-to-event distribution: per trail, the gap from the FIRST
    ``start`` event to the first ``end`` event strictly after it, bucketed
    into ``bucket``-second bins and counted — the funnel-latency /
    survival-curve input. Trails that start but never convert land in
    bucket -1 (the censored tail every survival analysis needs).

    One uuid-keyed aggregate (two conditional mins — the second via a
    min over (start-gated) end times), then a bucket-keyed count:
    map-side folds everywhere, output is histogram-sized.
    """
    t = F.col(time_col)
    per = df.groupBy(F.col(uuid_col).alias("uuid")).agg(
        F.min(F.when(F.col(field) == start, t)).alias("__s"),
    )
    ends = df.select(
        F.col(uuid_col).alias("uuid"), t.alias("__t"), F.col(field).alias("__f")
    ).filter(F.col("__f") == end)
    conv = (
        per.join(ends, "uuid", "left")
        .filter(F.col("__s").isNotNull())
        .groupBy("uuid", "__s")
        .agg(F.min(F.when(F.col("__t") > F.col("__s"), F.col("__t"))).alias("__e"))
    )
    b = F.when(
        F.col("__e").isNotNull(),
        ((F.col("__e") - F.col("__s")) / F.lit(int(bucket))).cast("long"),
    ).otherwise(F.lit(-1))
    return conv.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("trails")
    )


def rolling_active(
    df: DataFrame,
    window_days: int = 7,
    period: int = 86400,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Rolling N-day active trails per day — the DAU/WAU timeline. A
    distinct-over-sliding-window is not directly expressible without a
    quadratic self-join; instead each trail's DISTINCT active day
    contributes to the ``window_days`` day-buckets it keeps the trail
    "active" in, and a distinct count per bucket finishes the job.

    Shuffle accounting: per-trail distinct days collapse map-side
    (collect_set), the explode is ×window_days on TRAIL-DAY rows (not
    events), and the final countDistinct keys on calendar days. Days with
    zero activity simply don't appear (standard sparse timeline).
    Returns ``(day, active_trails)`` — ``day`` is the Unix day index of
    the WINDOW END, clamped to the last OBSERVED day: without the clamp,
    data ending on day D would emit partial rows for D+1..D+N-1 that read
    as complete (and collapsing) WAU values. The clamp is a broadcast
    1-row max, not a shuffle.
    """
    day = F.floor(F.col(time_col).cast("long") / F.lit(int(period))).cast("long")
    per = (
        df.select(F.col(uuid_col).alias("uuid"), day.alias("d"))
        .distinct()
    )
    maxd = per.agg(F.max("d").alias("__maxd"))
    spread = per.crossJoin(F.broadcast(maxd)).select(
        "uuid",
        F.explode(
            F.sequence(
                F.col("d"),
                F.least(
                    F.col("d") + F.lit(int(window_days) - 1), F.col("__maxd")
                ),
            )
        ).alias("day"),
    )
    return spread.groupBy("day").agg(
        F.countDistinct("uuid").alias("active_trails")
    )


def attribution_linear(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    lookback: int | None = None,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    id_col: str = "event_id",
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: every conversion
    splits exactly 10000 basis points over its eligible prefix touches —
    integer division with the remainder going to the MOST RECENT touch,
    so credit conserves exactly (``sum(credit_bp) = 10000 ×
    conversions``, touched or not: conversions with no eligible touch
    credit '(none)'). Eligibility = strictly before the conversion in
    (time, id) trail order and within ``lookback`` seconds.

    Scale: one uuid-keyed join pairs each trail's touches with its
    conversions — the pairing is per-trail (bounded by trail size, the
    same bound every per-trail operator carries), never cross-trail; the
    credit windows partition by conversion id and the final aggregate
    keys on ≤ |touches|+1 channels. For whale trails route through the
    binned ``operators.joins.range_join`` instead of the raw pairing.

    Returns ``(channel, conversions_touched, credit_bp)``.
    """
    conv = df.filter(F.col(field) == conversion).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__ct"),
        F.col(id_col).alias("__cid"),
    )
    tch = df.filter(F.col(field).isin(list(touches))).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__tt"),
        F.col(id_col).alias("__tid"),
        F.col(field).alias("__ch"),
    )
    before = (F.col("__tt") < F.col("__ct")) | (
        (F.col("__tt") == F.col("__ct")) & (F.col("__tid") < F.col("__cid"))
    )
    cond = before
    if lookback is not None:
        cond = cond & (F.col("__tt") >= F.col("__ct") - F.lit(int(lookback)))
    from .dedup import _materialize

    # conv feeds the pairing join AND the untouched anti-join — pin the
    # projected conversions subset so events aren't re-scanned per
    # consumer (plan audit: 5 scans per attribution query)
    conv = _materialize(conv)
    j = conv.join(tch, "__u").filter(cond)
    wn = Window.partitionBy("__u", "__cid")
    wr = Window.partitionBy("__u", "__cid").orderBy(
        F.desc("__tt"), F.desc("__tid")
    )
    # credited feeds the per-channel aggregate AND the untouched
    # anti-join; unpersisted, the pairing join + credit windows ran twice
    credited = _materialize(
        j.withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn("__rn", F.row_number().over(wr))
        .withColumn(
            "__bp",
            F.when(
                F.col("__rn") == 1,
                F.lit(10000)
                - (F.col("__n") - 1) * F.expr("10000 div __n"),
            ).otherwise(F.expr("10000 div __n")),
        )
    )
    per_channel = credited.groupBy(F.col("__ch").alias("channel")).agg(
        F.countDistinct("__u", "__cid").alias("conversions_touched"),
        F.sum("__bp").cast("long").alias("credit_bp"),
    )
    untouched = (
        conv.join(
            credited.select("__u", "__cid").distinct(), ["__u", "__cid"], "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("(none)").alias("channel"),
            F.col("n").alias("conversions_touched"),
            (F.col("n") * 10000).cast("long").alias("credit_bp"),
        )
        .filter(F.col("conversions_touched") > 0)
    )
    return per_channel.unionByName(untouched)


def gap_histogram(
    df: DataFrame,
    field: str | None = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Inter-event-time distribution: per-trail consecutive gaps bucketed
    into whole-bit (log2) bins — ``bucket = bit_length(gap)`` (0 for
    gap 0) — optionally keyed by the PREVIOUS event's ``field`` value
    ("how long after a click does the next event come"). Integer bit
    buckets are the engine-portable log histogram (same family as
    `unigram_surprisal`); one uuid window shuffle + a ≤64×lexicon-keyed
    aggregate.

    Returns ``(value, gap_bucket, n_gaps)`` (``value`` omitted when
    ``field`` is None).
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    gap = F.col(time_col) - F.lag(F.col(time_col)).over(w)
    cols = {"__gap": gap}
    if field is not None:
        cols["value"] = F.lag(F.col(field)).over(w)
    out = df.withColumns(cols).filter(F.col("__gap").isNotNull())
    bucket = F.when(F.col("__gap") <= 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("__gap")))
    ).cast("long")
    keys = (["value"] if field is not None else []) + []
    return out.select(*(keys + [bucket.alias("gap_bucket")])).groupBy(
        *(keys + ["gap_bucket"])
    ).agg(F.count(F.lit(1)).alias("n_gaps"))


def recency_scores(
    df: DataFrame,
    t_ref: int,
    half_life: int,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    max_buckets: int = 40,
) -> DataFrame:
    """Recency-weighted engagement per trail: every event contributes
    ``2^-b`` where ``b = floor((t_ref - time) / half_life)`` — an
    exponential decay QUANTIZED to whole half-life buckets, which makes
    the score a dyadic rational representable EXACTLY as a Q``max_buckets``
    fixed-point integer (``score_q = Σ 2^(max_buckets - b)``). No libm
    ``exp``/``pow`` anywhere, so the result is bit-identical across
    engines and partitionings — the same integer-math discipline as
    `activity_histogram`/`gap_histogram` (continuous-decay floats are NOT
    reproducible: the sum order changes per run and libm differs per
    engine at the ulp level). Events newer than ``t_ref`` clamp to full
    weight; events older than ``max_buckets`` half-lives contribute 0.

    Returns ``(uuid, score_q, n_events, last_seen)`` with
    ``score = score_q / 2^max_buckets``. Single map-side-combined
    aggregate keyed by uuid — never event-sized on the wire. The partial
    sum is carried as DECIMAL and asserted to fit int64 before the cast
    (a trail needs > 2^(63-max_buckets) full-weight events to trip it —
    8.4M at the default Q40; raise/lower ``max_buckets`` to trade decay
    horizon against headroom).
    """
    if half_life <= 0:
        raise ValueError(f"recency_scores: half_life must be > 0, got {half_life}")
    if not (0 < max_buckets <= 62):
        raise ValueError(
            f"recency_scores: max_buckets must be in (0, 62], got {max_buckets}"
        )
    b = F.greatest(
        F.floor((F.lit(t_ref) - F.col(time_col)) / half_life).cast("long"), F.lit(0)
    )
    # pyspark's F.shiftleft only takes a literal shift count — go through
    # the SQL form, where the count may be a column
    weight = F.expr(
        f"CASE WHEN __b <= {max_buckets}"
        f" THEN shiftleft(CAST(1 AS BIGINT), CAST({max_buckets} - __b AS INT))"
        f" ELSE CAST(0 AS BIGINT) END"
    )
    total = F.sum(weight.cast("decimal(38,0)"))
    fits = total <= F.lit(2**63 - 1).cast("decimal(38,0)")
    return df.withColumn("__b", b).groupBy(F.col(uuid_col).alias("uuid")).agg(
        # assert_true folded into the projected column: zero extra jobs
        F.when(
            F.assert_true(fits, "recency_scores: score_q overflows int64").isNull(),
            total.cast("long"),
        ).alias("score_q"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col(time_col)).alias("last_seen"),
    )


def distribution_drift(
    df: DataFrame,
    t_split: int,
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = TIME_COL,
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-key distribution drift between two time windows as EXACT
    total-variation distance -- the data-pipeline health check that
    catches a source whose value distribution shifted between ingest
    batches (schema stays identical, the histogram moves).

    Events before ``t_split`` form window A, the rest window B; values
    are histogrammed into fixed-width bins (``floor(value / bin_width)``
    -- one IEEE division + floor, identical in any engine; NULL values
    form their own bin, matching SQL GROUP BY). For each key::

        TVD = 1/2 * sum_bins | cnt_a/tot_a - cnt_b/tot_b |

    computed over the common denominator as the exact integer
    ``tvd_ppm = sum|cnt_a*tot_b - cnt_b*tot_a| * 1_000_000
    div (2 * tot_a * tot_b)`` in decimal(38,0) arithmetic -- products,
    sum and truncating division are all exact integers, so the score is
    bit-identical across engines and partitionings (float summation
    order never enters) and the quotient is bounded by 1e6 (TVD <= 1),
    so the final long cast cannot overflow at ANY data scale; the
    decimal intermediates hold up to ~7e15 events per window. NULL
    ``tvd_ppm`` when either window is empty for the key.

    Plan shape: ONE scan; groupBy(key, bin) with conditional counts
    (map-side combined), then a histogram-sized join + groupBy(key) --
    every post-scan key is (keys x bins)-sized, metadata-scale at
    100 TB regardless of event count.

    Reference analog: TrailDB exposes per-field value frequencies
    (`src/tdb_encode_model.c:444-486`) but no cross-window comparison;
    this is the SS2.9-style extension a training-data pipeline needs.
    """
    if bin_width <= 0:
        raise ValueError(
            f"distribution_drift: bin_width must be > 0, got {bin_width}"
        )
    bin_ = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
    in_a = (F.col(time_col) < F.lit(t_split)).cast("long")
    per_bin = df.groupBy(
        F.col(key_col).alias("key"), bin_.alias("bin")
    ).agg(
        F.sum(in_a).alias("cnt_a"),
        F.sum(1 - in_a).alias("cnt_b"),
    )
    totals = per_bin.groupBy("key").agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    dec = "decimal(38,0)"
    ca, cb = F.col("cnt_a").cast(dec), F.col("cnt_b").cast(dec)
    ta, tb = F.col("tot_a").cast(dec), F.col("tot_b").cast(dec)
    out = (
        per_bin.join(totals, "key")
        .groupBy("key")
        .agg(
            F.first("tot_a").alias("tot_a"),
            F.first("tot_b").alias("tot_b"),
            F.sum(F.abs(ca * tb - cb * ta)).alias("numer_d"),
        )
    )
    return out.select(
        "key",
        "tot_a",
        "tot_b",
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0),
            F.expr(
                f"numer_d * CAST(1000000 AS {dec}) "
                f"div (CAST(2 AS {dec}) * CAST(tot_a AS {dec})"
                f" * CAST(tot_b AS {dec}))"
            ),
        ).alias("tvd_ppm"),
    )


def rolling_median(
    df: DataFrame,
    k: int = 5,
    value_col: str = "value",
    uuid_col: str = "uuid",
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-trail rolling median of ``value_col`` over the last ``k``
    events — the smoothed engagement/latency signal a cursor program
    would compute with a ring buffer (reference idiom: iterate a trail,
    keep the last k values, emit a robust statistic per step), expressed
    as ONE window aggregate so it distributes.

    Ordering is (time, tiebreak) — the same deterministic tiebreak
    discipline as every trail window in this package — and the frame is
    ``ROWS k-1 PRECEDING .. CURRENT``. Median is order-free and exact:
    for an odd in-frame count it IS a data value; for an even count both
    engines average the two middle values with one IEEE add + divide, so
    the result is oracle-checkable without rounding tricks. NULL values
    are ignored by the aggregate (an all-NULL frame yields NULL).

    Plan shape: one shuffle on uuid (the trail-window cost every A-family
    operator pays), zero Python. Whale trails bear the usual
    single-partition window cost — same posture as session_stats, with
    apply_to_trails_chunked as the beyond-memory escape hatch.
    """
    if k < 1:
        raise ValueError(f"rolling_median: k must be >= 1, got {k}")
    w = (
        Window.partitionBy(uuid_col)
        .orderBy(F.col(time_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-(k - 1), 0)
    )
    return df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("time"),
        F.col(tiebreak_col).alias("event_id"),
        F.col(value_col).alias("value"),
        F.expr(f"percentile({value_col}, 0.5)").over(w).alias("rolling_med"),
        F.count(value_col).over(w).alias("n_window"),
    )


def value_histogram(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    bin_width: float = 1.0,
) -> DataFrame:
    """Fixed-width value histogram per key — ``(key, bin, cnt)`` with
    ``bin = floor(value / bin_width)`` (NULL values form their own bin).
    The mergeable building block under :func:`distribution_drift` and
    the streaming drift monitor: histograms ADD, so partials from any
    batching/partitioning combine by (key, bin) sum. One map-side
    combined aggregate; output is histogram-sized."""
    if bin_width <= 0:
        raise ValueError(
            f"value_histogram: bin_width must be > 0, got {bin_width}"
        )
    return df.groupBy(
        F.col(key_col).alias("key"),
        F.floor(F.col(value_col) / F.lit(float(bin_width)))
        .cast("long")
        .alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_tvd(ha: DataFrame, hb: DataFrame) -> DataFrame:
    """Exact total-variation distance between two ``(key, bin, cnt)``
    histograms (:func:`value_histogram` outputs) — the pairwise form of
    :func:`distribution_drift` for when the two sides come from
    DIFFERENT sources: a live streaming histogram vs a frozen reference,
    this week's ingest vs last week's. Same decimal(38,0) integer
    arithmetic: ``tvd_ppm`` is bit-identical across engines and NULL
    when either side has no mass for the key.

    Plan shape: full outer join on (key, bin) with zero-fill, then one
    key-sized aggregate — everything histogram-sized.
    """
    a = ha.select(
        F.col("key").alias("key_a"), F.col("bin").alias("bin_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = hb.select(
        F.col("key").alias("key_b"), F.col("bin").alias("bin_b"),
        F.col("cnt").alias("cnt_b"),
    )
    # NULL-SAFE bin equality: the NULL-value bin is a real bin on both
    # sides (distribution_drift groups it as one), and a plain equi-join
    # would split it into two one-sided rows — inflating TVD for any key
    # whose NULL rate did NOT drift
    m = a.join(
        b,
        (F.col("key_a") == F.col("key_b"))
        & F.col("bin_a").eqNullSafe(F.col("bin_b")),
        "full_outer",
    ).select(
        F.coalesce(F.col("key_a"), F.col("key_b")).alias("key"),
        F.coalesce(F.col("cnt_a"), F.lit(0)).alias("cnt_a"),
        F.coalesce(F.col("cnt_b"), F.lit(0)).alias("cnt_b"),
    )
    totals = m.groupBy("key").agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    dec = "decimal(38,0)"
    ca, cb = F.col("cnt_a").cast(dec), F.col("cnt_b").cast(dec)
    out = (
        m.join(totals, "key")
        .groupBy("key")
        .agg(
            F.first("tot_a").alias("tot_a"),
            F.first("tot_b").alias("tot_b"),
            F.sum(
                F.abs(
                    ca * F.col("tot_b").cast(dec)
                    - cb * F.col("tot_a").cast(dec)
                )
            ).alias("numer_d"),
        )
    )
    return out.select(
        "key",
        "tot_a",
        "tot_b",
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0),
            F.expr(
                f"numer_d * CAST(1000000 AS {dec}) "
                f"div (CAST(2 AS {dec}) * CAST(tot_a AS {dec})"
                f" * CAST(tot_b AS {dec}))"
            ),
        ).alias("tvd_ppm"),
    )


def trend_by_key(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-key ingest trend: the ordinary-least-squares slope of
    events-per-bucket over time, as EXACT integer arithmetic -- the
    capacity-planning signal ("which sources are growing/dying") that a
    float regression would make engine- and partitioning-dependent.

    Buckets are ``time div bucket_seconds``; the regression runs over
    the GLOBAL bucket range [min, max] of the whole input, and buckets
    where a key has no events count as y = 0 -- without zero-fill a key
    active only on its first and last day would show no trend. The
    trick that keeps this one-aggregate cheap: zero buckets contribute
    nothing to sum_y / sum_xy, while n, Sx, Sxx over the full range are
    closed-form integers (n buckets, Sx = n(n-1) div 2,
    Sxx = n(n-1)(2n-1) div 6 -- both divisions exact), so NOTHING is
    ever exploded per empty bucket::

        slope = (n*sum_xy - Sx*sum_y) / (n*Sxx - Sx*Sx)    [den > 0, n >= 2]

    Returned as exact int64 ``slope_num``/``slope_den`` (decimal-guarded
    against silent wraparound) plus ``slope_ppm_per_bucket`` =
    sign(num) * (|num| * 1e6 div den): truncating division on
    NON-NEGATIVE operands, so Spark ``div`` (truncate toward zero) and
    DuckDB ``//`` (floor) agree even for negative slopes. NULL slope
    when the range has a single bucket.

    Plan shape: one scan; groupBy(key, bucket) map-side combine; one
    metadata-scale min/max broadcast; groupBy(key). Everything after the
    scan is (keys x active-buckets)-sized -- holds at 100 TB.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"trend_by_key: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    per = df.select(F.col(key_col).alias("key"), b.alias("b")).groupBy(
        "key", "b"
    ).agg(F.count(F.lit(1)).alias("y"))
    return trend_from_counts(per)


def trend_from_counts(per: DataFrame) -> DataFrame:
    """:func:`trend_by_key`'s regression applied to a PREBUILT
    per-(key, bucket) count table ``(key, b, y)`` — point it at
    `streaming.ingest.histogram_current` state (stream histogrammed on
    time buckets) and the exact batch slope semantics run against
    histogram-sized state with zero event rescans; the third leg of the
    streaming monitoring trio (drift, anomalies, trend). Identical
    math and columns as the batch form."""
    rng = F.broadcast(
        per.agg(F.min("b").alias("b_lo"), F.max("b").alias("b_hi"))
    )
    dec = "decimal(38,0)"
    sums = (
        per.crossJoin(rng)
        .select(
            "key",
            (F.col("b") - F.col("b_lo")).alias("x"),
            "y",
            (F.col("b_hi") - F.col("b_lo") + 1).alias("n"),
        )
        .groupBy("key")
        .agg(
            F.first("n").alias("n"),
            F.sum("y").alias("sum_y"),
            F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sum_xy"),
        )
        # closed-form x-moments of the FULL bucket range (exact integer
        # divisions: n(n-1) is even, n(n-1)(2n-1) divisible by 6)
        .withColumn("sx", F.expr("n * (n - 1) div 2"))
        .withColumn("sxx", F.expr("n * (n - 1) * (2 * n - 1) div 6"))
        .withColumn(
            "num_d",
            F.expr(
                f"CAST(n AS {dec}) * sum_xy"
                f" - CAST(sx AS {dec}) * CAST(sum_y AS {dec})"
            ),
        )
        .withColumn(
            "den_d",
            F.expr(
                f"CAST(n AS {dec}) * CAST(sxx AS {dec})"
                f" - CAST(sx AS {dec}) * CAST(sx AS {dec})"
            ),
        )
    )
    i64 = F.lit(2**63 - 1).cast(dec)
    fits = (F.abs(F.col("num_d")) <= i64) & (F.col("den_d") <= i64)
    has_slope = F.col("n") >= 2
    return sums.select(
        "key",
        F.col("n").alias("n_buckets"),
        F.col("sum_y").alias("total"),
        F.when(
            F.assert_true(
                fits, "trend_by_key: slope terms overflow int64"
            ).isNull(),
            F.when(has_slope, F.col("num_d").cast("long")),
        ).alias("slope_num"),
        F.when(has_slope, F.col("den_d").cast("long")).alias("slope_den"),
        F.when(
            has_slope,
            F.expr(
                f"CAST(CASE WHEN num_d < 0 THEN -1 ELSE 1 END AS BIGINT)"
                f" * CAST(abs(num_d) * CAST(1000000 AS {dec})"
                f" div den_d AS BIGINT)"
            ),
        ).alias("slope_ppm_per_bucket"),
    )


def anomalous_buckets(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 86400,
    k: int = 3,
) -> DataFrame:
    """Ingest-volume anomaly detection: per-key time buckets whose event
    count deviates from that key's mean by more than ``k`` standard
    deviations — spikes AND blackouts (a bucket with ZERO events is a
    first-class candidate: "the source went dark" is the anomaly ops
    most wants to catch). The k-sigma test is evaluated as an EXACT
    integer inequality, so flagging is bit-identical across engines::

        (y - mean)² > k²·var   ⟺   (n·y - S)² > k²·(n·Q - S²)

    with S = Σy, Q = Σy² over ALL n buckets of the global range
    (zero buckets contribute nothing to S/Q, so one aggregate over
    present buckets suffices). Strict >: a key with constant volume
    (var = 0) flags any deviating bucket and nothing else.

    The keys × buckets grid IS materialized — deliberately: it is
    histogram-sized (the same size class every drift operator already
    shuffles), and it is what lets zero buckets be flagged. Returns only
    the anomalous rows: ``(key, bucket, y, dev_num, bound_num)`` where
    ``dev_num = (n·y - S)²`` and ``bound_num = k²·(n·Q - S²)`` (exact
    int64, decimal-guarded) — dev/bound > 1 is the flag, and the ratio
    doubles as an anomaly magnitude for ranking.

    Plan shape: groupBy(key, bucket) map-side combine; one
    metadata-scale min/max broadcast; per-key one-row stats; a
    per-key sequence explode bounded by the bucket range; broadcast-able
    stats join. Nothing event-sized after the scan.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"anomalous_buckets: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    per = df.select(F.col(key_col).alias("key"), b.alias("b")).groupBy(
        "key", "b"
    ).agg(F.count(F.lit(1)).alias("y"))
    return anomalies_from_counts(per, k=k)


def anomalies_from_counts(per: DataFrame, k: int = 3) -> DataFrame:
    """The k-sigma test of :func:`anomalous_buckets` applied to a
    PREBUILT per-(key, bucket) count table ``(key, b, y)`` — the live
    half of the streaming monitor: point it at
    `streaming.ingest.histogram_current` state (with the stream's
    histogram keyed on TIME buckets, i.e. ``value_col=time_col``) and
    the exact batch anomaly semantics run against histogram-sized
    state, no events rescanned. Identical math, flags and columns as
    the batch form (see its docstring for the integer inequality)."""
    if k < 1:
        raise ValueError(f"anomalies_from_counts: k must be >= 1, got {k}")
    from .dedup import _materialize

    # per feeds the range aggregate, the per-key stats and the grid
    # fill; when per is the batch form's corpus aggregate each consumer
    # re-ran the full scan (plan audit: 6 scans for q128). per and stats
    # are histogram-sized.
    per = _materialize(per)
    rng = F.broadcast(
        per.agg(F.min("b").alias("b_lo"), F.max("b").alias("b_hi"))
    )
    dec = "decimal(38,0)"
    stats = _materialize(
        per.crossJoin(rng)
        .groupBy("key")
        .agg(
            F.first(F.col("b_hi") - F.col("b_lo") + 1).alias("n"),
            F.sum("y").alias("s"),
            F.sum((F.col("y") * F.col("y")).cast(dec)).alias("q"),
        )
    )
    # the keys x buckets grid (histogram-sized): every bucket of the
    # global range for every key, zero-filled via left join
    grid = (
        stats.select("key")
        .crossJoin(rng)
        .select(
            "key", F.explode(F.sequence(F.col("b_lo"), F.col("b_hi"))).alias("b")
        )
    )
    filled = grid.join(per, ["key", "b"], "left").select(
        "key", "b", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    n, s, q = (
        F.col("n").cast(dec),
        F.col("s").cast(dec),
        F.col("q"),
    )
    dev = n * F.col("y").cast(dec) - s
    dev_sq = dev * dev
    bound = F.lit(k * k).cast(dec) * (n * q - s * s)
    i64 = F.lit(2**63 - 1).cast(dec)
    fits = (dev_sq <= i64) & (bound <= i64)
    return (
        filled.join(stats, "key")
        .filter(dev_sq > bound)
        .select(
            "key",
            F.col("b").alias("bucket"),
            "y",
            F.when(
                F.assert_true(
                    fits, "anomalous_buckets: terms overflow int64"
                ).isNull(),
                dev_sq.cast("long"),
            ).alias("dev_num"),
            bound.cast("long").alias("bound_num"),
        )
    )


def attribution_markov(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    max_channels: int = 1000,
    *tiebreak: str,
) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution — the model that
    replaces last/first-touch heuristics with what the journey graph
    actually says: build the first-order chain over
    {START, touches..., CONV, NULL}, and a channel's credit is its
    REMOVAL EFFECT — how much total conversion probability drops when
    the channel is deleted (its inbound transitions redirected to NULL).
    The standard reference: Anderl et al. 2014 (SSRN 2343077).

    Journeys: each trail splits at conversions (journey j = events after
    the j-th conversion, up to and including the next); a journey ends
    in CONV or, if the trail runs out first, NULL. Non-touch events are
    ignored. Transition counts are the ONLY distributed product — one
    uuid shuffle + a (channels+2)²-bounded aggregate, the exact shuffle
    shape of `transition_counts`. The absorption solve runs on the
    DRIVER over that lexicon-sized matrix (numpy linear solve — the
    `semantic_dedup` centroid policy: collect is metadata-scale, never
    event-scale), guarded by ``max_channels``.

    Returns ``(channel, removal_effect, attributed_conversions)`` —
    removal_effect in [0, 1]; credits apportion total conversions by
    normalized removal effects. Floats ARE engine-native here (a linear
    solve has no integer form) — this operator is differential-tested
    against an independent sequential implementation instead of a SQL
    oracle, like `learn_bpe`.
    """
    import numpy as np

    if not touches:
        raise ValueError("attribution_markov: touches must be non-empty")
    if conversion in touches:
        raise ValueError("attribution_markov: conversion cannot be a touch")
    w = _trail_window(uuid_col, time_col, *tiebreak)
    is_conv = F.col(field) == conversion
    kept = df.filter(is_conv | F.col(field).isin(list(touches)))
    # journey index = conversions strictly before this event in the trail
    # first row of a trail has an EMPTY strict-prefix frame -> SUM is
    # NULL, not 0 — coalesce or the first journey splits in two
    j = F.coalesce(
        F.sum(is_conv.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    seq = (
        kept.withColumn("__j", j)
        .groupBy(F.col(uuid_col).alias("uuid"), F.col("__j"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(time_col).alias("t"),
                        *[F.col(c).alias(c) for c in tiebreak],
                        F.col(field).alias("s"),
                    )
                )
            ).alias("ev")
        )
        .select(F.expr("transform(ev, x -> x.s)").alias("states"))
    )
    # prepend START; append NULL when the journey did not convert
    full = seq.select(
        F.concat(
            F.array(F.lit("__START__")),
            F.col("states"),
            F.when(
                F.element_at(F.col("states"), -1) != conversion,
                F.array(F.lit("__NULL__")),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("states")
    )
    pairs = full.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("states"), 1, F.size("states") - 1),
                F.slice(F.col("states"), 2, F.size("states") - 1),
                lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    rows = counts.collect()  # (channels+2)²-bounded — metadata-scale
    chans = sorted(
        ({r["src"] for r in rows} | {r["dst"] for r in rows})
        - {"__START__", "__NULL__", conversion}
    )
    if len(chans) > max_channels:
        raise ValueError(
            f"attribution_markov: {len(chans)} channels exceed "
            f"max_channels={max_channels} — the driver-side solve is "
            "O(channels^4); raise the cap only with driver memory to match"
        )
    states = ["__START__"] + chans  # transient states
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    trans = np.zeros((n, n))
    to_conv = np.zeros(n)
    out_tot = np.zeros(n)
    for r in rows:
        if r["src"] not in idx:
            continue
        i = idx[r["src"]]
        out_tot[i] += r["c"]
        if r["dst"] == conversion:
            to_conv[i] += r["c"]
        elif r["dst"] in idx:
            trans[i, idx[r["dst"]]] += r["c"]
    with np.errstate(invalid="ignore", divide="ignore"):
        P = np.where(out_tot[:, None] > 0, trans / out_tot[:, None], 0.0)
        b = np.where(out_tot > 0, to_conv / out_tot, 0.0)

    def absorb(P_, b_):
        # x = P x + b on transient states; START is row 0
        return float(np.linalg.solve(np.eye(len(b_)) - P_, b_)[0])

    p_full = absorb(P, b)
    total_conv = float(sum(r["c"] for r in rows if r["dst"] == conversion))
    effects = []
    for c in chans:
        k = [i for i, s in enumerate(states) if s != c]
        # removing c: transitions INTO c become NULL (dropped mass)
        effects.append(
            (c, 1.0 - (absorb(P[np.ix_(k, k)], b[k]) / p_full if p_full > 0 else 0.0))
        )
    tot_eff = sum(e for _, e in effects)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                c,
                float(e),
                float(total_conv * e / tot_eff) if tot_eff > 0 else 0.0,
            )
            for c, e in effects
        ],
        "channel string, removal_effect double, attributed_conversions double",
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 12
) -> DataFrame:
    """Engine-portable HyperLogLog distinct-count estimate -- the
    unbounded-universe sibling of `lexicon_size`'s
    approx_count_distinct, built so the WHOLE sketch is
    oracle-checkable: deterministic md5 hashing (the package's 60-bit
    family), integer registers, and the register sum computed as an
    EXACT dyadic integer instead of the usual float harmonic mean.

    Construction (Flajolet et al. 2007): bucket = top ``p`` bits of the
    60-bit hash; rank = leading-zero count of the remaining
    ``q = 60 - p`` bits + 1; register = max rank per bucket. The
    estimate is ``alpha_m * m^2 / sum(2^-r)`` -- the trap is that the
    float sum depends on summation order. Here it is the integer
    ``numer = sum(2^(R - r)) + empty * 2^R`` with the CONSTANT
    R = q + 1 (the maximum possible rank -- no data-dependent pass):
    every term is an int64 power of two, the sum is exact in
    decimal(38,0) (<= m * 2^57 < 2^73), so every engine and
    partitioning produces the IDENTICAL sketch and estimate:
    ``alpha * m^2 * 2^R / numer`` -- two correctly-rounded IEEE ops on
    exact operands (alpha and m are literals baked into both sides).
    No small/large-range corrections (they need libm ln; the raw
    estimator is the portable subset -- biased low below ~2.5m
    distinct, where exact counting is the right tool anyway).

    Scale: ONE groupBy(bucket) with map-side combine -- the exchange
    carries <= m = 2^p rows per partition, the sketch is m rows
    forever, and register tables MERGE by max (the countmin posture).

    Returns one row: ``(m, n_present, numer_d, estimate)``.
    """
    out = hll_distinct_by_key(
        df.select(F.lit("__all__").alias("__k"), F.col(col)), "__k", col, p
    ).drop("key")
    # empty input still yields the one-row EMPTY sketch (n_present = 0,
    # numer = m·2^R, estimate = alpha·m — the raw-estimator floor):
    # monitoring pipelines read this row, they don't branch on 0 rows
    m = 1 << p
    big_r = 60 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer0 = float(m) * float(2**big_r)
    base = df.sparkSession.range(1).select(
        F.lit(m).alias("m"),
        F.lit(0).cast("long").alias("n_present"),
        F.lit(numer0).alias("numer_d"),
        F.lit(alpha * m * m * float(2**big_r) / numer0).alias("estimate"),
    )
    merged = base.join(
        out.select(
            F.col("m").alias("m2"),
            F.col("n_present").alias("np2"),
            F.col("numer_d").alias("nd2"),
            F.col("estimate").alias("es2"),
        ),
        F.lit(True),
        "left",
    )
    return merged.select(
        F.coalesce(F.col("m2"), F.col("m")).alias("m"),
        F.coalesce(F.col("np2"), F.col("n_present")).alias("n_present"),
        F.coalesce(F.col("nd2"), F.col("numer_d")).alias("numer_d"),
        F.coalesce(F.col("es2"), F.col("estimate")).alias("estimate"),
    )


def hll_distinct_by_key(
    df: DataFrame, key_col: str, col: str, p: int = 12
) -> DataFrame:
    """Per-key :func:`hll_distinct` -- "distinct users per source" /
    "distinct tokens per language" at 100 TB without a
    count-distinct shuffle of the raw pairs: state is <= m = 2^p
    registers PER KEY (keys x m rows total, mergeable by max), one
    groupBy((key, bucket)) exchange. Same dyadic-exact estimator, same
    oracle-checkability, one row per key.
    """
    from ..functions.core import md5_60

    if not (4 <= p <= 16):
        raise ValueError(f"hll_distinct: p must be in [4, 16], got {p}")
    m = 1 << p
    q = 60 - p
    big_r = q + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = md5_60(F.col(col))
    bucket = F.shiftright(h, q)
    rest = h.bitwiseAND(F.lit((1 << q) - 1))
    rank = F.when(rest == 0, F.lit(big_r)).otherwise(
        F.lit(q) - F.length(F.bin(rest)) + 1
    )
    regs = (
        df.select(F.col(key_col).alias("key"), bucket.alias("b"), rank.alias("r"))
        .groupBy("key", "b")
        .agg(F.max("r").alias("r"))
    )
    dec = "decimal(38,0)"
    return (
        regs.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(
                F.expr(
                    f"CAST(shiftleft(CAST(1 AS BIGINT), {big_r} - r) AS {dec})"
                )
            ).alias("present_sum"),
        )
        .select(
            "key",
            F.lit(m).alias("m"),
            "n_present",
            (
                F.coalesce(F.col("present_sum"), F.lit(0).cast(dec))
                + (F.lit(m).cast(dec) - F.col("n_present").cast(dec))
                * F.expr(
                    f"CAST(shiftleft(CAST(1 AS BIGINT), {big_r}) AS {dec})"
                )
            ).alias("numer_dec"),
        )
        .select(
            "key",
            "m",
            "n_present",
            F.col("numer_dec").cast("double").alias("numer_d"),
            (
                F.lit(alpha * m * m) * F.lit(float(2 ** big_r))
                / F.col("numer_dec").cast("double")
            ).alias("estimate"),
        )
    )


def volume_correlation_pairs(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairwise Pearson correlation of per-bucket event volumes between
    every two keys — "which event types move together" (shared upstream
    cause, coupled features, bot bursts). All FOUR moments are exact
    integers over the zero-filled global bucket range (the
    `trend_by_key` trick: zero buckets contribute nothing to sums, n
    comes from the range), so the only floats are the final
    ``num / sqrt(dx·dy)`` — three correctly-rounded IEEE ops on exact
    operands, identical in any engine, rounded half-up to 6 places::

        num = n·Σxy − Σx·Σy     dx = n·Σxx − (Σx)²    dy likewise

    Keys with zero variance (constant volume — dx = 0) pair to NULL
    correlation rather than dividing by zero.

    Plan shape: groupBy(key, bucket) map-side combine; bucket-keyed
    self-join of the per-bucket count table (histogram-sized, never
    event-sized: (keys × buckets) rows in, (key-pairs × buckets)
    candidates out, bounded by lexicon² × range); per-pair one-row
    aggregates. Products are decimal(38,0)-guarded.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"volume_correlation_pairs: bucket_seconds must be > 0, "
            f"got {bucket_seconds}"
        )
    from .dedup import _materialize

    b = F.expr(f"{time_col} div {bucket_seconds}")
    # per feeds the range aggregate, the per-key stats and BOTH sides of
    # the cross-moment self-join — unpersisted, each consumer re-ran the
    # corpus scan+aggregate (plan audit: 5 scans for q132). per/stats
    # are histogram-/lexicon-sized.
    per = _materialize(
        df.select(F.col(key_col).alias("key"), b.alias("b")).groupBy(
            "key", "b"
        ).agg(F.count(F.lit(1)).alias("y"))
    )
    rng = F.broadcast(
        per.agg(F.min("b").alias("b_lo"), F.max("b").alias("b_hi"))
    )
    dec = "decimal(38,0)"
    # per-key first moments over the zero-filled range
    stats = _materialize(
        per.groupBy("key").agg(
            F.sum("y").alias("s"),
            F.sum((F.col("y") * F.col("y")).cast(dec)).alias("q"),
        )
    )
    # cross-moment: only buckets where BOTH keys are non-zero contribute
    # to Σxy, so the bucket-keyed equi self-join suffices
    a, c = per.alias("a"), per.alias("c")
    xy = (
        a.join(c, (F.col("a.b") == F.col("c.b")) & (F.col("a.key") < F.col("c.key")))
        .groupBy(F.col("a.key").alias("key_a"), F.col("c.key").alias("key_b"))
        .agg(F.sum((F.col("a.y") * F.col("c.y")).cast(dec)).alias("sxy"))
    )
    n_col = (F.col("b_hi") - F.col("b_lo") + 1).alias("n")
    sa = stats.select(
        F.col("key").alias("key_a"), F.col("s").alias("s_a"), F.col("q").alias("q_a")
    )
    sb = stats.select(
        F.col("key").alias("key_b"), F.col("s").alias("s_b"), F.col("q").alias("q_b")
    )
    # pair base = lexicon² (metadata-scale) so pairs with NO common
    # bucket (sxy = 0 — strongly anti-correlated volumes) still appear
    base = sa.crossJoin(sb).filter(F.col("key_a") < F.col("key_b"))
    j = (
        base.join(xy, ["key_a", "key_b"], "left")
        .crossJoin(rng)
        .select(
            "key_a",
            "key_b",
            F.coalesce(F.col("sxy"), F.lit(0).cast(dec)).alias("sxy"),
            "s_a",
            "q_a",
            "s_b",
            "q_b",
            n_col,
        )
    )
    n = F.col("n").cast(dec)
    num = n * F.col("sxy") - F.col("s_a").cast(dec) * F.col("s_b").cast(dec)
    dx = n * F.col("q_a") - F.col("s_a").cast(dec) * F.col("s_a").cast(dec)
    dy = n * F.col("q_b") - F.col("s_b").cast(dec) * F.col("s_b").cast(dec)
    return j.select(
        "key_a",
        "key_b",
        F.col("n").alias("n_buckets"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        ).alias("corr"),
    )


def cdf_drift(
    df: DataFrame,
    t_split: int,
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = TIME_COL,
    bin_width: float = 1.0,
) -> DataFrame:
    """CDF-based drift between two time windows, complementing
    :func:`distribution_drift`'s TVD with the two classic
    cumulative statistics — both exact integers::

        KS  = max_bins |CDF_a - CDF_b|          (shift-sensitive)
        EMD = sum_bins |CDF_a - CDF_b|          (1-D earth mover,
                                                 in bin-width units)

    computed on the cross-multiplied integer lattice
    ``|cum_a·tot_b - cum_b·tot_a|`` so no division happens until the
    final ppm quotients (truncating, bounded: KS ≤ 1e6; EMD is per-bin
    ppm summed — bounded by bins·1e6). NULL values have no place on a
    CDF and are EXCLUDED here (they get their own bin in the TVD
    operator — use both: TVD sees NULL-rate drift, CDF stats see
    location drift). NULL outputs when either window is empty.

    Plan shape: groupBy(key, bin) map-side combine, then ONE
    bins-per-key ordered window for the cumulative sums (histogram-
    sized — the frame never touches event rows), then groupBy(key).
    """
    if bin_width <= 0:
        raise ValueError(f"cdf_drift: bin_width must be > 0, got {bin_width}")
    bin_ = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
    in_a = (F.col(time_col) < F.lit(t_split)).cast("long")
    per_bin = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), bin_.alias("bin"))
        .agg(F.sum(in_a).alias("cnt_a"), F.sum(1 - in_a).alias("cnt_b"))
    )
    wc = (
        Window.partitionBy("key")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("key").orderBy("bin")
    cum = per_bin.select(
        "key",
        "bin",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(wc).alias("cum_a"),
        F.sum("cnt_b").over(wc).alias("cum_b"),
        # the CDF gap stays constant until the NEXT observed bin — EMD
        # must weight each lattice value by that run length (the last
        # bin's lattice is 0, so its weight is irrelevant)
        F.coalesce(
            F.lead("bin").over(wl) - F.col("bin"), F.lit(1)
        ).alias("gap"),
    )
    dec = "decimal(38,0)"
    ca, cb = F.col("cum_a").cast(dec), F.col("cum_b").cast(dec)
    ta, tb = F.col("tot_a").cast(dec), F.col("tot_b").cast(dec)
    totals = per_bin.groupBy("key").agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    lattice = F.abs(ca * tb - cb * ta)
    out = (
        cum.join(totals, "key")
        .groupBy("key")
        .agg(
            F.first("tot_a").alias("tot_a"),
            F.first("tot_b").alias("tot_b"),
            F.max(lattice).alias("ks_num"),
            F.sum(lattice * F.col("gap").cast(dec)).alias("emd_num"),
        )
    )
    den = F.col("tot_a").cast(dec) * F.col("tot_b").cast(dec)
    nonempty = (F.col("tot_a") > 0) & (F.col("tot_b") > 0)
    return out.select(
        "key",
        "tot_a",
        "tot_b",
        F.when(
            nonempty,
            F.expr(
                f"ks_num * CAST(1000000 AS {dec})"
                f" div (CAST(tot_a AS {dec}) * CAST(tot_b AS {dec}))"
            ),
        ).alias("ks_ppm"),
        F.when(
            nonempty,
            F.expr(
                f"emd_num * CAST(1000000 AS {dec})"
                f" div (CAST(tot_a AS {dec}) * CAST(tot_b AS {dec}))"
            ),
        ).alias("emd_ppm_bins"),
    )


def histogram_percentiles(
    df: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    key_col: str = "event_type",
    value_col: str = "value",
    bin_width: float = 1.0,
) -> DataFrame:
    """Percentiles from fixed-width histograms — the 100 TB answer to
    "p99 per key": `percentiles` (exact) must SORT every group's
    values; this computes the histogram (one map-side-combined
    aggregate, histogram-sized state) and reads the percentile off the
    cumulative counts, exact to bin resolution. The selection rule is
    pure integers — smallest bin whose cumulative count satisfies
    ``cum * 1e6 >= ceil(p_ppm * total)`` (nearest-rank definition on
    the cross-multiplied lattice) — so the chosen bin is bit-identical
    across engines; the reported value is the bin's LOWER boundary
    (``bin * bin_width``: one IEEE multiply).

    Returns one row per key: ``(key, n_values, p50_bin, p50, ...)``
    with a bin-index and boundary column per requested prob (column
    names from the ppm — p500000 -> ``p50``; probs must be multiples
    of 0.001 to name cleanly). NULL values are excluded (no place on a
    CDF); keys with zero non-NULL values drop out.

    Plan shape: groupBy(key, bin); per-key ordered window over BINS
    (histogram-sized); one conditional-min aggregate per prob. No row
    sort anywhere — the operator `percentiles` cannot avoid.
    """
    if bin_width <= 0:
        raise ValueError(
            f"histogram_percentiles: bin_width must be > 0, got {bin_width}"
        )
    ppms = []
    for p in probs:
        ppm = round(p * 1_000_000)
        if not (0 < ppm <= 1_000_000):
            raise ValueError(f"histogram_percentiles: prob {p} out of (0, 1]")
        if ppm % 1000:
            raise ValueError(
                f"histogram_percentiles: prob {p} must be a multiple of 0.001"
            )
        ppms.append(ppm)
    per_bin = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.floor(F.col(value_col) / F.lit(float(bin_width)))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return percentiles_from_counts(per_bin, probs, bin_width=bin_width)


def percentiles_from_counts(
    per: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bin_width: float = 1.0,
) -> DataFrame:
    """:func:`histogram_percentiles`' selection stage over an ALREADY
    AGGREGATED ``(key, bin, cnt)`` histogram — the live-dashboard
    consumer of `value_histogram` partials and the streamed
    ``histogram_current`` state (same family as `trend_from_counts` /
    `anomalies_from_counts` / `cusum_from_counts`: the batch operator
    DELEGATES here, so streamed-state percentiles equal the batch
    operator by construction). NULL bins (`value_histogram` keeps NULL
    values as their own bin) are excluded — no place on a CDF. Exact
    integer nearest-rank selection; windows run over BINS, never rows.
    """
    ppms = []
    for p in probs:
        ppm = round(p * 1_000_000)
        if not (0 < ppm <= 1_000_000):
            raise ValueError(
                f"percentiles_from_counts: prob {p} out of (0, 1]"
            )
        if ppm % 1000:
            raise ValueError(
                f"percentiles_from_counts: prob {p} must be a multiple "
                "of 0.001"
            )
        ppms.append(ppm)
    if bin_width <= 0:
        raise ValueError(
            f"percentiles_from_counts: bin_width must be > 0, got {bin_width}"
        )
    per_bin = per.filter(F.col("bin").isNotNull())
    wc = (
        Window.partitionBy("key")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("key")
    cum = per_bin.select(
        "key",
        "bin",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("tot"),
    )
    aggs = [F.first("tot").alias("n_values")]
    for ppm in ppms:
        name = f"p{ppm // 10000}" if ppm % 10000 == 0 else f"p_{ppm}ppm"
        # nearest-rank: cum >= ceil(ppm * tot / 1e6)  ⟺  cum*1e6 >= ppm*tot
        # (decimal lattice: no silent wrap past ~9e12 rows per key)
        dec = "decimal(38,0)"
        hit = (
            F.col("cum").cast(dec) * F.lit(1_000_000).cast(dec)
            >= F.lit(ppm).cast(dec) * F.col("tot").cast(dec)
        )
        aggs.append(F.min(F.when(hit, F.col("bin"))).alias(f"{name}_bin"))
    out = cum.groupBy("key").agg(*aggs)
    cols = ["key", "n_values"]
    for ppm in ppms:
        name = f"p{ppm // 10000}" if ppm % 10000 == 0 else f"p_{ppm}ppm"
        cols.append(F.col(f"{name}_bin"))
        cols.append(
            (F.col(f"{name}_bin") * F.lit(float(bin_width))).alias(name)
        )
    return out.select(*cols)


def conversion_rates(
    df: DataFrame,
    conversion: str,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    z: float = 1.96,
) -> DataFrame:
    """Per-trail conversion rate with a Wilson score interval — the
    "is 3.1% really better than 2.9%" answer a bare ratio can't give.
    A trail converts if it contains >= 1 ``conversion`` event; rate and
    interval are over TRAILS (the visitor-level definition), not
    events. The Wilson bounds use a handful of IEEE ops (add, multiply,
    divide, one sqrt — each correctly rounded) on exact integer counts,
    so results are engine-portable without rounding tricks; they are
    rounded half-up to 6 places for presentation.

    Returns one row: ``(n_trails, n_converted, rate, wilson_lo,
    wilson_hi)``. Plan: one groupBy(uuid) max-flag aggregate (map-side
    combined), one scalar aggregate.
    """
    if z <= 0:
        raise ValueError(f"conversion_rates: z must be > 0, got {z}")
    per = df.groupBy(F.col(uuid_col).alias("uuid")).agg(
        F.max((F.col(field) == conversion).cast("long")).alias("conv")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_trails"),
        F.sum("conv").alias("n_converted"),
    )
    n = F.col("n_trails").cast("double")
    x = F.col("n_converted").cast("double")
    z2 = F.lit(float(z * z))
    p = x / n
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (4 * n * n))
        / denom
    )
    return agg.select(
        "n_trails",
        "n_converted",
        F.when(F.col("n_trails") > 0, F.round(p, 6)).alias("rate"),
        F.when(F.col("n_trails") > 0, F.round(center - half, 6)).alias(
            "wilson_lo"
        ),
        F.when(F.col("n_trails") > 0, F.round(center + half, 6)).alias(
            "wilson_hi"
        ),
    )


def trail_entropy(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
) -> DataFrame:
    """Per-trail behavioral diversity as integerized Shannon entropy —
    the signal that separates a monotone bot (one event type, entropy
    0) from a browsing human, in the same whole-bit discipline as
    `text.unigram_surprisal` (no libm log): each event contributes
    ``bits(n) - bits(cnt_v)`` whole bits, where bits(x) =
    length(bin(x)) and cnt_v is its value's count in the trail::

        entropy_millibits = 1000 * Σ_v cnt_v·(bits(n) − bits(cnt_v)) / n

    — an integer-exact upper-ish approximation of n·H (exact when all
    counts are powers of two), bit-identical across engines. Returns
    ``(uuid, n_events, n_distinct, entropy_millibits)`` where the
    division is the truncating integer div.

    Plan: one groupBy(uuid, value) count (map-side combined) + one
    groupBy(uuid) — lexicon-bounded per trail, never event² anything.
    """
    per = df.groupBy(
        F.col(uuid_col).alias("uuid"), F.col(field).alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bits = lambda c: F.length(F.bin(c))
    out = per.groupBy("uuid").agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * bits(F.col("cnt"))).alias("__cb"),
    )
    return out.select(
        "uuid",
        "n_events",
        "n_distinct",
        F.expr(
            "1000 * (n_events * length(bin(n_events)) - __cb)"
            " div n_events"
        ).alias("entropy_millibits"),
    )


def session_funnel(
    df: DataFrame,
    steps: list[Column],
    gap: int = 1800,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    within: int | None = None,
) -> DataFrame:
    """Within-SESSION funnels: :func:`funnel_times` evaluated per
    (trail, session) instead of per whole trail -- "did the user
    complete the flow in one sitting", the product-analytics question
    whole-trail funnels over-credit (a signup on Monday and a purchase
    in an unrelated Friday session is not one funnel). Sessions come
    from `trails.sessionize` (the tutorial's gap rule); the funnel fold
    then keys on the composite (uuid, session_id).

    Returns one row per session: ``(uuid, session_id, s0..s_k)`` --
    same latch semantics, NULL once the chain breaks inside the
    session. Plan: sessionize's uuid window + the fold's composite-key
    shuffle -- two uuid-clustered exchanges, no Python.
    """
    from .trails import sessionize

    s = sessionize(df, gap, uuid_col, time_col)
    # composite key as a STRUCT (groupBy on struct types is exact) --
    # string concatenation would corrupt uuids containing the delimiter
    sk = F.struct(
        F.col(uuid_col).alias("u"), F.col("session_id").alias("sid")
    )
    out = funnel_times(
        s.withColumn("__sk", sk),
        steps,
        uuid_col="__sk",
        time_col=time_col,
        within=within,
    )
    return out.select(
        F.col("uuid.u").alias("uuid"),
        F.col("uuid.sid").alias("session_id"),
        *[c for c in out.columns if c != "uuid"],
    )


def transition_entropy(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Next-event predictability per state: whole-bit conditional
    entropy of each value's OUTGOING transition distribution — low
    entropy means "after A, B always follows" (mechanical/bot flows,
    good candidates for funnel steps); high entropy means genuine
    branching. Same integerized-Shannon discipline as
    :func:`trail_entropy` (bits via length(bin()), no libm), applied to
    the in-trail adjacent-transition counts of `transition_counts`::

        entropy_millibits(src) = 1000·(n·bits(n) − Σ_dst c·bits(c)) div n

    Returns ``(src, n_out, n_dst, entropy_millibits)``. Plan: one
    trail-windowed lead (the transition_counts shuffle) + two
    lexicon²-bounded aggregates.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    nxt = F.lead(F.col(field)).over(w)
    pairs = (
        df.withColumn("__dst", nxt)
        .filter(F.col("__dst").isNotNull())
        .groupBy(F.col(field).alias("src"), F.col("__dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bits = lambda c: F.length(F.bin(c))
    return (
        pairs.groupBy("src")
        .agg(
            F.sum("c").alias("n_out"),
            F.count(F.lit(1)).alias("n_dst"),
            F.sum(F.col("c") * bits(F.col("c"))).alias("__cb"),
        )
        .select(
            "src",
            "n_out",
            "n_dst",
            F.expr(
                "1000 * (n_out * length(bin(n_out)) - __cb) div n_out"
            ).alias("entropy_millibits"),
        )
    )


def survival_table(
    df: DataFrame,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    churn_gap_seconds: int = 7 * 86400,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Kaplan-Meier life table for trail lifetimes with right-censoring —
    "how long do users stay active before churning" as the classic
    survival-analysis (t, at_risk, churned, censored) table, every
    number an exact integer count.

    Semantics: observation ends at the dataset's max event time. A
    trail's lifetime is ``last - first`` event time, bucketed by
    ``bucket_seconds``. The churn EVENT is observed when the trail has
    been silent longer than ``churn_gap_seconds`` at observation end;
    otherwise the lifetime is right-CENSORED (the user may still be
    active — treating them as churned is the textbook bias this table
    exists to avoid). ``at_risk(t)`` counts trails with lifetime bucket
    >= t, so downstream KM estimates S(t) = prod(1 - d/n) need no extra
    pass; the integer table itself is the oracle-checked artifact
    (survival products are float and engine-divergent by design).

    Plan shape: one per-uuid aggregate (map-side combined), a 1-row
    global max broadcast-crossed back, a lifetime-bucket histogram
    aggregate, and a suffix cumulative sum over the HISTOGRAM (rows =
    distinct lifetime buckets, bounded by observation span /
    bucket_seconds — metadata-scale, so the unpartitioned window is
    deliberate and safe at any corpus size). Reference analog: trail
    iteration + first/last timestamps (src/tdb_decode.c cursor min/max
    semantics); the life table itself extends §2.9 analytics.
    """
    if churn_gap_seconds < 0:
        raise ValueError(
            f"survival_table: churn_gap_seconds must be >= 0, got {churn_gap_seconds}"
        )
    if bucket_seconds <= 0:
        raise ValueError(
            f"survival_table: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    per = df.groupBy(F.col(uuid_col).alias("uuid")).agg(
        F.min(time_col).alias("first_t"), F.max(time_col).alias("last_t")
    )
    obs = per.agg(F.max("last_t").alias("obs_end"))
    lt = per.crossJoin(F.broadcast(obs)).select(
        F.expr(f"(last_t - first_t) div {int(bucket_seconds)}").alias(
            "duration_bucket"
        ),
        (
            (F.col("obs_end") - F.col("last_t")) > F.lit(int(churn_gap_seconds))
        ).alias("is_churn"),
    )
    hist = lt.groupBy("duration_bucket").agg(
        F.sum(F.when(F.col("is_churn"), 1).otherwise(0)).alias("churned"),
        F.sum(F.when(F.col("is_churn"), 0).otherwise(1)).alias("censored"),
    )
    w = Window.orderBy(F.desc("duration_bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "duration_bucket",
        F.sum(F.col("churned") + F.col("censored")).over(w).alias("at_risk"),
        "churned",
        "censored",
    )


def diurnal_profile(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    tz_offset_seconds: int = 0,
) -> DataFrame:
    """Hour-of-day rhythm per key: peak hour, peak concentration, and
    whole-bit entropy of each key's 24-bin diurnal histogram — separates
    clock-driven traffic (cron jobs, batch imports: low entropy, sharp
    peak) from organic human activity (high entropy, soft evening peak).

    All integer-exact: peak share is ppm by truncating division; entropy
    is the same millibit formula as `transition_entropy` (bits(x) =
    length(bin(x)) = floor(log2)+1, so 1000*(n*bits(n) - sum c*bits(c))
    div n — engine-portable whole-bit form). Peak ties break to the
    EARLIEST hour via a single struct-min over (-count, hour): both
    engines order structs field-lexicographically.

    Plan shape: one map-side-combined groupBy(key, hour) — at most
    lexicon x 24 rows move — then a per-key fold. Nothing is
    event-scale after the first aggregate.
    """
    hour = F.expr(
        f"(({time_col} + {int(tz_offset_seconds)}) div 3600) % 24"
    ).alias("hour")
    per = df.select(F.col(key_col).alias("key"), hour).groupBy(
        "key", "hour"
    ).agg(F.count(F.lit(1)).alias("c"))
    return _diurnal_fold(per)


def diurnal_from_counts(
    per: DataFrame,
    bucket_seconds: int = 3600,
    tz_offset_seconds: int = 0,
) -> DataFrame:
    """:func:`diurnal_profile` applied to a PREBUILT per-(key, bucket)
    count table ``(key, b, y)`` with ``b = time div bucket_seconds`` —
    point it at `streaming.ingest.histogram_current` state (stream
    histogrammed on time buckets) and the batch rhythm profile runs
    against histogram-sized state with zero event rescans; the fourth
    leg of the streaming monitoring family (drift, anomalies, trend,
    rhythm). ``bucket_seconds`` must divide 3600 so every bucket maps
    to exactly one hour. Identical math and columns as the batch form
    (parity-tested)."""
    if bucket_seconds <= 0 or 3600 % bucket_seconds != 0:
        raise ValueError(
            "diurnal_from_counts: bucket_seconds must divide 3600, got "
            f"{bucket_seconds}"
        )
    hour = F.expr(
        f"((b * {int(bucket_seconds)} + {int(tz_offset_seconds)}) div 3600) % 24"
    ).alias("hour")
    hourly = (
        per.select(F.col("key"), hour, F.col("y"))
        .groupBy("key", "hour")
        .agg(F.sum("y").alias("c"))
    )
    return _diurnal_fold(hourly)


def _diurnal_fold(per: DataFrame) -> DataFrame:
    """Shared per-key fold over a (key, hour, c) table: peak (earliest
    hour on ties via struct-min), peak ppm, active hours, whole-bit
    entropy — metadata-scale input by contract."""
    bits = lambda c: F.length(F.bin(c))
    return (
        per.groupBy("key")
        .agg(
            F.sum("c").alias("n_events"),
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("hour").alias("h"))).alias(
                "__pk"
            ),
            F.count(F.lit(1)).alias("hours_active"),
            F.sum(F.col("c") * bits(F.col("c"))).alias("__cb"),
        )
        .select(
            "key",
            "n_events",
            F.col("__pk.h").cast("long").alias("peak_hour"),
            F.expr("(-__pk.nc) * 1000000 div n_events").alias("peak_ppm"),
            "hours_active",
            F.expr(
                "1000 * (n_events * length(bin(n_events)) - __cb) div n_events"
            ).alias("entropy_millibits"),
        )
    )


def volume_autocorrelation(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 3600,
    lags: list[int] | None = None,
) -> DataFrame:
    """Lag-k Pearson autocorrelation of each key's per-bucket event
    volume — periodicity detection (a spike at lag 24 on hourly buckets
    = daily rhythm; high lag-1 = bursty/sticky load) complementing
    `volume_correlation_pairs`' cross-key form.

    Same exactness contract as that operator: all four moments are exact
    integers over the zero-filled global bucket range — for lag k the x
    series lives on [lo, hi-k] and the y series on [lo+k, hi], so the
    sub-range sums are conditional sums of the OBSERVED buckets (zero
    buckets contribute nothing) and n = span - k comes from the range.
    The only floats are the final ``num / sqrt(dx*dy)`` — three
    correctly-rounded IEEE ops on exact decimal(38,0) operands, rounded
    half-up to 6 places; constant series (dx or dy = 0) yield NULL.

    Plan shape: groupBy(key, bucket) map-side combine once; the lag
    cross-product and Σ x·y self-join run on the HISTOGRAM (keys ×
    observed buckets × |lags| rows), never on events; the range is a
    broadcast 1-row aggregate.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"volume_autocorrelation: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    lags = list(lags) if lags is not None else [1, 2, 3, 6, 12, 24]
    if not lags or any(int(k) <= 0 for k in lags):
        raise ValueError(
            f"volume_autocorrelation: lags must be positive and non-empty, got {lags}"
        )
    from .dedup import _materialize

    spark = df.sparkSession
    b = F.expr(f"{time_col} div {bucket_seconds}")
    # per feeds the range aggregate, the sub-range moments and BOTH
    # sides of the lag-probe join — unpersisted, each consumer re-ran
    # the corpus scan+aggregate (plan audit: 5 scans for q155). per is
    # histogram-sized.
    per = _materialize(
        df.select(F.col(key_col).alias("key"), b.alias("b")).groupBy(
            "key", "b"
        ).agg(F.count(F.lit(1)).alias("y"))
    )
    rng = F.broadcast(
        per.agg(F.min("b").alias("b_lo"), F.max("b").alias("b_hi"))
    )
    lag_df = F.broadcast(
        spark.createDataFrame([(int(k),) for k in sorted(set(lags))], "k long")
    )
    dec = "decimal(38,0)"
    yd = F.col("y").cast(dec)
    # per-(key, lag) sub-range moments: x on [lo, hi-k], y on [lo+k, hi]
    stats = (
        per.crossJoin(rng)
        .crossJoin(lag_df)
        .groupBy("key", "k")
        .agg(
            F.sum(F.when(F.col("b") <= F.col("b_hi") - F.col("k"), F.col("y"))).alias("sx"),
            F.sum(F.when(F.col("b") <= F.col("b_hi") - F.col("k"), yd * yd)).alias("qx"),
            F.sum(F.when(F.col("b") >= F.col("b_lo") + F.col("k"), F.col("y"))).alias("sy"),
            F.sum(F.when(F.col("b") >= F.col("b_lo") + F.col("k"), yd * yd)).alias("qy"),
        )
    )
    # Σ x·y: probe rows at (key, b + k) against the observed histogram
    probes = per.crossJoin(lag_df).select(
        "key", (F.col("b") + F.col("k")).alias("bb"), "k", F.col("y").alias("ya")
    )
    xy = (
        probes.join(
            per.select("key", F.col("b").alias("bb"), F.col("y").alias("yb")),
            ["key", "bb"],
        )
        .groupBy("key", "k")
        .agg(F.sum(F.col("ya").cast(dec) * F.col("yb").cast(dec)).alias("sxy"))
    )
    j = (
        stats.join(xy, ["key", "k"], "left")
        .crossJoin(rng)
        .select(
            "key",
            "k",
            F.coalesce(F.col("sxy"), F.lit(0).cast(dec)).alias("sxy"),
            "sx",
            "qx",
            "sy",
            "qy",
            (F.col("b_hi") - F.col("b_lo") + 1 - F.col("k")).alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    # sub-ranges can be all-zero buckets: NULL conditional sums mean 0
    sx = F.coalesce(F.col("sx"), F.lit(0)).cast(dec)
    sy = F.coalesce(F.col("sy"), F.lit(0)).cast(dec)
    qx = F.coalesce(F.col("qx"), F.lit(0).cast(dec))
    qy = F.coalesce(F.col("qy"), F.lit(0).cast(dec))
    n = F.col("n").cast(dec)
    num = n * F.col("sxy") - sx * sy
    dx = n * qx - sx * sx
    dy = n * qy - sy * sy
    return j.select(
        "key",
        F.col("k").alias("lag"),
        F.col("n").alias("n_buckets"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        ).alias("autocorr"),
    )


def robot_trails(
    df: DataFrame,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
    min_events: int = 10,
    max_cv2_ppm: int = 10_000,
) -> DataFrame:
    """Bot/automation detection by inter-event timing regularity: a
    scripted client fires on a clock (near-zero gap variance), a human
    doesn't. Per trail, the squared coefficient of variation of the
    inter-event gaps as exact ppm::

        cv2_ppm = 10^6 * (n_gaps * sum(g^2) - sum(g)^2) div sum(g)^2

    (population variance over mean^2 — dimensionless, so one threshold
    works across slow and fast bots). ``is_robot`` flags trails with at
    least ``min_events`` events and cv2 below ``max_cv2_ppm``; trails
    whose gaps sum to zero (all events on one timestamp — batch imports)
    get NULL cv2 and are flagged by the count alone. Products ride in
    decimal(38,0) (a year of seconds squared times 10^6 exceeds int64).

    Plan shape: one window pass per trail for the lag gaps ((time,
    tiebreak) ordering — same deterministic tiebreak as every trail
    operator), one per-uuid aggregate. Output is trail-count-sized.
    Reference analog: per-trail cursor iteration + timestamp deltas
    (src/tdb_decode.c cursor contract); the regularity statistic extends
    §2.9 analytics.
    """
    if min_events < 2:
        raise ValueError(
            f"robot_trails: min_events must be >= 2, got {min_events}"
        )
    w = Window.partitionBy(uuid_col).orderBy(time_col, tiebreak_col)
    g = (F.col(time_col) - F.lag(time_col).over(w)).alias("g")
    gaps = df.select(F.col(uuid_col).alias("uuid"), g)
    dec = "decimal(38,0)"
    gd = F.col("g").cast(dec)
    per = gaps.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("g").alias("n_gaps"),
        # coalesce: a single-event trail has NO gaps — sum(g) is NULL,
        # but the contract (and the oracle) says zero (caught by
        # test_robot_trails_matches_python_oracle)
        F.coalesce(F.sum("g"), F.lit(0)).alias("sum_gap"),
        F.sum(gd * gd).alias("__q"),
    )
    sg = F.col("sum_gap").cast(dec)
    var_num = F.col("n_gaps").cast(dec) * F.col("__q") - sg * sg
    return per.select(
        "uuid",
        "n_events",
        F.expr("sum_gap div greatest(n_gaps, 1)").alias("mean_gap"),
        F.when(
            F.col("sum_gap") > 0,
            (F.lit(1000000).cast(dec) * var_num).cast(dec),
        ).alias("__num"),
        sg.alias("__sg"),
    ).select(
        "uuid",
        "n_events",
        "mean_gap",
        F.expr("__num div (__sg * __sg)").alias("cv2_ppm"),
    ).withColumn(
        "is_robot",
        (F.col("n_events") >= min_events)
        & F.col("cv2_ppm").isNotNull()
        & (F.col("cv2_ppm") <= max_cv2_ppm),
    )


def burstiness_index(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Fano factor of each key's per-bucket event counts — the
    index-of-dispersion completing the volume family: `anomalous_buckets`
    flags WHICH buckets deviate, `volume_autocorrelation` asks WHEN load
    repeats, this asks HOW bursty the process is overall. A Poisson
    arrival process scores 1e6 ppm exactly; clocked/regular load scores
    below; bursty (self-exciting, batchy) load scores above.

    Exact integers over the zero-filled global bucket range::

        fano_ppm = 10^6 * (n*Q - S^2) div (n*S)     n = span, S = Σy, Q = Σy²

    (population variance over mean, scale factored so one truncating
    division happens last; products in decimal(38,0)). Keys with S = 0
    cannot occur (a key exists only via events).

    Plan shape: one map-side-combined groupBy(key, bucket), per-key fold
    on the histogram, broadcast 1-row range. Nothing event-sized after
    the first aggregate.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"burstiness_index: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    per = df.select(F.col(key_col).alias("key"), b.alias("b")).groupBy(
        "key", "b"
    ).agg(F.count(F.lit(1)).alias("y"))
    rng = F.broadcast(
        per.agg((F.max("b") - F.min("b") + 1).alias("n"))
    )
    dec = "decimal(38,0)"
    yd = F.col("y").cast(dec)
    stats = per.groupBy("key").agg(
        F.sum("y").alias("s"), F.sum(yd * yd).alias("q")
    )
    return stats.crossJoin(rng).select(
        "key",
        F.col("n").alias("n_buckets"),
        F.col("s").alias("n_events"),
        F.expr(
            f"(CAST(n AS {dec}) * q - CAST(s AS {dec}) * CAST(s AS {dec}))"
            f" * CAST(1000000 AS {dec})"
            f" div (CAST(n AS {dec}) * CAST(s AS {dec}))"
        ).alias("fano_ppm"),
    )


def time_weighted_average(
    df: DataFrame,
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-trail time-weighted average of a sampled value (TWAP): each
    observation holds until the next one (last-observation-carried-
    forward), so the average is Σ value_i · (t_{i+1} − t_i) over the
    trail's span — the correct summary for irregularly-sampled state
    (plan price, queue depth, position size), where the arithmetic mean
    over-weights chatty periods by construction.

    Exactness: values are integerized to cents once
    (``round(value*100)`` — one IEEE op, engine-identical), the
    weighted sum is exact decimal(38,0), and the output is
    ``twap_cents = Σ cents·gap div span`` by truncating division. A
    single-event trail (span 0) reports its own value. Plan shape: one
    (time, tiebreak) window pass for the lead-gap, one per-uuid
    aggregate.
    """
    w = Window.partitionBy(uuid_col).orderBy(time_col, tiebreak_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
        cents.alias("c"),
        (F.lead(time_col).over(w) - F.col(time_col)).alias("gap"),
    )
    dec = "decimal(38,0)"
    agg = per.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("first_t"),
        F.max("t").alias("last_t"),
        F.sum(F.col("c").cast(dec) * F.col("gap").cast(dec)).alias("__ws"),
        F.max(F.struct(F.col("t"), F.col("tb"), F.col("c"))).alias("__lastc"),
    )
    span = F.col("last_t") - F.col("first_t")
    return agg.select(
        "uuid",
        "n_events",
        span.alias("span_seconds"),
        F.when(span > 0, F.expr(f"__ws div CAST(last_t - first_t AS {dec})"))
        .otherwise(F.col("__lastc.c"))
        .alias("twap_cents"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """OHLC bars: per (key, time bucket), the opening / highest / lowest
    / closing observation of a value column — the canonical downsampled
    view of any sampled series (prices, latencies, queue depths), and
    the shape charting and monitoring stacks ingest directly.

    Integer-exact: cents via one round(value*100); open/close are
    struct-min/max over (time, tiebreak, cents) — deterministic
    first/last even with same-timestamp ties, both engines order
    structs field-lexicographically. One map-side-combined aggregate,
    output keys × buckets.
    """
    return ohlc_from_partials(
        ohlc_partials(
            df, key_col, value_col, time_col, tiebreak_col, bucket_seconds
        )
    )


def ohlc_partials(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """:func:`ohlc_bars`'s MERGEABLE partial state: per (key, bucket),
    count plus the full (t, tb, c) structs for open/close and bare
    high/low — partials from disjoint row sets merge by (sum, struct-
    min, max, min, struct-max), which is what lets
    `streaming.ingest.streaming_ohlc` keep bars-sized state forever on
    an unbounded stream and still equal the batch bars exactly."""
    if bucket_seconds <= 0:
        raise ValueError(
            f"ohlc_bars: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    cents = F.round(F.col(value_col) * 100).cast("long")
    b = F.expr(f"{time_col} div {bucket_seconds}")
    base = df.select(
        F.col(key_col).alias("key"),
        b.alias("bucket"),
        F.col(time_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
        cents.alias("c"),
    )
    pick = F.struct("t", "tb", "c")
    return base.groupBy("key", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(pick).alias("o"),
        F.max("c").alias("high_cents"),
        F.min("c").alias("low_cents"),
        F.max(pick).alias("cl"),
    )


def ohlc_from_partials(p: DataFrame) -> DataFrame:
    """Merge :func:`ohlc_partials` tables (one or many, unioned) into
    final bars — identical columns to :func:`ohlc_bars`."""
    return (
        p.groupBy("key", "bucket")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("o").alias("o"),
            F.max("high_cents").alias("high_cents"),
            F.min("low_cents").alias("low_cents"),
            F.max("cl").alias("cl"),
        )
        .select(
            "key",
            "bucket",
            "n_events",
            F.col("o")["c"].alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("cl")["c"].alias("close_cents"),
        )
    )


def trail_value_outliers(
    df: DataFrame,
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
    k: int = 3,
    min_events: int = 5,
) -> DataFrame:
    """Per-trail value anomalies: events whose value deviates from THEIR
    OWN TRAIL's mean by more than ``k`` standard deviations — the
    per-entity complement of `anomalous_buckets`' per-key volume test
    (a $900 charge is an outlier for one account and routine for
    another; a global threshold can't see that). Same exact-integer
    k-sigma discipline, on cents::

        (n·c - S)² > k²·(n·Q - S²)      S = Σc, Q = Σc² per trail

    so flagging is bit-identical across engines (strict >, constant-
    value trails flag nothing). Trails with fewer than ``min_events``
    events are skipped — a 2-event trail has no meaningful own-history.
    Returns the flagged events ``(uuid, time, tiebreak, cents, dev_num,
    bound_num)``; dev/bound ranks magnitude.

    Plan shape: one per-trail aggregate, joined back to the trail's own
    events on uuid (the join is what lets the flag stay event-level
    while the stats stay trail-level); decimal(38,0) products.
    """
    if k < 1 or min_events < 2:
        raise ValueError(
            f"trail_value_outliers: bad k={k} min_events={min_events}"
        )
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("time"),
        F.col(tiebreak_col).alias("tb"),
        cents.alias("c"),
    )
    dec = "decimal(38,0)"
    cd = F.col("c").cast(dec)
    stats = base.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(cd * cd).alias("q"),
    ).filter(F.col("n") >= min_events)
    j = base.join(stats, "uuid")
    n, s, q = (
        F.col("n").cast(dec),
        F.col("s").cast(dec),
        F.col("q").cast(dec),
    )
    dev = (n * cd - s) * (n * cd - s)
    bound = F.lit(k * k).cast(dec) * (n * q - s * s)
    return (
        j.filter(dev > bound)
        .select(
            "uuid",
            "time",
            F.col("tb").alias(tiebreak_col),
            F.col("c").alias("cents"),
            # the FLAG is the exact-integer inequality above; the
            # reported magnitudes are those exact integers cast to
            # double (round-to-nearest from an exact value — identical
            # in any engine), because dev can exceed int64 at scale
            dev.cast("double").alias("dev_num"),
            bound.cast("double").alias("bound_num"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-key CUSUM changepoint over the bucketed event-count series —
    the level-shift question completing the volume family
    (`anomalous_buckets` flags outlier buckets, `burstiness_index` rates
    dispersion, this locates WHERE the rate changed): the changepoint is
    the bucket boundary i maximizing the scaled CUSUM deviation

        D_i = | n * S_i  -  i * T |        i = 1..n

    over the zero-filled global range (n buckets, S_i = events through
    bucket i, T = total) — the classic cumulative-sum statistic with the
    mean factored out, kept in exact integers (products in
    decimal(38,0), D can exceed int64 at scale so the reported statistic
    is the exact integer cast to double; the ARGMAX itself compares the
    exact integers).

    Zero-fill without materializing zeros: between observed buckets S is
    constant, so D_i is linear in i and maximal at a plateau endpoint —
    the candidate set is {position of each observed bucket} union
    {position just before each observed bucket, with the lagged sum}
    (covers the leading all-zero plateau via the first bucket's lag-0
    candidate). Candidates are 2x the histogram, never event-sized.
    Ties break to the EARLIEST boundary. Keys with n = 1 report a NULL
    changepoint (no interior boundary; D_1 = 0 degenerately).

    Output: (key, n_buckets, n_events, cp_bucket, cp_index, cusum_stat,
    rate_before_ppm_mille, rate_after_ppm_mille) — the split rates are
    events-per-1000-buckets (truncating div on exact integers).
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"cusum_changepoint: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    per = (
        df.select(F.col(key_col).alias("key"), b.alias("b"))
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return cusum_from_counts(per)


def cusum_from_counts(per: DataFrame) -> DataFrame:
    """:func:`cusum_changepoint` applied to a PREBUILT per-(key, bucket)
    count table ``(key, b, y)`` — point it at
    `streaming.ingest.histogram_current` state and the exact batch
    changepoint semantics run against histogram-sized state with zero
    event rescans; the fifth leg of the streaming monitoring family
    (drift, anomalies, trend, rhythm, level shift). Identical math and
    columns as the batch form (parity-tested)."""
    from .dedup import _materialize

    # per feeds the range aggregate and the cumulative table; cum feeds
    # the totals and BOTH halves of the candidate union — unpersisted,
    # the corpus aggregate re-ran per consumer (plan audit: 6 scans for
    # q170). Both are histogram-sized.
    per = _materialize(per)
    rng = F.broadcast(per.agg(F.min("b").alias("lo"), F.max("b").alias("hi")))
    w = Window.partitionBy("key").orderBy("b")
    cum = _materialize(
        per.crossJoin(rng)
        .withColumn("pos", F.col("b") - F.col("lo") + 1)
        .withColumn("s_i", F.sum("y").over(w))
        .withColumn("s_prev", F.coalesce(F.lag("s_i").over(w), F.lit(0)))
    )
    tot = cum.groupBy("key").agg(
        F.max("s_i").alias("t_total"), F.count(F.lit(1)).alias("n_obs")
    )
    # candidate boundaries: each observed position with its sum, and the
    # position just before it with the lagged sum (plateau endpoints)
    cands = (
        cum.select(
            "key", "lo", "hi", F.col("pos").alias("i"), F.col("s_i").alias("s")
        )
        .unionByName(
            cum.select(
                "key",
                "lo",
                "hi",
                (F.col("pos") - 1).alias("i"),
                F.col("s_prev").alias("s"),
            ).filter(F.col("i") >= 1)
        )
        .join(tot, "key")
    )
    dec = "decimal(38,0)"
    n = (F.col("hi") - F.col("lo") + 1).cast(dec)
    d = F.abs(
        n * F.col("s").cast(dec) - F.col("i").cast(dec) * F.col("t_total").cast(dec)
    )
    scored = cands.withColumn("d", d)
    pick = Window.partitionBy("key").orderBy(F.col("d").desc(), F.col("i").asc())
    nb = F.col("hi") - F.col("lo") + 1
    return (
        scored.withColumn("__r", F.row_number().over(pick))
        .filter(F.col("__r") == 1)
        .select(
            "key",
            nb.alias("n_buckets"),
            F.col("t_total").alias("n_events"),
            F.when(nb > 1, F.col("lo") + F.col("i") - 1).alias("cp_bucket"),
            F.when(nb > 1, F.col("i")).alias("cp_index"),
            F.when(nb > 1, F.col("d").cast("double")).alias("cusum_stat"),
            F.when(
                nb > 1,
                F.expr("1000 * s div i"),
            ).alias("rate_before_ppm_mille"),
            F.when(
                (nb > 1) & (nb > F.col("i")),
                F.expr("1000 * (t_total - s) div (hi - lo + 1 - i)"),
            ).alias("rate_after_ppm_mille"),
        )
    )


def ab_conversion_test(
    df: DataFrame,
    variant_col: str = "variant",
    target_value: str = "purchase",
    key_col: str = "event_type",
    uuid_col: str = UUID_COL,
) -> DataFrame:
    """Two-proportion z-test between every ordered pair of experiment
    variants: per trail, converted = did any event carry
    ``key_col = target_value``; per variant, (n trails, conversions);
    per pair (a < b), the chi-square-equivalent z² statistic

        z² = (s_a·n_b − s_b·n_a)² · N / (n_a·n_b·s·(N−s))

    with s = s_a+s_b, N = n_a+n_b (the pooled two-proportion test
    squared — algebraically rational, no sqrt). The DIFFERENCE term is
    exact decimal(38,0); the final ratio is evaluated in double on
    exact-integer inputs (each cast rounds-to-nearest identically in
    any IEEE engine, and the multiplication order is fixed), because
    the squared numerator exceeds decimal(38,0) at petabyte scale.
    ``significant_95`` is z² > 3.841458820694124 (χ²₁ at α=0.05).
    Degenerate pools (s = 0 or s = N) report NULL z².

    Per-variant rates are exact ppm (truncating div). A trail's variant
    is its MINIMUM observed variant value — assignment is expected
    constant per trail; min makes mixed assignments deterministic
    rather than partition-dependent.

    Plan shape: one uuid-keyed aggregate (map-side combined), then a
    variant-lexicon-sized table self-joined a < b — metadata-scale
    after the first shuffle.
    """
    per_trail = (
        df.select(
            F.col(uuid_col).alias("uuid"),
            F.col(variant_col).alias("variant"),
            (F.col(key_col) == F.lit(target_value)).cast("long").alias("conv"),
        )
        .groupBy("uuid")
        .agg(F.min("variant").alias("variant"), F.max("conv").alias("conv"))
    )
    per_variant = per_trail.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("s")
    # pin the lexicon-sized table: the a/b self-join below would
    # otherwise re-run the event scan + uuid aggregate on BOTH sides
    ).localCheckpoint()
    a = per_variant.select(
        F.col("variant").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("conv_a"),
    )
    b = per_variant.select(
        F.col("variant").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("conv_b"),
    )
    dec = "decimal(38,0)"
    pairs = a.join(b, F.col("variant_a") < F.col("variant_b"))
    diff = (
        F.col("conv_a").cast(dec) * F.col("n_b").cast(dec)
        - F.col("conv_b").cast(dec) * F.col("n_a").cast(dec)
    )
    s = F.col("conv_a") + F.col("conv_b")
    n_tot = F.col("n_a") + F.col("n_b")
    # fixed evaluation order: ((dd*dd)*N) / (((n_a*n_b)*s)*(N-s))
    z2 = (
        (diff.cast("double") * diff.cast("double") * n_tot.cast("double"))
        / (
            F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
            * s.cast("double")
            * (n_tot - s).cast("double")
        )
    )
    z2 = F.when((s > 0) & (s < n_tot), z2)
    return pairs.select(
        "variant_a",
        "variant_b",
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("1000000 * conv_a div n_a").alias("rate_a_ppm"),
        F.expr("1000000 * conv_b div n_b").alias("rate_b_ppm"),
        z2.alias("z2"),
        F.when(z2.isNotNull(), z2 > F.lit(3.841458820694124)).alias(
            "significant_95"
        ),
    )


PAGERANK_SCALE = 10**12


def pagerank_transitions(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
    damping_pct: int = 85,
    iterations: int = 10,
    max_nodes: int = 10_000,
) -> DataFrame:
    """PageRank over the event-transition graph: nodes are the field's
    lexicon values, edge weights the within-trail adjacent-transition
    counts (:func:`transition_counts`), giving a global "which states
    does behavior flow through" importance score — the graph-centrality
    complement to `transition_entropy`'s local predictability.

    Fixed-point exact integers (Q12 on ``PAGERANK_SCALE`` = 10^12) with
    a FIXED iteration count, so the result is bit-reproducible in any
    engine — float PageRank is partitioning-dependent::

        base     = (100 - d) * SCALE div (100 * n)
        contrib(v) = sum_u  (r(u) * w(u,v)) div W(u)     [per-edge div]
        r'(v)    = base + d * contrib(v) div 100

    Dangling nodes (no out-edges — e.g. a value only ever observed as a
    trail's last event) keep receiving rank but redistribute none; the
    total mass therefore decays below SCALE, which is the standard
    "dangling mass dropped" PageRank variant and is documented here
    rather than silently renormalized.

    Scale posture: the GRAPH is lexicon-sized (≤ max_nodes nodes,
    lexicon² edges) — the one deliberate driver-side structure in this
    module, same contract as `trails.trail_vectors`: the event-scale
    work (one uuid shuffle + lexicon²-keyed count) happens in Spark;
    the iteration runs on the collected matrix in exact python ints
    (arbitrary precision, no overflow); ``max_nodes`` refuses rather
    than silently collecting an unbounded value domain.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(
            f"pagerank_transitions: damping_pct in [0,100], got {damping_pct}"
        )
    if iterations < 1:
        raise ValueError(
            f"pagerank_transitions: iterations must be >= 1, got {iterations}"
        )
    edges = transition_counts(df, field, uuid_col, time_col, *tiebreak).collect()
    nodes = sorted({r.src for r in edges} | {r.dst for r in edges})
    if len(nodes) > max_nodes:
        raise ValueError(
            f"pagerank_transitions: {len(nodes)} nodes exceeds max_nodes="
            f"{max_nodes}; raise the cap only if a lexicon-sized driver "
            "matrix is acceptable"
        )
    spark = df.sparkSession
    if not nodes:
        return spark.createDataFrame(
            [], f"{field} string, rank_q12 long, n_nodes long"
        )
    n = len(nodes)
    outw: dict[str, int] = {}
    for r in edges:
        outw[r.src] = outw.get(r.src, 0) + r.freq
    rank = {v: PAGERANK_SCALE // n for v in nodes}
    base = (100 - damping_pct) * PAGERANK_SCALE // (100 * n)
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for e in edges:
            contrib[e.dst] += rank[e.src] * e.freq // outw[e.src]
        rank = {v: base + damping_pct * contrib[v] // 100 for v in nodes}
    return spark.createDataFrame(
        [(v, rank[v], n) for v in nodes],
        f"{field} string, rank_q12 long, n_nodes long",
    )


def _exact_rank_rows(
    per: DataFrame, metric_col: str, ranks: list[int], id_col: str = "uuid"
) -> dict[int, tuple]:
    """Exact order statistics without a global sort: the (metric, id)
    pairs at the given 1-based global ranks of the (metric DESC, id ASC)
    order — the `trail_ids` two-phase construction inverted to SELECT
    ranks instead of assigning them. Range-partition, per-partition
    counts to the driver (metadata-scale), locate each wanted rank's
    partition, then a partition-LOCAL row_number restricted to the ≤
    len(ranks) partitions that matter. Nothing trail-scale is sorted
    globally or joined."""
    if not ranks:
        return {}
    spark = per.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rp = (
        per.select(F.col(metric_col).alias("__m"), F.col(id_col).alias("__id"))
        .repartitionByRange(nparts, F.col("__m").desc(), F.col("__id"))
        .withColumn("__pid", F.spark_partition_id())
        # boundaries come from sampling: pin ONE materialization so the
        # count pass and the extraction pass agree (trail_ids precedent)
        .localCheckpoint()
    )
    counts = sorted(
        rp.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["__pid"],
    )
    want: dict[int, tuple[int, int]] = {}
    acc = 0
    it = iter(sorted(ranks))
    r = next(it)
    for row in counts:
        while r is not None and acc < r <= acc + row["c"]:
            want[r] = (row["__pid"], r - acc)
            r = next(it, None)
        acc += row["c"]
        if r is None:
            break
    pids = sorted({p for p, _ in want.values()})
    w = Window.partitionBy("__pid").orderBy(F.col("__m").desc(), F.col("__id"))
    got = (
        rp.filter(F.col("__pid").isin(pids))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            F.struct("__pid", "__rn").isin(
                [F.struct(F.lit(p), F.lit(l)) for p, l in want.values()]
            )
        )
        .collect()
    )
    by_loc = {(r["__pid"], r["__rn"]): (r["__m"], r["__id"]) for r in got}
    return {rank: by_loc[loc] for rank, loc in want.items()}


def rfm_segments(
    df: DataFrame,
    t_ref: int,
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """RFM segmentation: per trail, Recency (seconds from last event to
    ``t_ref``), Frequency (event count) and Monetary (sum of the value
    column in cents — one IEEE round per event, both engines agree),
    each scored into exact quintiles (5 = best: most recent / most
    frequent / highest spend) and concatenated into the classic
    three-digit segment label ('555' = champions, '111' = lost).

    Quintile scores are exact integer arithmetic — ``5 − (rank−1)·5 div
    n`` with rank 1 = best, ties broken by uuid — so segmentation is
    bit-reproducible and insensitive to partitioning.

    Scale: one uuid-keyed aggregate (map-side combined) builds the
    trails-scale table ONCE (pinned); per metric, the four exact
    quintile-boundary rows are extracted via :func:`_exact_rank_rows`
    (range partition + metadata-scale counts + a partition-local sort
    of only the boundary partitions) and broadcast as LITERALS, so
    scoring is a single projection — no global sort, no trails-scale
    join, ever. A trail's bucket is the number of boundaries ordered
    at-or-before it: rank ≥ r_i ⟺ the boundary row at rank
    r_i = ceil(i·n/5)+1 compares ≤ (metric, uuid) in descending order.
    """
    per = (
        df.select(
            F.col(uuid_col).alias("uuid"),
            F.col(time_col).alias("t"),
            F.expr(f"CAST(round({value_col} * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("uuid")
        .agg(
            F.max("t").alias("last_time"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("monetary_cents"),
        )
        .withColumn("recency_seconds", F.lit(int(t_ref)) - F.col("last_time"))
        # pin ONE materialization: three boundary extractions and the
        # final projection all read this trails-scale table
        .localCheckpoint()
    )
    n = per.count()
    if n == 0:
        return per.select(
            "uuid", "recency_seconds", "n_events", "monetary_cents",
            F.lit(None).cast("long").alias("r_score"),
            F.lit(None).cast("long").alias("f_score"),
            F.lit(None).cast("long").alias("m_score"),
            F.lit(None).cast("string").alias("segment"),
        )
    ranks = sorted({(i * n + 4) // 5 + 1 for i in range(1, 5)
                    if (i * n + 4) // 5 + 1 <= n})
    scores = {}
    for metric, out_col in (
        ("last_time", "r_score"),
        ("n_events", "f_score"),
        ("monetary_cents", "m_score"),
    ):
        bnd = _exact_rank_rows(per, metric, ranks)
        passed = F.lit(0)
        for i in range(1, 5):
            r_i = (i * n + 4) // 5 + 1
            if r_i not in bnd:
                continue  # empty tail bucket: boundary beyond n
            m_i, id_i = bnd[r_i]
            hit = (F.col(metric) < F.lit(m_i)) | (
                (F.col(metric) == F.lit(m_i)) & (F.col("uuid") >= F.lit(id_i))
            )
            passed = passed + hit.cast("int")
        scores[out_col] = (F.lit(5) - passed).cast("long")
    return per.select(
        "uuid",
        "recency_seconds",
        "n_events",
        "monetary_cents",
        scores["r_score"].alias("r_score"),
        scores["f_score"].alias("f_score"),
        scores["m_score"].alias("m_score"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def weekly_profile(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    tz_offset_seconds: int = 0,
) -> DataFrame:
    """Day-of-week rhythm per key — the 7-bin companion of
    :func:`diurnal_profile` (hour-of-day): peak day (earliest on ties,
    struct-min), peak ppm, active days, whole-bit entropy. Day 0 =
    Monday (Unix epoch day 0 was a Thursday, hence the +3 shift).
    Weekday-heavy keys read as workplace traffic, flat profiles as
    automation — same exact-integer discipline as the diurnal form.

    One map-side-combined (key, dow) aggregate; everything after is
    keys × 7.
    """
    dow = F.expr(
        f"((({time_col} + {int(tz_offset_seconds)}) div 86400) + 3) % 7"
    ).alias("hour")
    per = (
        df.select(F.col(key_col).alias("key"), dow)
        .groupBy("key", "hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = _diurnal_fold(per)
    return out.select(
        "key",
        "n_events",
        F.col("peak_hour").alias("peak_dow"),
        "peak_ppm",
        F.col("hours_active").alias("days_active"),
        "entropy_millibits",
    )


def longest_streak(
    df: DataFrame,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Longest run of CONSECUTIVE active buckets (default: days) per
    trail — the engagement streak metric: distinct active days collapse
    to runs via the classic ``day − row_number()`` grouping (a run of
    consecutive days shares one anchor), then max run length. Returns
    ``(uuid, active_buckets, longest_streak, current_streak_end)`` —
    the bucket where the longest streak ends (earliest such bucket on
    ties, via struct-min on (−len, end)).

    Exact integers throughout. Plan shape: distinct (uuid, bucket) with
    map-side partial, one per-trail window over ACTIVE BUCKETS (bounded
    by the time span, not the event count), one aggregate.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"longest_streak: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    days = (
        df.select(F.col(uuid_col).alias("uuid"), b.alias("d"))
        .distinct()
    )
    w = Window.partitionBy("uuid").orderBy("d")
    runs = (
        days.withColumn("__anchor", F.col("d") - F.row_number().over(w))
        .groupBy("uuid", "__anchor")
        .agg(F.count(F.lit(1)).alias("len"), F.max("d").alias("end"))
    )
    return (
        runs.groupBy("uuid")
        .agg(
            F.sum("len").alias("active_buckets"),
            F.min(
                F.struct((-F.col("len")).alias("nl"), F.col("end").alias("e"))
            ).alias("__pk"),
        )
        .select(
            "uuid",
            "active_buckets",
            (-F.col("__pk.nl")).cast("long").alias("longest_streak"),
            F.col("__pk.e").alias("streak_end_bucket"),
        )
    )


def peak_concurrency(
    df: DataFrame,
    gap: int = 1800,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Peak number of SIMULTANEOUSLY open sessions — the capacity
    question ("how many live users at the worst moment") answered
    exactly: sessionize (the tutorial gap rule), reduce each session to
    its [start, end] interval, sweep +1/−1 endpoint deltas in time
    order, and take the maximum of the running sum. Intervals are
    CLOSED (a session whose last event is at t still counts at t), so
    at equal timestamps starts apply before ends. Returns one row
    ``(n_sessions, peak_concurrency, peak_time)`` — the EARLIEST time
    the peak is reached.

    Scale: the running sum is a two-phase prefix scan, not a global
    window — range-partition endpoints by time, bring per-partition
    delta sums to the driver (metadata-scale), then partition-local
    cumulative sums start from their exclusive prefix offset (the
    `trail_ids` construction on the time axis). No single reducer ever
    holds the endpoint stream.
    """
    from .trails import sessionize

    s = sessionize(df, gap, uuid_col, time_col)
    sess = s.groupBy(F.col(uuid_col).alias("u"), "session_id").agg(
        F.min(time_col).alias("s"), F.max(time_col).alias("e")
    )
    # +1 at start, -1 just AFTER end (closed interval: at t == e the
    # session still counts, so the decrement sorts behind every event
    # at e via the (t, delta desc) order ... encode as (e, -1) with
    # starts-first tie rule instead)
    ends = sess.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    starts = sess.select(F.col("s").alias("t"), F.lit(1).alias("d"))
    pts = starts.unionByName(ends)
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rp = (
        # +1 before -1 at the same t: d DESC in the range order
        pts.repartitionByRange(nparts, F.col("t"), F.col("d").desc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = sorted(
        rp.groupBy("__pid").agg(F.sum("d").alias("s")).collect(),
        key=lambda r: r["__pid"],
    )
    base, acc = {}, 0
    for r in sums:
        base[r["__pid"]] = acc
        acc += r["s"]
    base_df = F.broadcast(
        spark.createDataFrame(
            [(p, b) for p, b in base.items()] or [(0, 0)],
            "__pid int, __base long",
        )
    )
    w = Window.partitionBy("__pid").orderBy(
        F.col("t"), F.col("d").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    run = (
        rp.join(base_df, "__pid")
        .withColumn("__run", F.col("__base") + F.sum("d").over(w))
    )
    n_sessions = sess.count()
    peak = run.agg(F.max("__run").alias("p")).collect()[0]["p"] or 0
    earliest = (
        run.filter(F.col("__run") == F.lit(peak))
        .agg(F.min("t").alias("t"))
        .collect()[0]["t"]
    )
    return spark.createDataFrame(
        [(int(n_sessions), int(peak), earliest)],
        "n_sessions long, peak_concurrency long, peak_time long",
    )


def percentiles_by_bucket(
    df: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = TIME_COL,
    bucket_seconds: int = 3600,
    bin_width: float = 1.0,
) -> DataFrame:
    """Time-bucketed percentiles — the "p99 per key per hour" dashboard
    series: :func:`histogram_percentiles`'s sort-free nearest-rank
    selection applied per (key, time bucket). Same exact-integer
    selection lattice and column scheme, plus the ``bucket`` column.

    Plan shape inherits the histogram operator: one map-side-combined
    (key, bucket, bin) aggregate, windows over BINS within each
    (key, bucket) cell — never a row sort.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"percentiles_by_bucket: bucket_seconds must be > 0, got "
            f"{bucket_seconds}"
        )
    b = F.expr(f"{time_col} div {bucket_seconds}")
    keyed = df.withColumn(
        "__kb",
        F.struct(F.col(key_col).alias("k"), b.alias("b")),
    )
    out = histogram_percentiles(
        keyed, probs, key_col="__kb", value_col=value_col, bin_width=bin_width
    )
    rest = [c for c in out.columns if c != "key"]
    return out.select(
        F.col("key.k").alias("key"), F.col("key.b").alias("bucket"), *rest
    )


def mad_outliers_by_key(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    k: int = 5,
) -> DataFrame:
    """Robust per-key value anomalies: events whose value deviates from
    their KEY's median by more than ``k`` median-absolute-deviations —
    the heavy-tail-safe complement of `trail_value_outliers`' k-sigma
    test (one whale purchase doesn't move a median the way it moves a
    mean, so MAD flags the whale instead of masking it). All integer on
    the cents lattice: lower-median selection ``min c : 2·cum ≥ tot``
    (the same nearest-rank rule as `histogram_percentiles` at p50),
    MAD by the same rule over ``|c − med|``, strict ``|c − med| > k·MAD``
    flag — bit-identical across engines. When MAD = 0 (more than half
    the key's values identical) any value off the median flags; that is
    the standard MAD degeneracy, not a bug. NULL values are excluded.

    Plan shape: one map-side-combined (key, cents) histogram feeds both
    selection windows (value-lattice-sized, never event-sized); the
    per-key (median, MAD) table is keys-sized and BROADCASTs back onto
    the events for the flag filter — the event scan never shuffles.
    Returns flagged events ``(key, uuid, time, cents, med_cents,
    mad_cents)``.
    """
    if k < 1:
        raise ValueError(f"mad_outliers_by_key: k must be >= 1, got {k}")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("time"),
        F.round(F.col(value_col) * 100).cast("long").alias("c"),
    ).filter(F.col("c").isNotNull())
    from .dedup import _materialize

    # hist feeds the median AND the MAD selection — unpersisted, the
    # corpus aggregate ran twice (plan audit: 4 scans for q191);
    # value-lattice-sized, free to pin
    hist = _materialize(
        base.groupBy("key", "c").agg(F.count(F.lit(1)).alias("cnt"))
    )
    wv = Window.partitionBy("key").orderBy("c")
    wk = Window.partitionBy("key")
    med = (
        hist.select(
            "key",
            "c",
            F.sum("cnt").over(wv).alias("cu"),
            F.sum("cnt").over(wk).alias("tot"),
        )
        .groupBy("key")
        .agg(
            F.min(
                F.when(2 * F.col("cu") >= F.col("tot"), F.col("c"))
            ).alias("med")
        )
    )
    wd = Window.partitionBy("key").orderBy("d")
    mad = (
        hist.join(F.broadcast(med), "key")
        .groupBy("key", F.abs(F.col("c") - F.col("med")).alias("d"))
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            "key",
            "d",
            F.sum("cnt").over(wd).alias("cu"),
            F.sum("cnt").over(wk).alias("tot"),
        )
        .groupBy("key")
        .agg(
            F.min(
                F.when(2 * F.col("cu") >= F.col("tot"), F.col("d"))
            ).alias("mad")
        )
    )
    st = med.join(mad, "key")
    return (
        base.join(F.broadcast(st), "key")
        .filter(F.abs(F.col("c") - F.col("med")) > F.lit(int(k)) * F.col("mad"))
        .select(
            "key",
            "uuid",
            "time",
            F.col("c").alias("cents"),
            F.col("med").alias("med_cents"),
            F.col("mad").alias("mad_cents"),
        )
    )


def interarrival_percentiles(
    df: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    key_col: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
    bin_width: float = 1.0,
) -> DataFrame:
    """Inter-arrival-time percentiles per key: how long between a
    trail's consecutive events OF THE SAME TYPE ("users click every
    ~40s at p50, every 20min at p99") — the cadence report behind
    session-gap tuning and robot thresholds (`robot_trails` flags the
    too-regular tail; this maps the whole distribution). Gaps come from
    one per-(trail, key) lag window with the deterministic
    ``tiebreak_col`` ordering (equal timestamps yield 0-second gaps,
    kept — they are real cadence); each trail's first event of a key
    has no predecessor and contributes nothing. Selection is
    :func:`histogram_percentiles`' exact-integer nearest-rank lattice.

    Plan shape: ONE uuid-hash shuffle for the lag window, then the
    histogram aggregate (map-side combined, gap-lattice-sized state);
    never an event-scale sort beyond the per-partition window sort.
    """
    w = Window.partitionBy(uuid_col, key_col).orderBy(
        time_col, tiebreak_col
    )
    gaps = df.withColumn(
        "__gap",
        (F.col(time_col) - F.lag(time_col).over(w)).cast("double"),
    ).filter(F.col("__gap").isNotNull())
    return histogram_percentiles(
        gaps, probs, key_col=key_col, value_col="__gap", bin_width=bin_width
    )


def contingency_chisq(
    df: DataFrame,
    col_a: str = "a",
    col_b: str = "b",
) -> DataFrame:
    """Chi-square contingency cells for two categorical columns — the
    "is event mix independent of hour / is label mix independent of
    source" audit, reported PER CELL so the answer is which
    combinations deviate, not just a single statistic. Exact integers::

        dev          = N·O_ab − R_a·C_b        (signed: over/under)
        chi2_ppm     = dev²·10⁶ // (N·R_a·C_b)  (the cell's χ² term, ppm)

    Zero-observed cells are first-class (an (a, b) combination that
    never occurs IS the finding when both margins are big). NULL
    categories are excluded. The decimal(38,0) lattice is exact to
    N ≤ 10⁹ rows; beyond that an in-plan ``assert_true`` raises rather
    than wraps (and a χ² on more rows is statistically meaningless
    anyway — slice first).

    Plan shape: one (a, b) map-side-combined aggregate plus two margin
    aggregates; the grid is margins × margins (lexicon²-bounded,
    BROADCAST on the smaller side) — the event scan runs once, nothing
    event-scale shuffles twice. Returns ``(a, b, observed, row_total,
    col_total, dev_num, chi2_cell_ppm)``.
    """
    base = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    from .dedup import _materialize

    # one corpus aggregate instead of four: the margins and the total
    # are SUMS of the (a, b) cell counts, so only the lexicon²-bounded
    # obs table is pinned — the event-scale projection is scanned once
    # and never cached (previously base itself was persisted and four
    # aggregates read the corpus-sized cache)
    obs = _materialize(
        base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("r"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("c"))
    n = obs.agg(F.coalesce(F.sum("o"), F.lit(0)).alias("n"))
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(obs, ["a", "b"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            F.coalesce(F.col("o"), F.lit(0)).alias("observed"),
            F.col("r").alias("row_total"),
            F.col("c").alias("col_total"),
            "n",
        )
    )
    dec = "decimal(38,0)"
    nn = F.col("n").cast(dec)
    dev = (
        nn * F.col("observed").cast(dec)
        - F.col("row_total").cast(dec) * F.col("col_total").cast(dec)
    )
    guard = F.assert_true(
        F.col("n") <= F.lit(1_000_000_000),
        F.lit("contingency_chisq: N > 1e9 overflows the lattice — slice first"),
    )
    return grid.select(
        "a",
        "b",
        "observed",
        "row_total",
        "col_total",
        F.when(guard.isNull(), dev.cast("long")).alias("dev_num"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * observed"
            " - CAST(row_total AS DECIMAL(38,0)) * col_total)"
            " * (CAST(n AS DECIMAL(38,0)) * observed"
            " - CAST(row_total AS DECIMAL(38,0)) * col_total)"
            " * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * row_total * col_total)"
            " AS BIGINT)"
        ).alias("chi2_cell_ppm"),
    )


def edge_savings_by_field(
    df: DataFrame,
    fields: tuple[str, ...] = ("event_type", "value", "props"),
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Edge-encoding compressibility profile: for each field, how often
    an event repeats its trail-predecessor's value — EXACTLY the win
    the reference's encoder banks by storing only changed items per
    event (`src/tdb_encode.c` edge encoding; surfaced by our only-diff
    cursor view, `trails.py` C7). A field at 900k ppm repeats is why
    TrailDB files are small; the same number tells a Spark pipeline
    which columns deserve dictionary/RLE-friendly sort orders.

    Per field: ``n_comparisons`` (events that HAVE a predecessor —
    first-of-trail rows can't repeat anything), ``n_repeats``
    (NULL-safe equality with the predecessor: NULL→NULL counts as a
    repeat, exactly like the decoder's carry), ``repeat_ppm`` by
    truncating integer division.

    Plan shape: ONE uuid-hash shuffle — every field's lag shares the
    same window spec, so Catalyst evaluates all lags in a single
    Window node; the final aggregate is fields-sized.
    """
    if not fields:
        raise ValueError("edge_savings_by_field: fields must be non-empty")
    w = Window.partitionBy(uuid_col).orderBy(time_col, tiebreak_col)
    has_prev = F.lag(F.col(time_col)).over(w).isNotNull()
    cols = [has_prev.cast("long").alias("__cmp")]
    for f in fields:
        rep = (has_prev & F.col(f).eqNullSafe(F.lag(F.col(f)).over(w))).cast(
            "long"
        )
        cols.append(rep.alias(f"__rep_{f}"))
    agg = df.select(*cols).agg(
        F.sum("__cmp").alias("n_comparisons"),
        *[F.sum(f"__rep_{f}").alias(f"__r_{f}") for f in fields],
    )
    rows = []
    for f in fields:
        rows.append(
            F.struct(
                F.lit(f).alias("field"),
                F.col("n_comparisons"),
                F.col(f"__r_{f}").alias("n_repeats"),
                F.when(
                    F.col("n_comparisons") > 0,
                    F.expr(
                        f"__r_{f} * CAST(1000000 AS BIGINT)"
                        " div n_comparisons"
                    ),
                ).alias("repeat_ppm"),
            )
        )
    return agg.select(
        F.explode(F.array(*rows)).alias("s")
    ).select("s.field", "s.n_comparisons", "s.n_repeats", "s.repeat_ppm")


def attribution_decay(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    half_life: int = 86400,
    lookback: int | None = None,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    id_col: str = "event_id",
) -> DataFrame:
    """Time-decay multi-touch attribution: every conversion splits
    exactly 10000 basis points over its eligible prefix touches with
    weights HALVING per ``half_life`` seconds of age — the standard
    "recent touches matter more" model, exact in integers: a touch
    ``b = age // half_life`` half-lives old carries weight
    ``2^(62 − min(b, 62))`` (a pure shift — no float pow anywhere), the
    per-touch credit is the decimal-lattice floor ``10000·w // Σw``,
    and the remainder goes to the MOST RECENT touch so credit conserves
    exactly (`attribution_linear`'s conservation rule; a touch 62+
    half-lives stale still carries the 1-weight floor). Conversions
    with no eligible touch credit '(none)'.

    Same plan as `attribution_linear`: one uuid-keyed per-trail
    pairing, per-conversion windows, ≤ |touches|+1 output channels.

    Returns ``(channel, conversions_touched, credit_bp)``.
    """
    if half_life <= 0:
        raise ValueError(
            f"attribution_decay: half_life must be > 0, got {half_life}"
        )
    conv = df.filter(F.col(field) == conversion).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__ct"),
        F.col(id_col).alias("__cid"),
    )
    tch = df.filter(F.col(field).isin(list(touches))).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__tt"),
        F.col(id_col).alias("__tid"),
        F.col(field).alias("__ch"),
    )
    before = (F.col("__tt") < F.col("__ct")) | (
        (F.col("__tt") == F.col("__ct")) & (F.col("__tid") < F.col("__cid"))
    )
    cond = before
    if lookback is not None:
        cond = cond & (F.col("__tt") >= F.col("__ct") - F.lit(int(lookback)))
    from .dedup import _materialize

    # conv feeds the pairing join AND the untouched anti-join — pin the
    # projected conversions subset so events aren't re-scanned per
    # consumer (plan audit: 5 scans per attribution query)
    conv = _materialize(conv)
    j = conv.join(tch, "__u").filter(cond)
    b = F.least(
        F.floor((F.col("__ct") - F.col("__tt")) / F.lit(int(half_life))),
        F.lit(62),
    ).cast("int")
    # pyspark's shiftleft wrapper wants a literal shift — the SQL form
    # takes the computed one
    j = j.withColumn("__b", b).withColumn(
        "__w", F.expr("shiftleft(CAST(1 AS BIGINT), 62 - __b)")
    )
    wn = Window.partitionBy("__u", "__cid")
    wr = Window.partitionBy("__u", "__cid").orderBy(
        F.desc("__tt"), F.desc("__tid")
    )
    dec = "decimal(38,0)"
    # NOTE: the sum column must NOT be named "__W" — Spark's resolver is
    # case-insensitive by default, so withColumn("__W") would silently
    # REPLACE "__w" and every touch's weight becomes the window total.
    # credited feeds the per-channel aggregate AND the untouched
    # anti-join; unpersisted, the pairing join + credit windows ran twice
    credited = _materialize(
        j.withColumn("__tw", F.sum(F.col("__w").cast(dec)).over(wn))
        .withColumn("__rn", F.row_number().over(wr))
        .withColumn(
            "__bpf",
            F.expr(
                "CAST(CAST(10000 AS DECIMAL(38,0)) * __w div __tw AS BIGINT)"
            ),
        )
        .withColumn("__sbp", F.sum("__bpf").over(wn))
        .withColumn(
            "__bp",
            F.when(
                F.col("__rn") == 1,
                F.lit(10000) - (F.col("__sbp") - F.col("__bpf")),
            ).otherwise(F.col("__bpf")),
        )
    )
    per_channel = credited.groupBy(F.col("__ch").alias("channel")).agg(
        F.countDistinct("__u", "__cid").alias("conversions_touched"),
        F.sum("__bp").cast("long").alias("credit_bp"),
    )
    untouched = (
        conv.join(
            credited.select("__u", "__cid").distinct(),
            ["__u", "__cid"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("(none)").alias("channel"),
            F.col("n").alias("conversions_touched"),
            (F.col("n") * 10000).cast("long").alias("credit_bp"),
        )
        .filter(F.col("conversions_touched") > 0)
    )
    return per_channel.unionByName(untouched)


def field_mutual_information(
    df: DataFrame,
    field_x: str,
    field_y: str,
) -> DataFrame:
    """Whole-bit mutual information between two categorical fields — the
    feature-dependence signal ("does event_type carry information about
    hour-of-day?") in the same binary-digit integerization as
    :func:`~traildb_spark.operators.text.cooccurrence_pmi`: each
    occupied cell contributes ``c_xy · pmi_bits`` where ``pmi_bits =
    bits(c_xy) + bits(N) − bits(c_x) − bits(c_y)`` (bits = binary digit
    count ≤ 63, so nothing overflows and the score is bit-portable
    across engines). Exact-rational MI needs logs no integer lattice
    holds; the whole-bit form preserves ordering between field pairs,
    which is what feature selection consumes.

    Per-event millibits use the non-negative-operand rule: ``sign(W) ·
    (|W|·1000 div N)`` so Spark ``div`` (truncate) and DuckDB ``//``
    (floor) agree on negative totals.

    Scale: one groupBy(x, y) with map-side combine bounds everything at
    lexicon_x × lexicon_y cells; marginals and N are re-aggregates of
    the cell table, never of the events; output is ONE row.

    Returns ``(n_events, n_cells, mi_bits_weighted,
    mi_millibits_per_event)``.
    """
    from .dedup import _materialize

    # cells feeds both marginals, the total and the PMI join —
    # unpersisted, the corpus aggregate ran four times (plan audit: 4
    # scans for q207); lexicon²-bounded
    cells = _materialize(
        df.groupBy(
            F.col(field_x).alias("x"), F.col(field_y).alias("y")
        ).agg(F.count(F.lit(1)).alias("cxy"))
    )
    cx = cells.groupBy("x").agg(F.sum("cxy").alias("cx"))
    cy = cells.groupBy("y").agg(F.sum("cxy").alias("cy"))
    n = cells.agg(F.sum("cxy").alias("n"))

    def bits(c):
        return F.length(F.bin(c.cast("long")))

    per = (
        cells.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            "cxy",
            (
                bits(F.col("cxy")) + bits(F.col("n"))
                - bits(F.col("cx")) - bits(F.col("cy"))
            ).cast("long").alias("pmi_bits"),
        )
    )
    return (
        per.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col("cxy") * F.col("pmi_bits")).alias("w"),
        )
        .select(
            F.col("n").cast("long").alias("n_events"),
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("w").cast("long").alias("mi_bits_weighted"),
            (
                F.signum("w").cast("long")
                * F.expr("abs(w) * 1000 div n")
            ).cast("long").alias("mi_millibits_per_event"),
        )
    )


def ordered_pair_support(
    df: DataFrame,
    field: str = "event_type",
    min_trails: int = 2,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Sequential-pattern support counting (the length-2 core of
    PrefixSpan): for every ordered value pair (src → dst), the number of
    trails containing src strictly-before dst in time — any gap, any
    events between. The exactness trick that avoids a per-trail
    event×event self-join: "src before dst somewhere in the trail" ⟺
    ``min_time(src) < max_time(dst)``, so one per-(trail, value)
    aggregate (min, max) suffices and the pair join runs on the
    per-trail VALUE table (≤ lexicon rows per trail), never on events.
    src = dst counts trails with two occurrences at distinct times.

    Scale: one shuffle keyed (uuid, value) with map-side combine; the
    per-trail self-join fans out ≤ lexicon² rows per trail; the final
    aggregate is pair-space-sized. ``min_trails`` prunes the tail.

    Returns ``(src, dst, n_trails)``.
    """
    per = df.groupBy(
        F.col(uuid_col).alias("u"), F.col(field).alias("v")
    ).agg(
        F.min(time_col).alias("tmin"), F.max(time_col).alias("tmax")
    )
    a = per.select("u", F.col("v").alias("src"), "tmin")
    b = per.select("u", F.col("v").alias("dst"), "tmax")
    return (
        a.join(b, "u")
        .filter(F.col("tmin") < F.col("tmax"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_trails"))
        .filter(F.col("n_trails") >= int(min_trails))
    )


def transition_surprisal(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Per-trail surprisal under the corpus's own first-order Markov
    model — the behavioral-anomaly score "how unusual is this trail's
    event SEQUENCE", complementing :func:`robot_trails` (which scores
    timing). Each step prev → cur costs ``bits(c_prev) − bits(c_pair)``
    whole bits (≈ log2(1/P(cur|prev)), non-negative since c_pair ≤
    c_prev), where the counts come from :func:`transition_counts` over
    the SAME input. Trails whose transitions are all common score near
    zero; a trail full of never-seen-elsewhere transitions scores
    high. millibits_per_step = 1000·sum div steps (non-negative, so
    truncate == floor across engines).

    Scale: the model is the lexicon²-bounded pair table, broadcast with
    its src marginals; events shuffle ONCE on uuid for the lag window;
    the join against the broadcast model is map-side. Per-trail output.

    Returns ``(uuid, n_steps, surprisal_bits, millibits_per_step)``.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    steps = df.withColumn("__prev", F.lag(F.col(field)).over(w)).filter(
        F.col("__prev").isNotNull()
    )
    from .dedup import _materialize

    # pair_counts feeds the src marginals AND the model join —
    # unpersisted, the corpus lag-window pass ran twice (plan audit: 3
    # scans for q209); lexicon²-bounded
    pair_counts = _materialize(
        transition_counts(df, field, uuid_col, time_col, *tiebreak)
    )
    src_counts = pair_counts.groupBy("src").agg(
        F.sum("freq").alias("c_src")
    )
    model = pair_counts.join(src_counts, "src").select(
        "src",
        "dst",
        (
            F.length(F.bin(F.col("c_src")))
            - F.length(F.bin(F.col("freq")))
        ).cast("long").alias("step_bits"),
    )
    return (
        steps.select(
            F.col(uuid_col).alias("uuid"),
            F.col("__prev").alias("src"),
            F.col(field).alias("dst"),
        )
        .join(F.broadcast(model), ["src", "dst"])
        .groupBy("uuid")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.sum("step_bits").alias("surprisal_bits"),
        )
        .select(
            "uuid",
            F.col("n_steps").cast("long").alias("n_steps"),
            F.col("surprisal_bits").cast("long").alias("surprisal_bits"),
            F.expr("surprisal_bits * 1000 div n_steps")
            .cast("long").alias("millibits_per_step"),
        )
    )


def rolling_features(
    df: DataFrame,
    k: int = 5,
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Per-event rolling-window features over each trail — the standard
    ML feature-generation pass ("mean/extremes of the last k values as
    of each event") that cursor programs hand-roll in the reference
    model. Exact on the cents lattice (``round(value·100)`` as int64,
    bit-portable across engines); the window is the k most recent
    events INCLUDING the current one, ordered by (time, *tiebreak).
    NULL values stay in the event stream (they occupy a window slot)
    but contribute nothing to the aggregates — ``roll_n`` counts only
    non-NULL values, so callers can distinguish "window of NULLs" from
    "trail too short".

    One shuffle on uuid; four frame-bounded window aggregates share the
    single sort — Catalyst fuses them into one Window node. Per-trail
    window state is O(k) regardless of trail length, so whales stream.

    Returns ``(uuid, time, event_id, cents, roll_n, roll_sum_cents,
    roll_min_cents, roll_max_cents)``.
    """
    if k <= 0:
        raise ValueError(f"rolling_features: k must be > 0, got {k}")
    w = (
        Window.partitionBy(uuid_col)
        .orderBy(time_col, *tiebreak)
        .rowsBetween(-(k - 1), 0)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    return df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("time"),
        F.col("event_id"),
        cents.alias("cents"),
    ).select(
        "uuid",
        "time",
        "event_id",
        "cents",
        F.count("cents").over(w).alias("roll_n"),
        F.sum("cents").over(w).alias("roll_sum_cents"),
        F.min("cents").over(w).alias("roll_min_cents"),
        F.max("cents").over(w).alias("roll_max_cents"),
    )


def column_profile(
    df: DataFrame,
    fields: list[str],
) -> DataFrame:
    """One-pass data-profiling report over string fields — the
    Deequ-style summary a pipeline runs before trusting a new drop:
    per field, row/empty counts, distinct cardinality, value-length
    extremes, and the modal value with its frequency (ties break to the
    lexicographically smallest value, deterministic across engines and
    partitionings).

    Scale: the fields are MELTED into (field, value) rows (a narrow
    k-way explode, no shuffle), then ONE aggregate keyed (field, value)
    with map-side combine bounds everything downstream at Σ lexicon
    sizes; the per-field rollup and the modal row_number run on that
    value table, never on events. '' is the canonical empty marker
    (the ''≡NULL contract), counted separately and excluded from the
    modal pick.

    Returns ``(field, n_rows, n_empty, n_distinct, min_len, max_len,
    top_value, top_freq)``.
    """
    if not fields:
        raise ValueError("column_profile: fields must be non-empty")
    pairs = df.select(
        F.explode(
            F.create_map(
                *[
                    x
                    for f in fields
                    # cast BEFORE coalesce: a numeric field melted next
                    # to strings would otherwise coerce the whole map's
                    # value type (and '' -> BIGINT casts throw under ANSI)
                    for x in (
                        F.lit(f),
                        F.coalesce(F.col(f).cast("string"), F.lit("")),
                    )
                ]
            )
        ).alias("field", "value")
    )
    vals = pairs.groupBy("field", "value").agg(
        F.count(F.lit(1)).alias("freq")
    )
    per_field = vals.groupBy("field").agg(
        F.sum("freq").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value") == "", F.col("freq")).otherwise(0))
        .cast("long").alias("n_empty"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.min(F.length("value")).cast("int").alias("min_len"),
        F.max(F.length("value")).cast("int").alias("max_len"),
    )
    wtop = Window.partitionBy("field").orderBy(
        F.desc("freq"), F.asc("value")
    )
    top = (
        vals.filter(F.col("value") != "")
        .withColumn("__rn", F.row_number().over(wtop))
        .filter(F.col("__rn") == 1)
        .select(
            "field",
            F.col("value").alias("top_value"),
            F.col("freq").cast("long").alias("top_freq"),
        )
    )
    return per_field.join(top, "field", "left")


def label_propagation(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
    iterations: int = 5,
    max_nodes: int = 10_000,
) -> DataFrame:
    """Community detection over the event-transition graph by
    synchronous label propagation — "which states cluster into
    behavioral phases", the partitioning complement to
    :func:`pagerank_transitions`' centrality. Edges are the SYMMETRIZED
    within-trail adjacency counts (w(u,v) = freq(u→v) + freq(v→u),
    self-loops dropped); every node starts as its own community; each
    round every node adopts the label with the highest incident weight
    sum, ties to the lexicographically SMALLEST label; a FIXED
    iteration count makes the output deterministic and bit-portable
    (classic async LPA is order-dependent — useless as an oracle-able
    operator).

    Scale posture: identical to pagerank_transitions — the event-scale
    work (one uuid shuffle + lexicon²-keyed count) runs in Spark, the
    iteration runs on the collected lexicon-sized matrix in exact
    python (``max_nodes`` refuses unbounded value domains).

    Returns ``(value, community, community_size)``.
    """
    if iterations < 1:
        raise ValueError(
            f"label_propagation: iterations must be >= 1, got {iterations}"
        )
    raw = transition_counts(df, field, uuid_col, time_col, *tiebreak).collect()
    w: dict[tuple[str, str], int] = {}
    for r in raw:
        if r.src == r.dst:
            continue
        w[(r.src, r.dst)] = w.get((r.src, r.dst), 0) + r.freq
        w[(r.dst, r.src)] = w.get((r.dst, r.src), 0) + r.freq
    nodes = sorted({r.src for r in raw} | {r.dst for r in raw})
    if len(nodes) > max_nodes:
        raise ValueError(
            f"label_propagation: {len(nodes)} nodes exceeds max_nodes="
            f"{max_nodes}"
        )
    spark = df.sparkSession
    if not nodes:
        return spark.createDataFrame(
            [], "value string, community string, community_size long"
        )
    nbrs: dict[str, list[tuple[str, int]]] = {v: [] for v in nodes}
    for (u, v), wt in w.items():
        nbrs[u].append((v, wt))
    label = {v: v for v in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            votes: dict[str, int] = {}
            for u, wt in nbrs[v]:
                votes[label[u]] = votes.get(label[u], 0) + wt
            # max weight, ties -> smallest label
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        label = new
    size: dict[str, int] = {}
    for v in nodes:
        size[label[v]] = size.get(label[v], 0) + 1
    return spark.createDataFrame(
        [(v, label[v], size[label[v]]) for v in nodes],
        "value string, community string, community_size long",
    )


def seasonal_anomalies(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = TIME_COL,
    k: int = 3,
    period: str = "day",
) -> DataFrame:
    """Seasonally-adjusted volume anomalies: each (key, hour-of-PERIOD)
    cell is tested against ITS OWN per-period baseline — "15:00 volume
    is off for this source, for a 15:00" — so diurnal/weekly rhythm
    never masquerades as an anomaly the way it does under
    :func:`anomalous_buckets`' flat per-key baseline. Delegates the
    exact k-sigma integer inequality to :func:`anomalies_from_counts`
    with a composite (key, phase) key and the PERIOD as the bucket
    axis: ``period='day'`` tests (key, hour-of-day) cells across days;
    ``period='week'`` tests (key, hour-of-week) cells across epoch
    weeks (boundaries Thursday 00:00 UTC; hours shifted +72 so phase 0
    = Monday 00:00, the `weekly_profile` rule). Zero periods are
    first-class candidates.

    Returns ``(key, phase_hour, bucket, y, dev_num, bound_num)`` — only
    the flagged rows, magnitudes exact.
    """
    if period == "day":
        phase = F.expr(f"({time_col} div 3600) % 24")
        bucket_seconds = 86400
    elif period == "week":
        phase = F.expr(f"(({time_col} div 3600) + 72) % 168")
        bucket_seconds = 604800
    else:
        raise ValueError(
            f"seasonal_anomalies: period must be 'day' or 'week', got {period!r}"
        )
    out = anomalous_buckets(
        df.withColumn(
            "__skey",
            F.concat_ws("|", F.col(key_col), F.lpad(phase.cast("string"), 3, "0")),
        ),
        "__skey",
        time_col,
        bucket_seconds,
        k,
    )
    return out.select(
        F.expr("substring(key, 1, length(key) - 4)").alias("key"),
        F.expr("CAST(substring(key, length(key) - 2, 3) AS INT)")
        .alias("phase_hour"),
        F.col("bucket"),
        "y",
        "dev_num",
        "bound_num",
    )


def transition_prediction_accuracy(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Top-1 next-event prediction accuracy of the corpus's own Markov
    model, per trail — "how mechanically predictable is this trail",
    the evaluation twin of :func:`transition_surprisal` (that one
    scores information content; this one scores a concrete predictor).
    The model predicts argmax P(dst | src) with ties to the
    lexicographically smallest dst (struct-min on (-freq, dst) — the
    deterministic rule both engines share); each step scores hit/miss
    against the trail's actual next event; accuracy is exact ppm.

    Note the standard in-sample caveat: the model is fit on the SAME
    events it scores (self-evaluation — fine for "which trails are
    bots", wrong for honest generalization claims; fit on a split for
    that).

    Scale: one uuid shuffle for the lag window; the predictor table is
    lexicon-sized and broadcast; output trail-sized.

    Returns ``(uuid, n_steps, n_correct, accuracy_ppm)``.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    steps = df.withColumn("__prev", F.lag(F.col(field)).over(w)).filter(
        F.col("__prev").isNotNull()
    )
    pred = (
        transition_counts(df, field, uuid_col, time_col, *tiebreak)
        .groupBy("src")
        .agg(
            F.min(
                F.struct(
                    (-F.col("freq")).alias("nf"), F.col("dst").alias("d")
                )
            )["d"].alias("pred")
        )
    )
    return (
        steps.select(
            F.col(uuid_col).alias("uuid"),
            F.col("__prev").alias("src"),
            F.col(field).alias("dst"),
        )
        .join(F.broadcast(pred), "src")
        .groupBy("uuid")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.sum(
                F.when(F.col("dst") == F.col("pred"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "uuid",
            F.col("n_steps").cast("long").alias("n_steps"),
            F.col("n_correct").cast("long").alias("n_correct"),
            F.expr("n_correct * 1000000 div n_steps")
            .cast("long").alias("accuracy_ppm"),
        )
    )


def state_dwell_times(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Time-in-state attribution: every event "owns" the interval until
    the trail's NEXT event (LOCF — the session-replay convention), and
    the owned seconds aggregate per state — "where do users actually
    spend their time", which event-count frequencies misstate badly
    when states have different cadences. Each trail's LAST event owns
    no interval (no successor; the open-ended tail is policy, not data
    — callers append a synthetic end event if they want it counted).
    Same-timestamp successors contribute zero dwell, consistent with
    the TWAP tie rule.

    One uuid shuffle for the lead window, one lexicon-sized aggregate.

    Returns ``(value, n_intervals, total_dwell_seconds,
    mean_dwell_ms)`` — the mean as exact milliseconds (truncating
    division on non-negative operands).
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    nxt = df.withColumn("__nt", F.lead(F.col(time_col)).over(w)).filter(
        F.col("__nt").isNotNull()
    )
    return (
        nxt.groupBy(F.col(field).alias("value"))
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("__nt") - F.col(time_col)).alias("dwell"),
        )
        .select(
            "value",
            F.col("n_intervals").cast("long").alias("n_intervals"),
            F.col("dwell").cast("long").alias("total_dwell_seconds"),
            F.expr("dwell * 1000 div n_intervals")
            .cast("long").alias("mean_dwell_ms"),
        )
    )


# floor(1e6 · log10(1 + 1/d)) for d = 1..9 — fixed literals so both
# engines compare against the identical rational lattice
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991,
                51152, 45757]


def benford_deviation(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """First-digit (Benford) profile of a numeric column — the
    fraud/data-quality screen: naturally-occurring amounts follow
    P(d) = log10(1 + 1/d); fabricated or truncated feeds don't. Values
    are integerized to cents (one IEEE round), zeros dropped (no
    leading digit), and each digit row carries the observed exact-ppm
    share next to the fixed Benford lattice (floored-ppm literals — no
    runtime logs, no float compare) and the absolute gap. All nine
    digits always present (zero-filled), so the output is a fixed
    9-row table any monitor can diff.

    One map-side-combined 9-key aggregate; nothing value-sized leaves
    the scan.

    Returns ``(digit, n, observed_ppm, benford_ppm, abs_diff_ppm)``.
    """
    cents = F.abs(F.round(F.col(value_col) * 100).cast("long"))
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    per = (
        df.select(cents.alias("c"), digit.alias("digit"))
        .filter(F.col("c") > 0)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(d + 1, _BENFORD_PPM[d]) for d in range(9)],
        "digit int, benford_ppm long",
    )
    tot = per.agg(F.sum("n").alias("t"))
    return (
        grid.join(per, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.expr("coalesce(n, 0) * 1000000 div t")
            .cast("long").alias("observed_ppm"),
            "benford_ppm",
            F.abs(
                F.expr("coalesce(n, 0) * 1000000 div t")
                - F.col("benford_ppm")
            ).cast("long").alias("abs_diff_ppm"),
        )
    )


def ewma_features(
    df: DataFrame,
    window: int = 32,
    value_col: str = "value",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Per-event exponentially-weighted moving average with α = 1/2,
    EXACT: the most recent value carries weight 2^(L−1), the one before
    2^(L−2), ... over the trailing ``window`` events (L = frame size at
    this row), normalized by the closed-form weight sum 2^L − 1 — pure
    shifts and one sign-factored integer division on the cents lattice,
    so the smoothed series is bit-identical across engines (a float
    recurrence is neither associative nor engine-portable). This IS
    the α=1/2 EWMA restricted to a ``window``-deep horizon; terms
    beyond it carry < 2^-window of the mass — truncation, not
    approximation, is the contract.

    NULL values are DROPPED from the frame (they carry no weight and
    shift nothing — the pandas ``ewm(ignore_na=True)`` rule).

    One uuid shuffle; the frame-ordered value list is O(window) per
    row. ``window`` ≤ 40 keeps every shifted term inside int64 before
    the decimal accumulate (cents up to ±2^20 · 2^39 < 2^63).

    Returns ``(uuid, time, event_id, cents, ewma_cents)``.
    """
    if not 1 <= window <= 40:
        raise ValueError(
            f"ewma_features: window must be in [1, 40], got {window}"
        )
    w = (
        Window.partitionBy(uuid_col)
        .orderBy(time_col, *tiebreak)
        .rowsBetween(-(window - 1), 0)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(uuid_col).alias("uuid"),
        F.col(time_col).alias("time"),
        F.col("event_id"),
        cents.alias("cents"),
    ).withColumn(
        "__xs",
        F.filter(F.collect_list("cents").over(w), lambda x: x.isNotNull()),
    )
    base = base.withColumn(
        "__num",
        F.expr(
            "aggregate(zip_with(__xs, sequence(0, size(__xs) - 1),"
            " (v, i) -> struct(v AS v, i AS i)),"
            " CAST(0 AS DECIMAL(38,0)),"
            " (acc, s) -> acc + CAST(shiftleft(s.v, s.i)"
            " AS DECIMAL(38,0)))"
        ),
    )
    ewma = F.when(
        F.size("__xs") > 0,
        F.signum("__num").cast("long")
        * F.expr(
            "CAST(abs(__num) div"
            " CAST(shiftleft(CAST(1 AS BIGINT), size(__xs)) - 1"
            " AS DECIMAL(38,0)) AS BIGINT)"
        ),
    ).cast("long")
    return base.select(
        "uuid", "time", "event_id", "cents", ewma.alias("ewma_cents")
    )


def json_schema_report(
    df: DataFrame,
    json_col: str = "props",
) -> DataFrame:
    """Semi-structured profiling of a JSON-string column — the schema
    census a pipeline runs before promoting stringly props to real
    columns: per top-level key, how many rows carry it, how many of
    those values look numeric, and the numeric range; plus the
    ``__invalid__`` row counting payloads that don't parse as a JSON
    object at all (the '' ≡ NULL empties land there too — an empty
    props is "no object", not "object with no keys"). Values are
    profiled as STRINGS (``map<string,string>`` parse), numeric-ness by
    the explicit ``^-?[0-9]+(\\.[0-9]+)?$`` regex both engines share.

    One narrow parse + explode, then a key-space-sized aggregate with
    map-side combine — top-level key universes are schema-sized, not
    row-sized.

    Returns ``(key, n_present, n_numeric, min_num, max_num)`` with the
    range as ``round(x, 6)`` doubles (NULL when no numeric values).
    """
    parsed = df.select(
        F.from_json(F.col(json_col), "map<string,string>").alias("__m")
    )
    num_re = r"^-?[0-9]+(\.[0-9]+)?$"
    kv = parsed.filter(F.col("__m").isNotNull()).select(
        F.explode("__m").alias("key", "value")
    )
    per_key = kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.when(F.col("value").rlike(num_re), 1).otherwise(0))
        .cast("long").alias("n_numeric"),
        F.round(
            F.min(
                F.when(
                    F.col("value").rlike(num_re),
                    F.col("value").cast("double"),
                )
            ),
            6,
        ).alias("min_num"),
        F.round(
            F.max(
                F.when(
                    F.col("value").rlike(num_re),
                    F.col("value").cast("double"),
                )
            ),
            6,
        ).alias("max_num"),
    )
    invalid = parsed.agg(
        F.sum(F.when(F.col("__m").isNull(), 1).otherwise(0))
        .cast("long").alias("n_present")
    ).select(
        F.lit("__invalid__").alias("key"),
        "n_present",
        F.lit(None).cast("long").alias("n_numeric"),
        F.lit(None).cast("double").alias("min_num"),
        F.lit(None).cast("double").alias("max_num"),
    )
    return per_key.unionByName(invalid)


def conversion_paths(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    n_last: int = 3,
    lookback: int | None = None,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    id_col: str = "event_id",
) -> DataFrame:
    """Top paths to conversion: for every conversion event, the ordered
    sequence of its LAST ``n_last`` prefix touches (oldest→newest,
    rendered ``a>b>c``), counted across all conversions — the
    journey-shape report that attribution's per-channel totals erase.
    Prefix semantics match :func:`attribution_linear`: strictly-before
    in time with the id tiebreak, optional ``lookback`` window;
    touchless conversions count under the ``(none)`` path.

    Scale: the conversion × prefix-touch join is the attribution
    fan-out (bounded by touches-per-trail within the lookback); the
    recency window partitions by (trail, conversion); output is
    path-space-sized (≤ |touches|^n_last + 1).

    Returns ``(path, n_conversions)``.
    """
    if n_last < 1:
        raise ValueError(
            f"conversion_paths: n_last must be >= 1, got {n_last}"
        )
    conv = df.filter(F.col(field) == conversion).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__ct"),
        F.col(id_col).alias("__cid"),
    )
    tch = df.filter(F.col(field).isin(list(touches))).select(
        F.col(uuid_col).alias("__u"),
        F.col(time_col).alias("__tt"),
        F.col(id_col).alias("__tid"),
        F.col(field).alias("__ch"),
    )
    before = (F.col("__tt") < F.col("__ct")) | (
        (F.col("__tt") == F.col("__ct")) & (F.col("__tid") < F.col("__cid"))
    )
    cond = before
    if lookback is not None:
        cond = cond & (F.col("__tt") >= F.col("__ct") - F.lit(int(lookback)))
    from .dedup import _materialize

    # conv feeds the pairing join AND the untouched anti-join — pin the
    # projected conversions subset so events aren't re-scanned per
    # consumer (plan audit: 5 scans per attribution query)
    conv = _materialize(conv)
    j = conv.join(tch, "__u").filter(cond)
    wr = Window.partitionBy("__u", "__cid").orderBy(
        F.desc("__tt"), F.desc("__tid")
    )
    # lastn feeds the per-path aggregate AND the untouched anti-join;
    # unpersisted, the pairing join + recency window ran twice
    lastn = _materialize(
        j.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= int(n_last))
        .groupBy("__u", "__cid")
        .agg(
            F.concat_ws(
                ">",
                F.reverse(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    F.col("__rn").alias("r"),
                                    F.col("__ch").alias("c"),
                                )
                            )
                        ),
                        lambda s: s["c"],
                    )
                ),
            ).alias("path")
        )
    )
    per_path = lastn.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions")
    )
    untouched = (
        conv.join(
            lastn.select("__u", "__cid"), ["__u", "__cid"], "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("(none)").alias("path"),
            F.col("n").cast("long").alias("n_conversions"),
        )
        .filter(F.col("n_conversions") > 0)
    )
    return per_path.unionByName(untouched)


def run_length_distribution(
    df: DataFrame,
    field: str = "event_type",
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
) -> DataFrame:
    """Distribution of same-value run lengths within trails — the full
    histogram behind :func:`edge_savings_by_field`'s single repeat
    ratio: how long do users stay in one state before switching
    (run-length 1 everywhere = thrashing; heavy tails = sticky states
    — and the exact payoff profile of the reference's edge encoding,
    which stores one event per RUN). Runs are maximal: a trail
    a,a,b,a contributes runs (a,2), (b,1), (a,1).

    One uuid shuffle shared by two stacked windows (change flags →
    run ids via the prefix-sum-of-changes trick), then a (value,
    run_length)-keyed aggregate — output bounded by lexicon × max-run.

    Returns ``(value, run_length, n_runs)``.
    """
    w = _trail_window(uuid_col, time_col, *tiebreak)
    changed = F.when(
        F.lag(F.col(field)).over(w).isNull()
        | (F.lag(F.col(field)).over(w) != F.col(field)),
        1,
    ).otherwise(0)
    wrun = (
        Window.partitionBy(uuid_col)
        .orderBy(time_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = df.select(
        F.col(uuid_col),
        F.col(time_col),
        *[F.col(t) for t in tiebreak],
        F.col(field).alias("value"),
        changed.alias("__chg"),
    ).withColumn("__run", F.sum("__chg").over(wrun))
    return (
        runs.groupBy(F.col(uuid_col).alias("uuid"), F.col("value"),
                     F.col("__run"))
        .agg(F.count(F.lit(1)).alias("run_length"))
        .groupBy("value", "run_length")
        .agg(F.count(F.lit(1)).cast("long").alias("n_runs"))
    )


def lorenz_points(
    df: DataFrame,
    n_points: int = 10,
    uuid_col: str = UUID_COL,
) -> DataFrame:
    """Lorenz-curve points for activity concentration: trails sorted by
    event count ascending, the cumulative share of EVENTS held by the
    bottom i/n of TRAILS, as exact ppm — the distribution view behind a
    single Gini number ("the busiest decile holds 62% of events").
    Ranks and cumulative sums run on the per-trail COUNT table (one
    event-scale aggregate with map-side combine, everything after is
    trail-count-sized); ties order by uuid so the curve is
    deterministic; point i covers the first ``floor(i·T/n)`` trails.

    The global (rank, cumulative sum) over the trail table uses the
    two-phase range-partition construction (trail_ids' pattern) — an
    unpartitioned orderBy window would funnel every trail through one
    task, the canonical does-not-scale plan.

    Returns ``(point, trails_cum, trail_share_ppm, event_share_ppm)``
    for i = 1..n_points.
    """
    if n_points < 1:
        raise ValueError(
            f"lorenz_points: n_points must be >= 1, got {n_points}"
        )
    per = df.groupBy(F.col(uuid_col).alias("uuid")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tagged = per.repartitionByRange(F.col("n"), F.col("uuid")).withColumn(
        "__pid", F.spark_partition_id()
    )
    totals = (
        tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n").alias("sn"))
        .collect()
    )
    acc_r = acc_e = 0
    offs = []
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offs.append((row["__pid"], acc_r, acc_e))
        acc_r += row["cnt"]
        acc_e += row["sn"]
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(
            offs or [(0, 0, 0)], ["__pid", "__base_r", "__base_e"]
        )
    )
    wl = Window.partitionBy("__pid").orderBy("n", "uuid")
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    ranked = tagged.join(off, "__pid").select(
        "n",
        (F.col("__base_r") + F.row_number().over(wl)).alias("r"),
        (F.col("__base_e") + F.sum("n").over(wc)).alias("cum"),
    )
    tot = spark.createDataFrame([(acc_r, acc_e)], ["t", "e"])
    pts = df.sparkSession.range(1, n_points + 1).select(
        F.col("id").cast("int").alias("point")
    )
    j = pts.crossJoin(F.broadcast(tot)).withColumn(
        "trails_cum", F.expr("point * t div " + str(int(n_points)))
    )
    return (
        j.join(ranked, F.col("r") == F.col("trails_cum"), "left")
        .select(
            "point",
            F.col("trails_cum").cast("long").alias("trails_cum"),
            F.expr(f"point * 1000000 div {int(n_points)}")
            .cast("long").alias("trail_share_ppm"),
            F.coalesce(
                F.expr("cum * 1000000 div e"), F.lit(0)
            ).cast("long").alias("event_share_ppm"),
        )
    )


def adoption_curve(
    df: DataFrame,
    field: str = "event_type",
    bucket_seconds: int = 86400,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
) -> DataFrame:
    """Feature-adoption curves: for each value, how many trails
    FIRST touched it in each time bucket, plus the running cumulative —
    "how fast is purchase spreading through the user base", the
    growth-accounting view. First-touch is the per-(trail, value)
    min-time (one map-side-combined aggregate); the cumulative window
    partitions by value over its ACTIVE buckets only (values × buckets
    rows — zero buckets add nothing to a cumulative and are omitted).

    Returns ``(value, bucket, n_first_trails, cum_trails)``.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"adoption_curve: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    first = df.groupBy(
        F.col(uuid_col).alias("uuid"), F.col(field).alias("value")
    ).agg(F.min(time_col).alias("t0"))
    per = first.groupBy(
        "value",
        F.expr(f"t0 div {int(bucket_seconds)}").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n_first_trails"))
    w = (
        Window.partitionBy("value")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "value",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_first_trails").cast("long").alias("n_first_trails"),
        F.sum("n_first_trails").over(w).cast("long").alias("cum_trails"),
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list —
    the graph-quality companion to label_propagation/connected
    components: triangle-dense neighborhoods in a near-dup graph are
    genuine clone clusters, triangle-free hubs are false-positive
    magnets (one template matching everything pairwise without mutual
    matches).

    Algorithm: canonicalize + dedup edges, then ORIENT every edge from
    the lower-degree endpoint to the higher (ties by id) — the standard
    compact-forward scheme: each triangle is counted exactly once as a
    wedge at its lowest-degree vertex, and the wedge join fans out as
    Σ d_out(v)² with d_out ≤ O(√|E|) for ANY degree distribution, so a
    web-scale hub (degree 10⁶) contributes its √ bound instead of a
    10¹² self-join. Per-node counts then credit each triangle to all
    three corners. Shuffles: degree count, two wedge joins keyed on
    node ids, final per-node fold — no driver state.
    """
    from .dedup import _materialize

    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # the edge list fans out into degree count, two orientation joins,
    # and the closing join — pin it once or an expensive upstream edge
    # pipeline (LSH candidates + verify) re-executes per consumer
    e = _materialize(e)
    # deg feeds both orientation sides — node-sized, pin it
    deg = _materialize(
        e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    oriented = (
        e.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            ).otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
    )
    oriented = _materialize(oriented)
    w1 = oriented.select(F.col("s"), F.col("t").alias("a"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("b"))
    wedges = (
        w1.join(w2, "s")
        .filter(F.col("a") < F.col("b"))
    )
    # the wedge (s; a, b) closes iff {a, b} is an edge (canonical form)
    # tri feeds THREE corner-credit branches — unpersisted, the
    # Σ d_out² wedge join (the dominant cost) executed three times
    tri = _materialize(
        wedges.join(
            e.select(F.col("u").alias("a"), F.col("v").alias("b")),
            ["a", "b"],
        ).select("s", "a", "b")
    )
    per_node = (
        tri.select(F.col("s").alias("node"))
        .unionAll(tri.select(F.col("a").alias("node")))
        .unionAll(tri.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node.select("node", F.col("n_triangles").cast("long"))


def markov_stationary(
    df: DataFrame,
    field: str,
    uuid_col: str = UUID_COL,
    time_col: str = TIME_COL,
    *tiebreak: str,
    iters: int = 4,
) -> DataFrame:
    """Stationary distribution of the per-trail transition chain (power
    iteration on the exact ppm lattice) — "where does a random session
    end up": the long-run state mix behind the one-step matrix (q59) and
    the dwell-time view (q219).

    The corpus-scale work is ONE pass — transition_counts' lag window —
    after which everything runs on the lexicon²-bounded edge table:
    ``iters`` fixed rounds of v·P, each a vocabulary-sized join + groupBy
    (no driver loop over data, no collect). All math is integer:
    p_ppm = (1e6·freq) div out_degree, mass flow = (mass·p_ppm) div 1e6,
    dangling states get an explicit 1e6 self-loop so no mass silently
    vanishes. Floor rounding loses ≤1 ppm per (state, round) —
    deterministic, mirrored by the unrolled-CTE oracle (q248)."""
    from .dedup import _materialize

    # counts is the ONLY corpus-scale pass; every downstream table
    # (states, out, trans, dangling) and all ``iters`` loop rounds derive
    # from it, and without a persist boundary each derivation re-ran the
    # full lag-window scan (plan audit: 34 parquet scans / 85 shuffles
    # for one q248 call). counts/states/trans are lexicon²-bounded, so
    # pinning them costs vocabulary, not corpus.
    counts = _materialize(transition_counts(df, field, uuid_col, time_col, *tiebreak))
    states = _materialize(
        counts.select(F.col("src").alias("state"))
        .union(counts.select(F.col("dst").alias("state")))
        .distinct()
    )
    out = counts.groupBy("src").agg(F.sum("freq").alias("out_freq"))
    trans = counts.join(out, "src").select(
        "src", "dst",
        F.expr("(1000000 * freq) div out_freq").cast("long").alias("p_ppm"),
    )
    dangling = (
        states.join(out, states.state == out.src, "left_anti")
        .select(
            F.col("state").alias("src"),
            F.col("state").alias("dst"),
            F.lit(1_000_000).cast("long").alias("p_ppm"),
        )
    )
    trans = _materialize(trans.union(dangling))
    n_states = states.count()
    if n_states == 0:
        raise ValueError("markov_stationary: no transitions in input")
    v = states.select(
        "state",
        F.lit(1_000_000 // n_states).cast("long").alias("mass_ppm"),
    )
    for _ in range(iters):
        flow = (
            v.join(trans, v.state == trans.src)
            .select(
                F.col("dst").alias("state"),
                F.expr("(mass_ppm * p_ppm) div 1000000").cast("long").alias("m"),
            )
            .groupBy("state")
            .agg(F.sum("m").alias("mass_ppm"))
        )
        v = (
            states.join(flow, "state", "left")
            .select(
                "state",
                F.coalesce(F.col("mass_ppm"), F.lit(0).cast("long")).alias("mass_ppm"),
            )
        )
    return v.withColumnRenamed("state", field).select(
        F.col(field), F.col("mass_ppm").alias("stationary_ppm")
    )


def lagged_crosscorr(
    df: DataFrame,
    type_a: str,
    type_b: str,
    max_lag_hours: int = 6,
    type_col: str = "event_type",
    time_col: str = TIME_COL,
) -> DataFrame:
    """Lead/lag structure between two event streams: Pearson
    cross-correlation of their hourly volumes at lags 0..max_lag — "do
    errors foreshadow purchases dropping an hour later". Complements the
    single-series autocorrelation (q155).

    The corpus reduces to the DENSE hourly grid in one aggregation
    (missing hours are real zeros — the grid comes from a sequence over
    [min, max], not from observed buckets); every lag is then an
    integer-shifted self-join of that time-grid-sized table, so the
    per-lag stage costs nothing at any corpus scale. Moment sums stay
    exact int64; only the final normalization touches doubles (exact
    int→double casts, correctly-rounded sqrt/div — bit-stable across
    engines), emitted as corr_micro rounded to an integer."""
    hours = df.filter(F.col(type_col).isin([type_a, type_b])).select(
        F.floor(F.col(time_col).cast("long") / F.lit(3600)).cast("long").alias("h"),
        type_col,
    )
    per = hours.groupBy("h").agg(
        F.sum(F.when(F.col(type_col) == type_a, 1).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col(type_col) == type_b, 1).otherwise(0)).cast("long").alias("y"),
    )
    from .dedup import _materialize

    per = _materialize(per)
    bounds = per.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h")
    )
    # dense feeds BOTH sides of the per-lag shifted self-join, and per
    # feeds the bounds aggregate plus the grid fill — unpersisted, each
    # consumer re-ran the corpus scan+hourly aggregate (plan audit: 4
    # scans for q249). Both are time-grid-sized.
    dense = _materialize(
        grid.join(per, "h", "left")
        .select(
            "h",
            F.coalesce(F.col("x"), F.lit(0).cast("long")).alias("x"),
            F.coalesce(F.col("y"), F.lit(0).cast("long")).alias("y"),
        )
    )
    lags = dense.sparkSession.range(0, max_lag_hours + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    t1 = dense.select(F.col("h").alias("h1"), F.col("x"))
    t2 = dense.select(F.col("h").alias("h2"), F.col("y"))
    joined = (
        t1.crossJoin(F.broadcast(lags))
        .join(t2, F.col("h2") == F.col("h1") + F.col("lag"))
    )
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "lag", "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
    ).withColumn(
        "corr_micro",
        F.when(
            (F.col("den_x") > 0) & (F.col("den_y") > 0),
            F.round(
                F.lit(1_000_000.0) * F.col("num").cast("double")
                / (F.sqrt(F.col("den_x").cast("double"))
                   * F.sqrt(F.col("den_y").cast("double"))),
                0,
            ).cast("long"),
        ),
    ).orderBy("lag")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    keys: tuple[str, ...] = ("event_type",),
    k: int = 64,
) -> DataFrame:
    """Per-key distinct-count estimate from a KMV (k-minimum-values /
    bottom-k) sketch — the third sketch family beside count-min (q93)
    and HLL (q131): unlike HLL it supports set INTERSECTION estimates
    downstream, and its hashes double as a uniform sample of the
    distinct values.

    The sketch is fully deterministic (order statistics of the shared
    md5_60 hash family — no seeds, no partitioning dependence: the
    bottom-k of a union is the merge of per-partition bottom-k's), so
    the whole estimator oracle-checks bit-for-bit. Estimator:
    n < k → exact n; else (k-1)·2^60 // h_k on the HUGEINT lattice.

    Scale shape: a mapInPandas partial pass holds AT MOST k hashes per
    key per task (bounded state, the countmin/MG posture), so the
    exchange carries ≤ k·partitions rows per key — never the distinct
    values themselves. The exact distinct count is emitted alongside
    for calibration at test scale; drop it at 100 TB (it is the only
    full-shuffle column).

    Null keys are first-class: the pandas partials group with
    dropna=False and the final merge join is null-safe, so a null-key
    group estimates exactly like any other (it would otherwise vanish
    — SQL inner joins reject nulls and pandas groupby drops them by
    default, silently and asymmetrically)."""
    from ..functions.core import md5_60

    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2")
    # keys travel as strings through the Arrow partial pass; cast once
    # here so the merge join and the exact side agree on type
    kdf = df.select(
        *[F.col(c).cast("string").alias(c) for c in keys],
        F.col(value_col).alias("__v"),
    )
    key_cols = [F.col(c) for c in keys]
    proj = kdf.select(
        *key_cols, md5_60(F.col("__v").cast("string")).alias("h")
    )

    n_keys = len(keys)

    def partials(batches):
        import numpy as np
        import pandas as pd

        # vectorized bounded state: per key, the sorted distinct bottom-k
        # hashes seen so far (<= k int64s per key per task). Each Arrow
        # batch contributes via one groupby + np.unique — no per-row
        # Python. Merging is bottom-k of a union, so arrival order and
        # batch boundaries cannot change the result.
        state: dict[tuple, "np.ndarray"] = {}
        for pdf in batches:
            # dropna=False: null-key groups must survive the partial
            # pass — the exact side (Spark groupBy) keeps them, and the
            # final join is null-safe, so dropping them here would
            # silently erase null-key rows from the output
            for kt, sub in pdf.groupby(list(keys), sort=False,
                                       dropna=False):
                if not isinstance(kt, tuple):
                    kt = (kt,)
                kt = tuple(
                    None
                    if v is None or (isinstance(v, float) and np.isnan(v))
                    else v
                    for v in kt
                )
                top = np.unique(sub["h"].to_numpy())[:k]
                prev = state.get(kt)
                if prev is not None:
                    top = np.unique(np.concatenate([prev, top]))[:k]
                state[kt] = top
        rows = [kt + (int(hv),) for kt, top in state.items() for hv in top]
        yield pd.DataFrame(
            rows, columns=list(keys) + ["h"]
        ) if rows else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in keys}
            | {"h": pd.Series(dtype="int64")}
        )

    part_schema = ", ".join(
        f"{c} string" for c in keys
    ) + ", h long"
    part = proj.mapInPandas(partials, schema=part_schema)
    merged = part.distinct()
    w = Window.partitionBy(*key_cols).orderBy("h")
    ranked = merged.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__hk")
    )
    exact = kdf.groupBy(*key_cols).agg(
        F.countDistinct("__v").alias("exact_distinct")
    )
    est = F.when(F.col("__n") < k, F.col("__n")).otherwise(
        F.expr(
            f"CAST((CAST({k - 1} AS DECIMAL(38, 0)) * 1152921504606846976)"
            " div __hk AS BIGINT)"
        )
    )
    # null-safe equi-join so null-key groups (kept by BOTH sides above)
    # appear in the output instead of being silently dropped by SQL
    # null-rejecting join semantics
    cond = None
    for c in keys:
        term = agg[c].eqNullSafe(exact[c])
        cond = term if cond is None else cond & term
    return (
        agg.join(exact, cond)
        .select(*[agg[c].alias(c) for c in keys],
                est.cast("long").alias("kmv_estimate"),
                "exact_distinct")
    )
