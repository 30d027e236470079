"""Relational join operators beyond the reference surface.

The reference joins only on uuid (SURVEY §2.4: union/merge, whitelist
semi-join); everything here is the Spark-native extension a query engine
needs — most notably the as-of join, which Spark lacks as a built-in.

Reference parity note: uuid-stitching/k-way merge live in
``operators.trails`` (J1/J7); ``TrailDataset.merge`` covers J3-J6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str = "time",
    start_col: str = "start",
    end_col: str = "end",
    on: str | list[str] | None = None,
    bin_size: int = 3600,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Interval join: every (left row, right row) pair where
    ``start <= left_time < end`` (and optional equi-keys match).

    Spark plans a bare inequality join as BroadcastNestedLoopJoin —
    O(|L|·|R|) and driver-memory-bound. This operator bins time instead:
    right intervals replicate to each ``bin_size`` bucket they overlap,
    left rows take their single bucket, the join runs as a plain hash
    equi-join on (keys..., bin), and the exact interval predicate
    re-checks candidates. Shuffle volume = |L| + |R|·(avg interval /
    bin_size); pick bin_size near the median interval length.

    Column-collision contract: ``left_time``/``start_col``/``end_col``
    must be three DISTINCT names and the two frames must share no other
    column besides the equi-keys — rename before joining otherwise (the
    post-join exact predicate references the columns by bare name).
    ``max_bins_per_interval`` is the explosion guard: an interval wider
    than ``bin_size × max_bins`` (open-ended sentinel ends are the usual
    culprit) fails FAST with guidance instead of exploding 70M bin rows
    into the shuffle — clamp sentinel ends or raise bin_size.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared or len({left_time, start_col, end_col}) != 3:
        raise ValueError(
            f"range_join: ambiguous columns {sorted(shared)} — rename the "
            "non-key columns shared by both sides before joining"
        )
    lbin = (F.col(left_time).cast("long") / bin_size).cast("long")
    start_bin = (F.col(start_col).cast("long") / bin_size).cast("long")
    end_bin = ((F.col(end_col).cast("long") - 1) / bin_size).cast("long")
    l = left.withColumn("__bin", lbin)
    # drop empty/inverted intervals BEFORE binning: they match nothing by
    # the predicate, but F.sequence(start_bin, end_bin) with start > stop
    # counts DOWN — one zeroed/sentinel end would explode into millions of
    # candidate bins instead of zero
    # the guard must sit INSIDE the evaluated expression (a dropped
    # side-column would be pruned by Catalyst and never run): the
    # sequence's upper bound itself raises when the interval is too wide
    end_bin_checked = F.when(
        end_bin - start_bin < F.lit(int(max_bins_per_interval)), end_bin
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join: interval spans more than "
                    f"{max_bins_per_interval} bins of {bin_size}s — clamp "
                    "sentinel end values or raise bin_size (interval start="
                ),
                F.col(start_col).cast("string"),
                F.lit(" end="),
                F.col(end_col).cast("string"),
                F.lit(")"),
            )
        ).cast("long")
    )
    r = right.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bin", F.explode(F.sequence(start_bin, end_bin_checked))
    )
    joined = l.join(r, [*keys, "__bin"]).filter(
        (F.col(start_col) <= F.col(left_time)) & (F.col(left_time) < F.col(end_col))
    )
    return joined.drop("__bin")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "time",
    right_time: str = "time",
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of (nearest-timestamp) left join: for every left row, attach the
    right row with the greatest ``right_time`` <= ``left_time`` within the
    same key group (``direction='backward'``, inclusive), or the smallest
    ``right_time`` >= ``left_time`` (``'forward'``). ``tolerance``
    bounds the match age (pandas ``merge_asof(tolerance=...)``
    semantics, inclusive): a match farther than ``tolerance`` time
    units from the left row comes back NULL — a quote from last month
    is not "the prevailing quote". Differentially tested against
    pandas merge_asof.

    100 TB-safe plan: a UNION of both sides followed by ONE hash shuffle on
    the key and a running ``last(..., ignorenulls)`` window — the classic
    merge-scan formulation. No range join, no per-key explosion; cost is
    O((|L|+|R|) log partition) like any sort-based window. Time columns must
    be numeric (cast dates to epoch seconds first).

    Determinism contract: the right side must be unique per
    (key, right_time) — pre-aggregate if not (same contract as DuckDB's
    ASOF JOIN, which this operator is differentially tested against).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward': {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")
    sign = 1 if direction == "backward" else -1
    r_payload = [c for c in right.columns if c not in keys]
    l_payload = [c for c in left.columns if c not in keys]

    # ordering key dtype: integral inputs stay long (exact for the full
    # int64 range, e.g. nanosecond epochs); any fractional input promotes
    # BOTH sides to double — truncating 10.7 to 10 would let a future
    # right row match a left row at 10.5, silently violating the as-of
    # contract. (Mixed long/double above 2^53 loses precision; pre-scale
    # to a common integer unit in that case.)
    integral = {"tinyint", "smallint", "int", "bigint", "long"}
    t_type = (
        "long"
        if dict(left.dtypes)[left_time] in integral
        and dict(right.dtypes)[right_time] in integral
        else "double"
    )

    # a NULL right_time row would sort FIRST (nulls-first ascending) with
    # a non-null payload struct, and last(ignorenulls) would attach it to
    # every left row as a bogus "most recent" match — drop such rows (no
    # timestamp = can never be an as-of match)
    r = right.filter(F.col(right_time).isNotNull()).select(
        *[F.col(c) for c in keys],
        (F.col(right_time).cast(t_type) * sign).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    l = left.select(
        *[F.col(c) for c in keys],
        (F.col(left_time).cast(t_type) * sign).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in l_payload]).alias("__l"),
    )
    u = l.unionByName(
        r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    )
    # right rows sort before left rows at equal __t (side 0 < 1), making the
    # equal-timestamp match inclusive in both directions
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "__m",
        F.last(
            F.when(F.col("__side") == 0, F.struct(F.col("__t").alias("__mt"), F.col("__r").alias("__rv"))),
            ignorenulls=True,
        ).over(w),
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        # __t carries the direction sign, so (left __t - match __t) >= 0
        # is the match age in both directions
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__t") - F.col("__m.__mt") <= F.lit(tolerance), F.col("__m")
            ),
        )
    out = [*[F.col(c) for c in keys]]
    out += [F.col(f"__l.{c}").alias(c) for c in l_payload]
    for c in r_payload:
        name = c if c not in left.columns else c + suffix
        out.append(F.col(f"__m.__rv.{c}").alias(name))
    return matched.select(*out)


def join_skew_report(
    a: DataFrame, b: DataFrame, key: str, top_k: int = 20
) -> DataFrame:
    """Pre-flight skew diagnostic for a planned equi-join: the keys that
    would dominate the shuffle, with per-side counts and the EXACT row
    fan-out (``cnt_a * cnt_b``) each key materializes — the number that
    tells an operator whether to salt, broadcast, or cap before running
    the real join at 100 TB. The 100 TB engineering answer in data form:
    run this first, read the top row, pick the strategy.

    Both sides aggregate to key-cardinality-sized count tables first
    (map-side combined) and join key-on-key — the report NEVER performs
    the join it diagnoses. The top-k goes through the salted two-phase
    `curation.top_k_global` under the total order (fanout desc, key asc)
    — the count table is key-cardinality-sized, NOT metadata-sized, so
    no single reducer may ever rank all of it;
    the fan-out product is decimal-guarded and NULL-safe (NULL keys
    never match in an equi-join, so they are excluded — a separate
    null_count diagnostic would be a different question).

    Returns ``(key, cnt_a, cnt_b, fanout)``, at most ``top_k`` rows.
    """
    if top_k < 1:
        raise ValueError(f"join_skew_report: top_k must be >= 1, got {top_k}")
    ca = (
        a.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    cb = (
        b.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    dec = "decimal(38,0)"
    joined = ca.join(cb, "key").select(
        "key",
        "cnt_a",
        "cnt_b",
        (F.col("cnt_a").cast(dec) * F.col("cnt_b").cast(dec)).alias("__f"),
    )
    i64 = F.lit(2**63 - 1).cast(dec)
    # key cardinality is NOT metadata-scale at 100 TB: rank via the
    # salted two-phase top-k (no single reducer sees the count table)
    from .curation import top_k_global

    top = top_k_global(
        joined, [F.desc("__f"), F.asc("key")], top_k, salt_col="key"
    )
    return (
        top.select(
            "key",
            "cnt_a",
            "cnt_b",
            F.when(
                F.assert_true(
                    F.col("__f") <= i64, "join_skew_report: fanout overflows int64"
                ).isNull(),
                F.col("__f").cast("long"),
            ).alias("fanout"),
        )
    )
