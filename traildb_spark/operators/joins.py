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
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    lbin = (F.col(left_time).cast("long") / bin_size).cast("long")
    rbins = F.sequence(
        (F.col(start_col).cast("long") / bin_size).cast("long"),
        ((F.col(end_col).cast("long") - 1) / bin_size).cast("long"),
    )
    l = left.withColumn("__bin", lbin)
    # drop empty/inverted intervals BEFORE binning: they match nothing by
    # the predicate, but F.sequence(start_bin, end_bin) with start > stop
    # counts DOWN — one zeroed/sentinel end would explode into millions of
    # candidate bins instead of zero
    r = right.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bin", F.explode(rbins)
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
) -> DataFrame:
    """As-of (nearest-timestamp) left join: for every left row, attach the
    right row with the greatest ``right_time`` <= ``left_time`` within the
    same key group (``direction='backward'``, inclusive), or the smallest
    ``right_time`` >= ``left_time`` (``'forward'``).

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

    r = right.select(
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
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    out = [*[F.col(c) for c in keys]]
    out += [F.col(f"__l.{c}").alias(c) for c in l_payload]
    for c in r_payload:
        name = c if c not in left.columns else c + suffix
        out.append(F.col(f"__m.{c}").alias(name))
    return matched.select(*out)
