"""Structured Streaming ingest + sessionization (optional extension).

The reference is strictly immutable batch ("producers encode new TrailDBs
at regular intervals", doc/docs/index.md:43-45); SURVEY §2.9 maps its
streaming-shaped idioms here: time-ordered per-key event streams and the
30-minute session-gap rule (examples/tutorial_wikipedia_sessions.c:8).

Batch parity lives in operators/trails.py; this module provides the
streaming analogs: ``session_window`` aggregation with watermarks for late
data, and an ``applyInPandasWithState``-style custom stateful hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_events(spark, path: str, schema) -> DataFrame:
    """File-source stream over an events directory (the reference's
    "new tdb per day" pattern as a stream of arriving parquet files)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_session_counts(
    events: DataFrame,
    gap_seconds: int = 1800,
    uuid_col: str = "uuid",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-trail session aggregation with a dynamic session window.

    ``F.session_window`` closes a session after ``gap_seconds`` of
    inactivity — exactly the tutorial's 30-minute rule — and the watermark
    bounds state for late data. Output: one row per (uuid, session) with
    event count and bounds; append-mode sink-ready.
    """
    gap = f"{gap_seconds} seconds"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(uuid_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            uuid_col,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "num_events",
            "session_start",
            "session_end",
        )
    )


def stateful_trail_counts(
    events: DataFrame,
    uuid_col: str = "uuid",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful per-trail operator via applyInPandasWithState:
    maintains a running (count, min_ts, max_ts) per uuid across micro-
    batches — the streaming analog of a persistent trail cursor position.

    State is one tuple per uuid (bounded by trail count, not event count);
    timeout follows the watermark so idle trails age out of the store.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{uuid_col} string, n_events long, first_seen timestamp, last_seen timestamp"
    )
    state_schema = "n long, first_us long, last_us long"

    def update(key, pdfs, state):
        import pandas as pd

        n, first_us, last_us = state.get() if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:  # empty chunk: min()/max() would be NaT
                continue
            ts = pd.to_datetime(pdf[ts_col])
            n += len(pdf)
            lo = int(ts.min().value // 1000)
            hi = int(ts.max().value // 1000)
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        yield pd.DataFrame(
            {
                uuid_col: [key[0]],
                "n_events": [n],
                "first_seen": [pd.Timestamp(first_us, unit="us")],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(uuid_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_batch_equivalence(spark, batch_df: DataFrame, gap_seconds: int = 1800):
    """Batch-mode evaluation of the streaming query (session_window works
    in batch too) — used by tests to prove stream/batch parity against the
    window-function formulation in operators/trails.py."""
    return streaming_session_counts(
        batch_df, gap_seconds, ts_col="event_time", watermark="0 seconds"
    )


def streaming_funnel(
    events: DataFrame,
    step_values: list[str],
    field: str = "event_type",
    uuid_col: str = "uuid",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
    within: int | None = None,
) -> DataFrame:
    """Streaming analog of ``analytics.funnel_times``: per-trail latched
    step timestamps maintained in state across micro-batches (state = k
    longs per uuid — bounded by trail count). Each batch replays the same
    latch rule as the batch fold: step i fires on the first event equal to
    ``step_values[i]`` strictly after step i-1 (and within the conversion
    window if set).

    Parity contract: equals the batch funnel when events arrive
    time-ordered per trail (the reference's model — trails are stored
    time-ordered; the tests prove equality under availableNow). A
    late-arriving earlier event can't un-latch a step — batch mode is the
    replayable source of truth, as with the reference's immutable daily
    re-encode.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(step_values)
    if k == 0:
        raise ValueError("funnel needs at least one step value")
    out_schema = f"{uuid_col} string, " + ", ".join(f"s{i} long" for i in range(k))
    state_schema = ", ".join(f"s{i} long" for i in range(k))

    def update(key, pdfs, state):
        times = list(state.get()) if state.exists else [-1] * k
        # concat BEFORE sorting: the group arrives as multiple Arrow
        # chunks in shuffle (not time) order; sorting each chunk alone
        # would replay a big trail's events out of order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(ts_col)
            secs = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000_000
            for t, v in zip(secs, pdf[field]):
                t = int(t)
                # at most one step can latch per event (strict > rules out
                # chaining two steps on one timestamp)
                for i in range(k):
                    if times[i] >= 0:
                        continue
                    ok = v == step_values[i] and (
                        i == 0
                        or (
                            times[i - 1] >= 0
                            and t > times[i - 1]
                            and (within is None or t <= times[i - 1] + within)
                        )
                    )
                    if ok:
                        times[i] = t
                    break
        state.update(tuple(times))
        yield pd.DataFrame(
            {
                uuid_col: [key[0]],
                **{f"s{i}": [times[i] if times[i] >= 0 else None] for i in range(k)},
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(uuid_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_attribution(
    events: DataFrame,
    conversion: str,
    touches: list[str],
    lookback: int | None = None,
    field: str = "event_type",
    uuid_col: str = "uuid",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming analog of ``analytics.attribution`` (last-touch): per
    trail the state is TWO longs — the last touch's time and its index in
    ``touches`` — updated per micro-batch; each conversion emits one
    attribution row ``(uuid, conv_time, channel)`` immediately.

    Parity contract (same as ``streaming_funnel``): equals the batch
    operator when events arrive time-ordered per trail; a late-arriving
    touch can't retroactively re-attribute an already-emitted conversion
    — the batch operator over the finalized store is the replayable
    source of truth. State is bounded by trail count (16 bytes each),
    never by event count.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    touch_idx = {v: i for i, v in enumerate(touches)}

    def update(key, pdfs, state):
        last_t, last_i = state.get() if state.exists else (-1, -1)
        out_t, out_ch = [], []
        # concat BEFORE sorting — chunks arrive in shuffle order, not
        # time order (same contract note as streaming_funnel)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(ts_col)
            secs = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000_000
            for t, v in zip(secs, pdf[field]):
                t = int(t)
                if v == conversion:
                    ch = "(none)"
                    if last_i >= 0 and (lookback is None or last_t >= t - lookback):
                        ch = touches[last_i]
                    out_t.append(t)
                    out_ch.append(ch)
                # a row that is BOTH touch and conversion touches after
                # converting — matches the batch strict-prefix window
                i = touch_idx.get(v)
                if i is not None:
                    last_t, last_i = t, i
        state.update((last_t, last_i))
        yield pd.DataFrame(
            {
                uuid_col: [key[0]] * len(out_t),
                "conv_time": out_t,
                "channel": out_ch,
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(uuid_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{uuid_col} string, conv_time long, channel string",
            stateStructType="last_t long, last_i long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_touch_conversion_join(
    touches: DataFrame,
    conversions: DataFrame,
    lookback: int = 86400,
    uuid_col: str = "uuid",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
    channel_col: str = "event_type",
    id_col: str | None = None,
) -> DataFrame:
    """Stream-stream interval join: every (touch, conversion) pair of the
    same trail where the touch precedes the conversion by at most
    ``lookback`` seconds — the joined-pairs primitive under
    ``attribution_linear``, as two live streams. The watermark bounds the
    join state on BOTH sides (Spark evicts buffered rows once they can no
    longer match any future row given the time-range condition), so state
    is (arrival rate × (lookback + watermark)), never stream length —
    the only interval-join formulation that survives an unbounded stream.

    Emits ``(uuid, touch_time, conv_time, channel)`` with the channel
    read from ``channel_col``. Parity contract vs the batch pairing
    (``attribution_linear``'s join): the batch join also admits
    EQUAL-timestamp pairs whose touch has the smaller event id
    (``tt == ct AND tid < cid``). Pass ``id_col`` (present on both input
    streams) to reproduce that tiebreak exactly; with ``id_col=None``
    the stream join is strictly ``touch_ts < conv_ts`` and equal-
    timestamp pairs are omitted — a documented divergence. Late rows
    beyond the watermark drop — the batch operator over finalized
    storage remains the replayable truth.
    """
    t_cols = [
        F.col(uuid_col).alias("t_uuid"),
        F.col(ts_col).alias("touch_ts"),
        F.col(channel_col).alias("channel"),
    ]
    c_cols = [
        F.col(uuid_col).alias(uuid_col),
        F.col(ts_col).alias("conv_ts"),
    ]
    if id_col is not None:
        t_cols.append(F.col(id_col).alias("t_id"))
        c_cols.append(F.col(id_col).alias("c_id"))
    t = touches.withWatermark(ts_col, watermark).select(*t_cols)
    c = conversions.withWatermark(ts_col, watermark).select(*c_cols)
    order = F.col("touch_ts") < F.col("conv_ts")
    if id_col is not None:
        # the batch tiebreak; the non-strict <= keeps the condition a
        # closed time range so state eviction still bounds both sides
        order = (F.col("touch_ts") <= F.col("conv_ts")) & (
            order | (F.col("t_id") < F.col("c_id"))
        )
    joined = c.join(
        t,
        (F.col(uuid_col) == F.col("t_uuid"))
        & order
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback)} SECONDS")),
    )
    return joined.select(
        uuid_col,
        F.unix_timestamp("touch_ts").alias("touch_time"),
        F.unix_timestamp("conv_ts").alias("conv_time"),
        "channel",
    )
