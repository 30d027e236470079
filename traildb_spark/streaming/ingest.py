"""Streaming ingest: continuous finalize + exact streaming dedup.

The reference's deployment model is a cron loop — "producers encode new
TrailDBs at regular intervals, e.g. daily" (doc/docs/index.md:43-45).
These operators replace that loop with Structured Streaming while landing
data in the SAME finalized layout batch queries already prune:

* ``streaming_dedup_exact`` — drop exact duplicate documents as they
  arrive, with state bounded by the watermark (the only dedup formulation
  that survives an unbounded stream).
* ``streaming_finalize`` — sink a stream into the ``TrailDataset``
  finalize layout (uuid-clustered, time-sorted, optional time shards), one
  micro-batch at a time, exactly-once via checkpointed ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dataset import TrailDataset
from ..operators.text import fingerprint


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_time",
    watermark: str = "1 hour",
    keep_fingerprint: bool = False,
) -> DataFrame:
    """Exact streaming deduplication on a content fingerprint.

    ``dropDuplicatesWithinWatermark`` keeps one state row per DISTINCT
    fingerprint and evicts it once it ages past the watermark, so state is
    bounded by (arrival rate × watermark), never by corpus size — at
    100 TB/day an unbounded ``dropDuplicates`` state would OOM the state
    store. Duplicates that arrive farther apart than the watermark are the
    batch layer's job: run ``dedup.exact_duplicates`` over the finalized
    shards (the standard streaming/batch split, and exactly the cadence at
    which the reference re-encodes its daily tdbs).

    Only the 32-char md5 fingerprint enters the dedup state/shuffle —
    never the document text.
    """
    out = stream.withColumn("content_hash", fingerprint(F.col(text_col)))
    out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return out if keep_fingerprint else out.drop("content_hash")


def streaming_finalize(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    time_shard: str | None = None,
    num_buckets: int | None = None,
):
    """Continuously land a normalized event stream in the finalize layout.

    Each micro-batch is clustered by uuid, sorted (uuid, time) within
    files, and appended — with ``time_shard`` set, batches fan into Hive
    partitions (e.g. one per day) and the ``_traildb_meta.json`` sidecar
    makes time-range filters prune shards on read, identically to a
    batch-finalized dataset. Clustering is per-micro-batch (a stream cannot
    globally sort history); readers still get row-group pruning within
    every file, and the daily batch re-finalize compacts a closed shard to
    the fully clustered form — mirroring the reference's immutable daily
    re-encode.

    Exactly-once: ``foreachBatch`` + the checkpoint guarantee each batch id
    commits once; ``num_buckets`` caps files per batch (default 1 — at
    local/daily scale small batches should not spray one file per core).

    Returns the started ``StreamingQuery``.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        TrailDataset(batch_df).finalize(
            path,
            num_buckets=num_buckets or 1,
            time_shard=time_shard,
            mode="append",
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
