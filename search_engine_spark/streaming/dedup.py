"""Watermarked streaming deduplication (exactly-once ingest guard).

The reference has no streaming (SURVEY.md §2.3); this is the engine's
idempotent-ingest surface: an at-least-once event feed (redeliveries,
replayed files) drained through ``dropDuplicatesWithinWatermark`` so the
sink sees each ``event_id`` once. The batch twin is a plain
``dropDuplicates`` over the same key — stream ≡ batch is a test, not a
hope (tests/test_streaming_dedup.py).

Why ``dropDuplicatesWithinWatermark`` and not ``dropDuplicates``: in a
continuous stream, plain dropDuplicates keeps EVERY key seen forever —
unbounded state. The watermarked variant expires a key's state once the
watermark passes its event time plus the delay, which bounds state to
the duplicate-arrival horizon (how late a redelivery can be) instead of
the stream's lifetime — the only formulation that survives a 10^12-event
feed. A duplicate arriving later than the watermark delay is forwarded,
not dropped: size the delay to the delivery system's replay window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import fsio
from .windows import EVENT_SCHEMA


def dedup_events(events: DataFrame) -> DataFrame:
    """Shared batch twin: one row per event_id (arbitrary-but-single
    survivor; columns are identical across duplicates by construction in
    an at-least-once feed, so survivor choice is immaterial)."""
    return events.dropDuplicates(["event_id"])


def stream_dedup_events(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain event parquet files through watermarked dedup into a parquet
    sink. ``trigger(availableNow)`` processes the backlog then stops; on
    a live cluster the same query runs continuously, with the checkpoint
    giving exactly-once sink semantics on top of the in-stream dedup."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir).withWatermark("ts", watermark)
    deduped = events.dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fsio.mkdirs(out_dir)
