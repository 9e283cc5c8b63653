"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no streaming (SURVEY.md §2.3) — this is the engine's
Structured-Streaming surface for event analytics at scale: readStream →
withWatermark → window agg → append-mode sink. The aggregation expression
is shared with the batch operator (corpus_queries.q_events_windowed), so
batch ≡ stream equivalence is a test, not a hope.

Late data: the watermark bounds state — windows older than
(max event time - delay) are finalized and emitted; later-arriving rows
for them are dropped, exactly Spark's documented append-mode semantics.
NOTE: when an ``availableNow`` run over a static directory stops, the
trailing window(s) whose end exceeds (max event time - delay) remain in
state and are NOT written — by design. Consumers needing those rows run
the query again after more data arrives (advancing the watermark) or
compute the tail with the batch twin
(corpus_queries.q_events_windowed); the equivalence test asserts exactly
the finalized-window contract.
"""

from __future__ import annotations

import os

from .. import fsio
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_agg(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Shared batch/stream aggregation: tumbling event-time windows per
    event_type with count / sum(value) / avg(json props.k)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("double")), 6
            ).alias("avg_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_k",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain event parquet files through a watermarked windowed aggregation
    into a parquet sink (append mode — only finalized windows are written).
    ``trigger(availableNow)`` processes the backlog then stops; on a live
    cluster the same query runs continuously with exactly-once sink
    semantics via the checkpoint."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir).withWatermark("ts", watermark)
    agg = windowed_agg(events, window=window)
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # touch the output dir even for empty streams so readers don't 404
    fsio.mkdirs(out_dir)
