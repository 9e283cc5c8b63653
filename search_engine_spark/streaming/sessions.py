"""Stateful streaming sessionization via ``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.3); this is the engine's
custom-stateful-operator surface: gap-based sessions (same definition as
the batch operator ``corpus_queries.q_sessionize`` — a new session after
``SESSION_GAP_S`` of per-user silence) computed incrementally over an
unbounded event stream.

Semantics contract with the batch twin (tested in
tests/test_streaming_sessions.py):

- identical arithmetic: event time as int64 epoch microseconds, value
  quantized to int64 micro-units before summation, so a closed session's
  row is bit-identical to the batch operator's row for the same events;
- identical ordering: events sorted by (ts, event_id) within a user;
- ``session_idx`` is the per-user ordinal (1-based) carried in state, so
  it matches the batch cumulative-sum numbering as long as data arrives
  respecting the watermark (later rows are dropped by Spark upstream).

A session CLOSES (is emitted, append mode) when the event-time watermark
passes its last event + gap — via ``GroupStateTimeout.EventTimeTimeout``,
or eagerly when a same-batch later event proves the gap elapsed. When an
``availableNow`` run over a static directory stops, each user's final
open session remains in state and is NOT emitted (exactly the watermarked
append-mode contract windows.py documents); the batch twin computes the
tail.

Scale shape: state is one fixed-size tuple per user key (five int64s) —
no per-event state growth; the shuffle key is user_id (the natural entity
key), and each micro-batch touches only arriving users' groups.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from .. import fsio
from ..operators.corpus_queries import SESSION_GAP_S
from .windows import EVENT_SCHEMA
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "sum_value double, duration_s double"
)
STATE_SCHEMA = (
    "start_us long, last_us long, n_events long, "
    "sum_value_u long, emitted long"
)


def _close(user_id: int, idx: int, start_us: int, last_us: int,
           n: int, sum_u: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_idx": [idx],
            "n_events": [n],
            "sum_value": [sum_u / 1_000_000.0],
            "duration_s": [(last_us - start_us) / 1_000_000.0],
        }
    )


# after a timeout closes a user's session, the per-user session counter
# stays in state this long (so session_idx keeps the batch twin's global
# numbering); a user silent beyond it has the counter dropped — bounded
# state, at the cost of idx restarting for users dormant > retention
COUNTER_RETENTION_US = 30 * 24 * 3600 * 1_000_000


def _session_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, sum_u, emitted = state.get
            if n > 0:
                # close the open session but KEEP the per-user counter —
                # state.remove() here would restart session_idx at 1 for
                # the user's next session (duplicate output keys)
                state.update((0, last_us, 0, 0, emitted + 1))
                state.setTimeoutTimestamp(
                    (last_us + COUNTER_RETENTION_US) // 1000
                )
                yield _close(
                    user_id, emitted + 1, start_us, last_us, n, sum_u
                )
            else:
                # retention elapsed with no new sessions — drop counter
                state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["us", "event_id"], kind="mergesort")

        if state.exists:
            start_us, last_us, n, sum_u, emitted = state.get
        else:
            start_us = last_us = n = sum_u = 0
            emitted = 0

        out = []
        for us, vu in zip(
            batch["us"].astype("int64"), batch["value_u"].astype("int64")
        ):
            us, vu = int(us), int(vu)
            if n == 0:
                start_us, last_us, n, sum_u = us, us, 1, vu
            elif us <= last_us:
                # within-watermark event arriving in a later micro-batch
                # out of order: fold it into the open session without
                # moving last_us backwards (duration = max-min like the
                # batch twin). Events older than the open session's start
                # are approximated into it — exact replay would need
                # buffering until the watermark, which trades unbounded
                # state for a case the watermark already bounds.
                start_us = min(start_us, us)
                n, sum_u = n + 1, sum_u + vu
            elif us - last_us > gap_us:
                out.append(
                    _close(user_id, emitted + 1, start_us, last_us, n, sum_u)
                )
                emitted += 1
                start_us, last_us, n, sum_u = us, us, 1, vu
            else:
                last_us, n, sum_u = us, n + 1, sum_u + vu

        state.update((start_us, last_us, n, sum_u, emitted))
        # close the open session once the watermark passes last event+gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if out:
            yield pd.concat(out, ignore_index=True)

    return fn


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = SESSION_GAP_S,
    watermark: str = "10 seconds",
    max_files_per_trigger: int | None = None,
):
    """Drain event parquet files from ``input_dir`` and append closed
    sessions to ``out_dir`` (trigger availableNow, exactly-once via the
    stream checkpoint)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir)

    # same quantization as the batch twin — int64 micros / micro-units
    prepared = (
        events.withWatermark("ts", watermark)
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn(
            "value_u",
            F.round(F.col("value") * F.lit(1000000.0), 0).cast("long"),
        )
        .select("user_id", "event_id", "us", "value_u", "ts")
    )
    sessions = prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s * 1_000_000),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # touch the output dir even for empty streams so readers don't 404
    fsio.mkdirs(out_dir)
    return q
