"""Watermarked windowed streaming agg ≡ batch agg on finalized windows.

Append-mode semantics: a window is written once the watermark passes its
end; the trailing window(s) stay in state when the availableNow stream
stops. The test therefore asserts (a) every emitted row exactly matches
the batch result, and (b) every window that must have been finalized
(end <= max_ts - watermark) was emitted.
"""

import sys
from datetime import timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.streaming.windows import (  # noqa: E402
    stream_windowed_counts,
    windowed_agg,
)

SF_DIR = "/root/testdata/sf0.001"
WATERMARK = timedelta(hours=2)


def test_stream_windowed_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # feed the stream in time-ranged files (roughly monotone event time,
    # unordered within each file — late-ish data inside the watermark).
    # Splitting by a non-time key instead would make whole key groups
    # arrive past the global watermark and be dropped — correct append
    # semantics, but not what this equivalence test is about.
    in_dir = str(tmp_path / "in")
    events.repartitionByRange(4, "ts").write.parquet(in_dir)
    # FileStreamSource orders files by MODIFICATION TIME, and the four
    # part files share one — stamp ascending mtimes so micro-batches
    # follow event-time order (a real feed's files arrive over time)
    import glob
    import os
    import time as _time

    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{in_dir}/part-*"))):
        os.utime(f, (now + i, now + i))

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_windowed_counts(
        spark, in_dir, out_dir, ckpt, window="1 day", watermark="2 hours",
        max_files_per_trigger=1,
    )

    batch = {
        (r["window_start"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["avg_k"]
        )
        for r in windowed_agg(events).collect()
    }
    try:
        streamed_rows = spark.read.parquet(out_dir).collect()
    except Exception:
        streamed_rows = []
    streamed = {
        (r["window_start"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["avg_k"]
        )
        for r in streamed_rows
    }

    # (a) everything emitted is exactly the batch answer
    for key, vals in streamed.items():
        assert batch[key] == vals, key

    # (b) all provably-finalized windows were emitted
    max_ts = events.agg(F.max("ts")).first()[0]
    cutoff = max_ts - WATERMARK
    must_emit = {
        k for k in batch if (k[0] + timedelta(days=1)) <= cutoff
    }
    missing = must_emit - set(streamed)
    assert not missing, sorted(missing)[:5]
    assert len(streamed) >= len(must_emit) > 0
