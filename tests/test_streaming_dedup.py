"""Watermarked streaming dedup ≡ batch dropDuplicates on an
at-least-once feed.

The input replays whole files (the common at-least-once failure mode:
a source re-delivers a batch after a crash). Duplicates arrive within
the watermark delay, so the stream must emit each event_id exactly once
and the surviving row set must equal the batch twin's.
"""

import glob
import os
import sys
import time as _time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.streaming.dedup import (  # noqa: E402
    dedup_events,
    stream_dedup_events,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dedup_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    in_dir = str(tmp_path / "in")
    # time-ranged files (monotone-ish event time), then REPLAY file 2 —
    # an at-least-once redelivery inside the watermark horizon
    events.repartitionByRange(4, "ts").write.parquet(in_dir)
    parts = sorted(glob.glob(f"{in_dir}/part-*"))
    replay = str(tmp_path / "in" / "replay-dup.parquet")
    import shutil

    shutil.copy(parts[2], replay)
    # ascending mtimes: files 0,1,2, replay-of-2, 3 — the duplicate
    # arrives one micro-batch after the original, well within watermark
    order = parts[:3] + [replay] + parts[3:]
    now = _time.time()
    for i, f in enumerate(order):
        os.utime(f, (now + i, now + i))

    out_dir = str(tmp_path / "out")
    stream_dedup_events(
        spark, in_dir, out_dir, str(tmp_path / "ckpt"),
        watermark="2 hours", max_files_per_trigger=1,
    )

    got = spark.read.parquet(out_dir)
    batch = dedup_events(events)

    # exactly-once: no event_id appears twice in the sink
    assert got.count() == got.select("event_id").distinct().count()
    # stream row set == batch row set (full rows, not just ids)
    cols = sorted(got.columns)
    assert sorted(got.columns) == sorted(batch.columns)
    s_rows = sorted(
        [tuple(r[c] for c in cols) for r in got.collect()]
    )
    b_rows = sorted(
        [tuple(r[c] for c in cols) for r in batch.collect()]
    )
    assert s_rows == b_rows


def test_stream_dedup_resume_is_exactly_once(spark, tmp_path):
    """Re-running the drained query over the same directory (same
    checkpoint) must add NO new rows — checkpoint + dedup state make the
    ingest idempotent end-to-end."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path / "in")
    events.repartitionByRange(2, "ts").write.parquet(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_dedup_events(spark, in_dir, out_dir, ckpt, watermark="2 hours")
    n1 = spark.read.parquet(out_dir).count()
    stream_dedup_events(spark, in_dir, out_dir, ckpt, watermark="2 hours")
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2 == events.count()
