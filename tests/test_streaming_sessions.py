"""Stateful streaming sessionization (applyInPandasWithState) must agree
with the batch operator q_sessionize on every session it closes."""

import shutil

from search_engine_spark.operators.corpus_queries import q_sessionize
from search_engine_spark.streaming.sessions import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def _by_key(rows):
    return {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["sum_value"],
            r["duration_s"],
        )
        for r in rows
    }


def test_stream_sessions_match_batch(spark, tmp_path):
    inp = tmp_path / "events_in"
    inp.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", inp / "events.parquet")

    out = str(tmp_path / "sessions_out")
    sessionize_stream(
        spark, str(inp), out, str(tmp_path / "ckpt"),
    )
    streamed = _by_key(spark.read.parquet(out).collect())

    batch = _by_key(q_sessionize(spark, SF_DIR).collect())
    last_per_user = {}
    for (u, idx) in batch:
        last_per_user[u] = max(last_per_user.get(u, 0), idx)

    # every streamed (closed) session is bit-identical to its batch twin
    assert streamed, "stream closed no sessions"
    for key, vals in streamed.items():
        assert key in batch, f"stream emitted unknown session {key}"
        assert vals == batch[key], (key, vals, batch[key])

    # the stream may only be missing tail sessions the watermark could
    # not close (at most each user's final session)
    missing = set(batch) - set(streamed)
    assert all(idx == last_per_user[u] for u, idx in missing), missing
    # and it must have closed everything the watermark passed: all
    # non-final sessions are present
    non_final = {
        (u, i) for (u, i) in batch if i != last_per_user[u]
    }
    assert non_final <= set(streamed)


def test_multi_batch_keeps_session_numbering(spark, tmp_path):
    """Events split across micro-batches: sessions closed by event-time
    timeout in a later batch must continue the per-user session_idx (the
    counter survives the close), and rows stay identical to batch."""
    import pyspark.sql.functions as F

    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    med = src.agg(F.percentile(us, F.lit(0.5)).alias("m")).first()["m"]
    inp = tmp_path / "events_in"
    inp.mkdir()
    for i, cond in enumerate([us <= med, us > med]):
        stage = tmp_path / f"stage{i}"
        src.filter(cond).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.copy(part, inp / f"part{i}.parquet")
    out = str(tmp_path / "sessions_out")
    sessionize_stream(
        spark, str(inp), out, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    streamed = _by_key(spark.read.parquet(out).collect())
    batch = _by_key(q_sessionize(spark, SF_DIR).collect())

    assert streamed
    # no duplicate keys with diverging values, and every closed session
    # is bit-identical to its batch twin (catches idx restarts)
    for key, vals in streamed.items():
        assert key in batch, f"unknown/duplicated session {key}"
        assert vals == batch[key], (key, vals, batch[key])
    last_per_user = {}
    for (u, idx) in batch:
        last_per_user[u] = max(last_per_user.get(u, 0), idx)
    missing = set(batch) - set(streamed)
    assert all(idx == last_per_user[u] for u, idx in missing), missing
