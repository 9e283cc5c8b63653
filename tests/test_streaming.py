"""Structured Streaming incremental ingest: streamed segments must answer
queries identically (by url + BM25 score) to a batch-built index over the
same corpus, and the file-source checkpoint must make a second drain a
no-op."""

from pyspark.sql import functions as F

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig
from search_engine_spark.operators.index_build import build_index, read_manifest
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)
from search_engine_spark.streaming.incremental import stream_build

SF_DIR = "/root/testdata/sf0.001"
CFG = EngineConfig(stop_words=DEMO_STOP_WORDS)


def scored_by_url(engine, query, k=20):
    df = engine.search_bm25(query, k=k)
    docs = engine.docs.select("doc_id", "url")
    rows = df.join(docs, "doc_id").select("url", "score").collect()
    return sorted((r["url"], round(r["score"], 6)) for r in rows)


def test_stream_matches_batch(spark, tmp_path):
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")

    # batch-built oracle index
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, corpus_from_transcripts(tx), batch_dir, config=CFG,
                segments=2)

    # feed the same turns as two file drops
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    half = tx.filter(F.col("turn_idx") < 4)
    other = tx.subtract(half)
    half.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "drop1"))
    other.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "drop2"))

    stream_dir = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    stream_build(
        spark, f"{in_dir}/*/", stream_dir, ckpt, config=CFG,
        max_files_per_trigger=1,
    )

    streamed = SearchEngine(spark, stream_dir, config=CFG)
    batch = SearchEngine(spark, batch_dir, config=CFG)
    assert streamed.count() == batch.count() == 500

    for q in ["filter join window", "table scan", "merge"]:
        assert scored_by_url(streamed, q) == scored_by_url(batch, q), q

    # draining again is a no-op (file-source checkpoint = exactly once)
    n_before = len(read_manifest(stream_dir))
    stream_build(
        spark, f"{in_dir}/*/", stream_dir, ckpt, config=CFG, refresh=False
    )
    m = read_manifest(stream_dir)
    assert (
        len([e for e in m if e["stage"] == "stream_batch"])
        == len(
            [
                e
                for e in m[: n_before]
                if e["stage"] == "stream_batch"
            ]
        )
    )
    assert streamed.count() == 500
