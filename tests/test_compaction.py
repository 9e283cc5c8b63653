"""Segment compaction: many log-structured segments merge into one
range-laid segment with ZERO observable change to query results — the
read-side invariant Iceberg-style rewrites must keep. Also covers the
commit protocol: a crash after staging is completed idempotently by the
next run (same redo contract as the build's resume test).
"""

import json

import pytest

from search_engine_spark import fsio
from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig
from search_engine_spark.operators.compaction import (
    _segments,
    compact_index,
)
from search_engine_spark.operators.index_build import build_index, read_manifest
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.operators.wand import wand_topk
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)
from search_engine_spark.streaming.incremental import append_batch, refresh_stats

SF_DIR = "/root/testdata/sf0.001"
QUERIES = ["the government of", "war", '"in the" city']


def _corpus(spark):
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    return corpus_from_transcripts(tx)


def _snapshot(engine):
    out = {}
    for q in QUERIES:
        out[f"search:{q}"] = [
            (r["url"], r["introduction"]) for r in engine.search(q).collect()
        ]
        out[f"bm25:{q}"] = [
            (r["doc_id"], round(r["score"], 9))
            for r in engine.search_bm25(q.replace('"', ""), k=10).collect()
        ]
    out["wand"] = [
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(engine, "government war", k=10).collect()
    ]
    out["count"] = engine.count()
    return out


@pytest.fixture(scope="module")
def multi_seg_index(spark, tmp_path_factory):
    """A 3-batch-segment index plus one streamed append — 4 segments."""
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    idx = str(tmp_path_factory.mktemp("compact_idx") / "index")
    corpus = _corpus(spark).persist()
    head = corpus.filter("turn_idx < 6")
    tail = corpus.filter("turn_idx >= 6")
    build_index(spark, head, idx, config=cfg, segments=3)
    n = append_batch(spark, tail, idx, "stream0", config=cfg)
    assert n > 0
    refresh_stats(spark, idx, config=cfg)
    corpus.unpersist()
    return idx, cfg


def test_compact_preserves_results_and_merges_segments(
    spark, multi_seg_index
):
    idx, cfg = multi_seg_index
    engine = SearchEngine(spark, idx, config=cfg)
    before = _snapshot(engine)
    stats_before = sorted(
        tuple(r) for r in engine.term_stats().collect()
    )
    assert len(_segments(idx, "postings")) == 4

    res = compact_index(spark, idx, config=cfg)
    assert res.compacted and res.label == "c0"
    assert sorted(res.replaced) == sorted(
        ["seg=0", "seg=1", "seg=2", "seg=stream0"]
    )
    for table in ("docs", "term_positions", "postings", "blocks"):
        assert _segments(idx, table) == ["seg=c0"], table
    assert not fsio.exists(f"{idx}/_compact_staging")

    # fresh engine over the compacted index: bit-identical results
    engine2 = SearchEngine(spark, idx, config=cfg)
    assert _snapshot(engine2) == before
    assert sorted(tuple(r) for r in engine2.term_stats().collect()) == (
        stats_before
    )

    entries = [e for e in read_manifest(idx) if e["stage"] == "compact"]
    assert len(entries) == 1 and entries[0]["ok"]
    assert entries[0]["n_postings"] == res.n_postings > 0
    assert entries[0]["bytes_after"] > 0

    # idempotent: single segment -> no-op, no new lineage entry
    res2 = compact_index(spark, idx, config=cfg)
    assert not res2.compacted
    assert len(
        [e for e in read_manifest(idx) if e["stage"] == "compact"]
    ) == 1


def test_compact_if_needed_policy(spark, tmp_path):
    """The streaming-ingest compaction policy: below the segment
    threshold it is a no-op; correctness debts (pending tombstones)
    force a run regardless; above the threshold it compacts."""
    from search_engine_spark.operators.compaction import compact_if_needed
    from search_engine_spark.operators.deletes import (
        delete_docs,
        read_tombstones,
    )

    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    idx = str(tmp_path / "index")
    build_index(spark, _corpus(spark), idx, config=cfg, segments=3)

    # 3 segments <= threshold 4 -> layout is fine, nothing runs
    assert not compact_if_needed(spark, idx, max_segments=4, config=cfg).compacted
    assert len(_segments(idx, "postings")) == 3

    # a pending tombstone is a correctness debt -> runs despite threshold
    victim = SearchEngine(spark, idx, config=cfg).search("window").collect()[0]
    assert delete_docs(spark, idx, urls=[victim["url"]]) == 1
    assert compact_if_needed(spark, idx, max_segments=4, config=cfg).compacted
    assert read_tombstones(spark, idx) is None
    assert len(_segments(idx, "postings")) == 1

    # grow past the threshold -> compacts on count alone
    corpus = _corpus(spark)
    assert append_batch(
        spark, corpus.filter("turn_idx >= 6"), idx, "sA", config=cfg
    ) > 0
    assert not compact_if_needed(spark, idx, max_segments=2, config=cfg).compacted
    assert append_batch(
        spark, corpus.filter("turn_idx = 5"), idx, "sB", config=cfg
    ) > 0
    assert len(_segments(idx, "postings")) == 3
    assert compact_if_needed(spark, idx, max_segments=2, config=cfg).compacted
    assert len(_segments(idx, "postings")) == 1


def test_compact_crash_after_staging_resumes(spark, tmp_path):
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    idx = str(tmp_path / "index")
    build_index(spark, _corpus(spark), idx, config=cfg, segments=3)
    engine = SearchEngine(spark, idx, config=cfg)
    before = _snapshot(engine)

    with pytest.raises(RuntimeError, match="injected failure"):
        compact_index(spark, idx, config=cfg, fail_after_staging=True)
    # marker exists; live segments untouched (crash hit the window
    # BEFORE any swap step)
    marker = json.loads(
        fsio.read_text(f"{idx}/_compact_staging/_STAGED.json")
    )
    assert marker["label"] == "c0"
    assert len(_segments(idx, "postings")) == 3

    # rerun completes the swap from the marker without restaging
    res = compact_index(spark, idx, config=cfg)
    assert res.compacted and res.label == "c0"
    assert _segments(idx, "postings") == ["seg=c0"]
    engine2 = SearchEngine(spark, idx, config=cfg)
    assert _snapshot(engine2) == before
