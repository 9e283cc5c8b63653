"""Serve-while-ingest for the serving tier: an open LocalIndexReader is
a SNAPSHOT (keeps answering from the state it opened, untouched by
concurrent appends/deletes), ``is_stale()`` notices every mutation path
(segment append, stats refresh, tombstones, forced), and ``refresh()``
swaps to the new state in one step — after which results are identical
to a reader freshly opened on the same directory. This is the serving
fleet's rolling-refresh contract at 10^12 turns: nodes poll the cheap
snapshot token between batches and reopen without dropping the process
(tools/serve_daemon.py --refresh auto drives exactly this)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import (
    DEMO_STOP_WORDS, EngineConfig, ScoreWeights,
)
from search_engine_spark.operators.deletes import delete_docs
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.serving import LocalIndexReader
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts, synthesize_transcripts,
)
from search_engine_spark.streaming.incremental import (
    append_batch, refresh_stats,
)

CFG = EngineConfig(stop_words=DEMO_STOP_WORDS, score_weights=ScoreWeights())
SF_DIR = "/root/testdata/sf0.001"


def _results(reader, query):
    pdf = reader.search_bm25(query, k=10)
    return [
        (int(r.doc_id), float(r.score))
        for r in pdf.itertuples(index=False)
    ]


@pytest.fixture(scope="module")
def half_index(spark, tmp_path_factory):
    """An index built from the first half of the corpus, plus the second
    half as the growth batch."""
    idx = str(tmp_path_factory.mktemp("refresh_idx"))
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    first = tx.filter(F.col("conv_id") < "conv-50")
    second = tx.filter(F.col("conv_id") >= "conv-50")
    build_index(
        spark, corpus_from_transcripts(first), idx, config=CFG, segments=2
    )
    return idx, second


def test_reader_snapshot_then_refresh(spark, half_index):
    """Growth happens ONCE under two open readers (pinned and cold);
    both must keep serving the old snapshot until refresh(), then match
    freshly opened readers exactly. Writers only add files (new seg
    label) or atomically replace small ones, so open listings stay
    valid throughout."""
    idx, second = half_index
    readers = {
        pin: LocalIndexReader(idx, config=CFG, pin_postings=pin)
        for pin in (True, False)
    }
    n0 = readers[True].count()
    before = {
        pin: _results(r, "window merge filter")
        for pin, r in readers.items()
    }
    for pin, r in readers.items():
        assert not r.is_stale()
        assert r.refresh() is False, pin  # no-op when nothing moved
        assert before[pin], pin

    # grow the index under the open readers
    n_new = append_batch(
        spark, corpus_from_transcripts(second), idx, seg_label="g1",
        config=CFG,
    )
    assert n_new > 0
    refresh_stats(spark, idx, config=CFG)

    for pin, reader in readers.items():
        # snapshot semantics: the open reader still serves the old state
        assert reader.count() == n0, pin
        assert _results(reader, "window merge filter") == before[pin], pin
        assert reader.is_stale(), pin

        # refresh advances; results now match a freshly opened reader
        assert reader.refresh() is True, pin
        assert not reader.is_stale(), pin
        assert reader.count() == n0 + n_new, pin
        fresh = LocalIndexReader(idx, config=CFG, pin_postings=pin)
        for q in ("window merge filter", "table scan", "spark"):
            assert _results(reader, q) == _results(fresh, q), (pin, q)
            wand = reader.wand_topk(q, k=10)
            assert _results(reader, q)[:10] == [
                (int(r.doc_id), float(r.score))
                for r in wand.itertuples(index=False)
            ], (pin, q)


def test_refresh_sees_tombstones(spark, half_index):
    idx, _ = half_index
    reader = LocalIndexReader(idx, config=CFG, pin_postings=True)
    hits = _results(reader, "window merge")
    victim = hits[0][0]
    assert delete_docs(spark, idx, doc_ids=[victim]) >= 1
    assert reader.is_stale()
    # old snapshot still returns the victim
    assert victim in [d for d, _ in _results(reader, "window merge")]
    assert reader.refresh() is True
    assert victim not in [d for d, _ in _results(reader, "window merge")]
    assert victim not in list(
        reader.wand_topk("window merge", k=10)["doc_id"]
    )


def test_force_refresh_reopens(spark, half_index):
    idx, _ = half_index
    reader = LocalIndexReader(idx, config=CFG, pin_postings=False)
    assert reader.refresh() is False
    assert reader.refresh(force=True) is True
