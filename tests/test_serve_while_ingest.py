"""Serve-while-ingest end-to-end gate: a warmed engine keeps answering —
correctly, from its warmed snapshot — WHILE a new segment is appended and
the stats are refreshed, and a re-warm advances it to the new snapshot.

This proves the term_stats/blocks snapshot contract documented on
SearchEngine.term_stats (operators/search.py): warm() pins a snapshot
handle; concurrent ingest (streaming/incremental.py) only ADDS segment
directories and rewrites the stats tables, which the warmed engine never
re-reads — so queries racing an ingest can neither crash nor see a
half-ingested state, and the new docs become visible exactly at re-warm.

The reference has no analogue (its demo ingests, then serves,
single-threaded — /root/reference/src/demo.ts:26-64,159-190); at cluster
scale serve-while-ingest is the default operating mode.
"""

import threading

import pytest

from pyspark.sql import functions as F

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)
from search_engine_spark.streaming.incremental import (
    append_batch,
    refresh_stats,
)

SF_DIR = "/root/testdata/sf0.001"
NEW_TERM = "zzznewsegmentterm"


@pytest.fixture(scope="module")
def split_tx(spark):
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    base = tx.filter(F.col("turn_idx") < 6)
    # the late turns become the ingested segment, salted with a term the
    # base index cannot contain so visibility flips exactly at re-warm
    extra = tx.filter(F.col("turn_idx") >= 6).withColumn(
        "text", F.concat_ws(" ", "text", F.lit(NEW_TERM))
    )
    return base, extra


def test_serve_while_ingest(spark, tmp_path_factory, split_tx):
    base, extra = split_tx
    idx = str(tmp_path_factory.mktemp("swi_idx"))
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    build_index(
        spark, corpus_from_transcripts(base), idx, config=cfg, segments=2
    )
    engine = SearchEngine(spark, idx, config=cfg).warm()
    n_before = engine.count()
    baseline = [
        (r["doc_id"], r["score"])
        for r in engine.search_bm25("filter join window", k=10).collect()
    ]
    assert engine.search(NEW_TERM, max_count=5).count() == 0

    # hammer the warmed engine from another thread for the whole
    # duration of the append + refresh (Spark schedules jobs from
    # concurrent driver threads independently)
    errors: list[Exception] = []
    results: list[list] = []
    stop = threading.Event()

    def pound():
        try:
            while not stop.is_set():
                results.append(
                    [
                        (r["doc_id"], r["score"])
                        for r in engine.search_bm25(
                            "filter join window", k=10
                        ).collect()
                    ]
                )
                engine.search("window merge", max_count=5).collect()
        except Exception as e:  # noqa: BLE001 - the assert below rethrows
            errors.append(e)

    t = threading.Thread(target=pound)
    t.start()
    try:
        n_new = append_batch(
            spark, corpus_from_transcripts(extra), idx, "swi-1", config=cfg
        )
        refresh_stats(spark, idx, config=cfg)
    finally:
        stop.set()
        t.join(timeout=120)
    assert not t.is_alive()
    assert not errors, errors
    assert n_new > 0
    # every concurrent answer served the warmed snapshot, bit-identical
    assert results and all(r == baseline for r in results)

    # the warmed engine still serves its snapshot after the ingest...
    assert engine.search(NEW_TERM, max_count=5).count() == 0
    # ...and re-warm ON THE SAME ENGINE advances to the new snapshot
    # (warm() releases every pinned frame, re-lists the directories, and
    # reloads the scalar corpus stats): the appended docs are searchable
    # on every path, the stats moved
    engine.warm()
    assert engine.count() == n_before + n_new
    assert engine.search(NEW_TERM, max_count=5).count() > 0
    ranked = engine.search_bm25(NEW_TERM, k=5)
    assert ranked.count() > 0
    wand = engine.search_bm25(NEW_TERM, k=5, use_wand=True)
    assert [r["doc_id"] for r in wand.collect()] == [
        r["doc_id"] for r in ranked.collect()
    ]
