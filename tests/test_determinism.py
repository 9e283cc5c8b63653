"""Partition-count invariance: the index and query results must be
identical whatever the parallelism — the local analogue of "same answers
at N and 4N executors" (north rule; SURVEY.md §5 dual-backend equivalence
becomes dual-parallelism equivalence)."""

import pytest

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)

SF_DIR = "/root/testdata/sf0.001"
CFG = EngineConfig(stop_words=DEMO_STOP_WORDS)


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    corpus = corpus_from_transcripts(tx)
    out = []
    for label, nparts, segs in [("a", 2, 1), ("b", 7, 3)]:
        d = str(tmp_path_factory.mktemp(f"det_{label}"))
        build_index(
            spark, corpus, d, config=CFG, segments=segs,
            shuffle_partitions=nparts,
        )
        out.append(SearchEngine(spark, d, config=CFG))
    return out


def test_doc_ids_invariant(spark, engines):
    a, b = engines
    ra = a.docs.select("doc_id", "url").orderBy("doc_id").collect()
    rb = b.docs.select("doc_id", "url").orderBy("doc_id").collect()
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb]


def test_postings_invariant(spark, engines):
    a, b = engines
    cols = ["term", "doc_id", "tf", "dl"]
    ra = a.postings.select(*cols).orderBy(*cols).collect()
    rb = b.postings.select(*cols).orderBy(*cols).collect()
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb]


@pytest.mark.parametrize("query", ["filter join window", "table scan merge"])
def test_query_results_invariant(engines, query):
    a, b = engines
    for wand in (False, True):
        ra = [tuple(r) for r in a.search_bm25(query, k=10, use_wand=wand).collect()]
        rb = [tuple(r) for r in b.search_bm25(query, k=10, use_wand=wand).collect()]
        assert ra == rb, (query, wand)

    pa = [
        (r["doc_id"], r["score"], r["introduction"])
        for r in a.search(query, max_count=10).collect()
    ]
    pb = [
        (r["doc_id"], r["score"], r["introduction"])
        for r in b.search(query, max_count=10).collect()
    ]
    assert pa == pb


def test_pack_sequences_partition_invariant(spark):
    """Bin assignment depends only on the doc_id total order, never on
    the partition layout of the two-stage prefix sum (packing_extras)."""
    from search_engine_spark.operators.packing_extras import q_pack_sequences

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in q_pack_sequences(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = [tuple(r) for r in q_pack_sequences(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a and a == b
