"""Streaming query serving (streaming/serving.py): per-query rows drained
through the stream must be IDENTICAL to the single-query engine calls,
the stream checkpoint must make a re-drain a no-op, and per-batch
metrics must be recorded."""

import json

import pytest

from search_engine_spark.config import EngineConfig, ScoreWeights
from search_engine_spark.operators.bm25 import bm25_topk
from search_engine_spark.streaming.serving import (
    read_served_results,
    serve_query_stream,
)

from conftest import build_fixture_engine
from fixtures_data import CARL_MEMORY

WEIGHTS = ScoreWeights(
    title_exact_match=10,
    title_begins=5,
    title_contains_in_beginning=5,
    url_contains=1,
)

# external ids deliberately non-contiguous / non-zero-based: the remap
# from batch.py's positional qids must not leak through
DROP1 = [(100, "friedrich"), (101, "carl friedrich"), (107, "gauss")]
DROP2 = [(205, '"carl friedrich" german'), (209, "zz_no_such_term")]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("serving_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )


def _write_drop(path, rows):
    with open(path, "w") as f:
        for qid, text in rows:
            f.write(json.dumps({"query_id": qid, "text": text}) + "\n")


def test_stream_serving_matches_single(engine, tmp_path):
    qdir = tmp_path / "queries"
    qdir.mkdir()
    _write_drop(qdir / "drop1.json", DROP1)
    _write_drop(qdir / "drop2.json", DROP2)

    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    metrics = []
    serve_query_stream(
        engine, str(qdir), out, ckpt, mode="search", max_count=10,
        max_files_per_trigger=1, metrics=metrics,
    )

    # one metrics record per micro-batch (= per file), each with QPS
    assert [m["n_queries"] for m in metrics] == [len(DROP1), len(DROP2)]
    assert all(m["qps"] > 0 for m in metrics)

    served = {}
    for r in read_served_results(engine.spark, out).collect():
        served.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["title"], r["introduction"], r["url"])
        )
    for qid, text in DROP1 + DROP2:
        single = [tuple(r) for r in engine.search(text, max_count=10).collect()]
        assert served.get(qid, []) == single, f"mismatch for {text!r}"

    # exactly-once: a second drain over the same checkpoint re-reads
    # nothing and appends nothing
    metrics2 = []
    serve_query_stream(
        engine, str(qdir), out, ckpt, mode="search", max_count=10,
        max_files_per_trigger=1, metrics=metrics2,
    )
    assert metrics2 == []
    n_rows = read_served_results(engine.spark, out).count()
    assert n_rows == sum(
        len(engine.search(t, max_count=10).collect())
        for _, t in DROP1 + DROP2
    )


def test_stream_serving_bm25(engine, tmp_path):
    qdir = tmp_path / "queries"
    qdir.mkdir()
    _write_drop(qdir / "q.json", DROP1)

    out = str(tmp_path / "results")
    serve_query_stream(
        engine, str(qdir), out, str(tmp_path / "ckpt"), mode="bm25",
        max_count=5,
    )
    served = {}
    for r in read_served_results(engine.spark, out).collect():
        served.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 12))
        )
    for qid, text in DROP1:
        single = [
            (i + 1, r["doc_id"], round(r["score"], 12))
            for i, r in enumerate(bm25_topk(engine, text, k=5).collect())
        ]
        assert served.get(qid, []) == single, f"mismatch for {text!r}"
