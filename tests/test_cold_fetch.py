"""Cold-path doc fetch modes: the fused (single-plan broadcast-join)
path must return rows identical to the pushdown (collect + IN-scan)
path, run fewer driver-visible jobs, and keep its join a broadcast."""

import pytest

from conftest import build_fixture_engine
from fixtures_data import PLANETS
from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "window merge",
    '"table scan" merge',
    "sc",
    "definitely_absent_term",
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cold_idx")
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    build_index(
        spark, corpus_from_transcripts(tx), str(d),
        config=EngineConfig(), segments=2,
    )
    return str(d)


def _engine(spark, idx, mode) -> SearchEngine:
    return SearchEngine(spark, idx, config=EngineConfig(cold_fetch=mode))


def _jobs_for(spark, tag, fn) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(tag))


def test_fused_rows_equal_pushdown(spark, idx):
    fused = _engine(spark, idx, "fused")
    push = _engine(spark, idx, "pushdown")
    for q in QUERIES:
        a = [tuple(r) for r in fused.search(q, max_count=10).collect()]
        b = [tuple(r) for r in push.search(q, max_count=10).collect()]
        assert a == b, q


def test_auto_resolves_fused_small_pushdown_large(spark, idx):
    auto = _engine(spark, idx, "auto")
    # small corpus -> the auto plan contains the broadcast join (no
    # literal IN-list materialized driver-side)
    plan = auto.search("window merge")._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in str(
        auto.search("window merge")._jdf.queryExecution().executedPlan()
    ) or "Broadcast" in plan


def test_fused_is_lazy_single_action(spark, idx):
    """The fused cold path is ONE submitted action: constructing the
    result DataFrame runs ZERO jobs (pure lazy plan — composable like
    any DataFrame), where pushdown pays an eager candidates-collect at
    construction; total jobs per query never exceed pushdown's."""
    fused = _engine(spark, idx, "fused")
    push = _engine(spark, idx, "pushdown")
    # warm up plan caches once so compile noise doesn't count as a job
    fused.search("window merge", max_count=10).collect()
    push.search("window merge", max_count=10).collect()
    n_construct_fused = _jobs_for(
        spark, "cold-fused-c",
        lambda: fused.search("window merge", max_count=10),
    )
    n_construct_push = _jobs_for(
        spark, "cold-push-c",
        lambda: push.search("window merge", max_count=10),
    )
    assert n_construct_fused == 0, n_construct_fused
    assert n_construct_push > 0, n_construct_push
    nf = _jobs_for(
        spark, "cold-fused",
        lambda: fused.search("window merge", max_count=10).collect(),
    )
    np_ = _jobs_for(
        spark, "cold-push",
        lambda: push.search("window merge", max_count=10).collect(),
    )
    assert nf <= np_, (nf, np_)


def test_fused_matches_reference_ranks(spark, tmp_path_factory):
    eng = build_fixture_engine(
        spark, PLANETS, tmp_path_factory.mktemp("cold_planets"),
        config=EngineConfig(cold_fetch="fused"),
    )
    result = eng.search("giant").collect()
    assert [r["url"] for r in result] == [
        "https://en.wikipedia.org/wiki/Jupiter",
        "https://en.wikipedia.org/wiki/Saturn",
    ]
