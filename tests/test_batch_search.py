"""Batch query path (operators/batch.py): per-query results must be
IDENTICAL to the single-query reference-parity path, cold and warmed —
the batch plan is a serving optimization, never a semantics change."""

import pytest

from search_engine_spark.config import EngineConfig, ScoreWeights
from search_engine_spark.operators.batch import bm25_many, search_many
from search_engine_spark.operators.bm25 import bm25_topk

from conftest import build_fixture_engine
from fixtures_data import CARL_MEMORY

WEIGHTS = ScoreWeights(
    title_exact_match=10,
    title_begins=5,
    title_contains_in_beginning=5,
    url_contains=1,
)

QUERIES = [
    "friedrich",                      # single-term fast path
    "carl friedrich",                 # conjunctive
    '"carl friedrich" german',        # phrase + word
    '"johann friedrich"',             # phrase only
    "zz_no_such_term",                # no hits
    "a",                              # len<2 is always stop-filtered -> empty
    '"carl friedrich" "german mathematician"',  # two quote groups
    "gauss",                          # another single term
    "carl friedrich",                 # exact duplicate -> canonical dedup
    "friedrich carl",                 # same signature, different word
                                      # order -> shared candidates but
                                      # per-qid scoring must differ
    '"" carl friedrich',              # empty quote group only: the
                                      # single path's predicate is a
                                      # False disjunct -> zero rows
    '"carl friedrich" ""',            # empty group next to a real one:
                                      # ignorable False disjunct
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("batch_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )


def _singles(engine, queries):
    return {
        i: [tuple(r) for r in engine.search(q).collect()]
        for i, q in enumerate(queries)
    }


def _batched(engine, queries):
    out = {}
    for r in search_many(engine, queries).collect():
        out.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["title"], r["introduction"], r["url"])
        )
    return out


def test_batch_matches_single_cold(engine):
    singles = _singles(engine, QUERIES)
    batched = _batched(engine, QUERIES)
    for i, q in enumerate(QUERIES):
        assert batched.get(i, []) == singles[i], f"mismatch for {q!r}"


def test_batch_matches_single_warmed(spark, tmp_path_factory):
    eng = build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("batch_warm_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )
    singles = _singles(eng, QUERIES)
    eng.warm().serve_mode(True)
    try:
        batched = _batched(eng, QUERIES)
        for i, q in enumerate(QUERIES):
            assert batched.get(i, []) == singles[i], f"mismatch for {q!r}"
    finally:
        eng.serve_mode(False)


def test_single_query_warm_parity(spark, tmp_path_factory):
    """SearchEngine.search itself (not just the batch path) must return
    identical rows before and after warm().serve_mode(True) — the warmed
    fused path (broadcast join + pinned stats) is an execution strategy,
    never a semantics change (ADVICE r01)."""
    eng = build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("warm_parity_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )
    cold = _singles(eng, QUERIES)
    eng.warm().serve_mode(True)
    try:
        warmed = _singles(eng, QUERIES)
        for i, q in enumerate(QUERIES):
            assert warmed[i] == cold[i], f"warm parity broke for {q!r}"
    finally:
        eng.serve_mode(False)


def test_batch_rank_column_is_dense_order(engine):
    df = search_many(engine, ["friedrich", "carl friedrich"])
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_batch_empty_inputs(engine, spark):
    assert search_many(engine, []).count() == 0
    # len<2 words are unconditionally stop-filtered (engine.ts:469)
    assert search_many(engine, ["a", "i b"]).count() == 0
    assert bm25_many(engine, ["a"]).count() == 0


def test_bm25_batch_matches_single(engine):
    queries = ["friedrich", "carl friedrich gauss", "zz_nope", "german"]
    for conjunctive in (False, True):
        singles = {
            i: [
                (r["doc_id"], r["score"], int(r["n_terms"]))
                for r in bm25_topk(
                    engine, q, k=10, conjunctive=conjunctive
                ).collect()
            ]
            for i, q in enumerate(queries)
        }
        got = {}
        for r in bm25_many(
            engine, queries, k=10, conjunctive=conjunctive
        ).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"], int(r["n_terms"]))
            )
        for i, q in enumerate(queries):
            assert got.get(i, []) == singles[i], (
                f"bm25 conj={conjunctive} mismatch for {q!r}"
            )


def test_bm25_batch_matches_single_warmed(spark, tmp_path_factory):
    eng = build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("bm25_batch_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )
    queries = ["friedrich german", "carl friedrich gauss"]
    singles = {
        i: [
            (r["doc_id"], r["score"], int(r["n_terms"]))
            for r in bm25_topk(eng, q, k=10).collect()
        ]
        for i, q in enumerate(queries)
    }
    eng.warm()
    got = {}
    for r in bm25_many(eng, queries, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], int(r["n_terms"]))
        )
    for i in range(len(queries)):
        # warm path inlines idf driver-side; scores must still be
        # bit-identical (same fold, same float math)
        assert got.get(i, []) == singles[i]


def test_rewarm_refreshes_handles(spark, tmp_path_factory):
    """warm() called twice must (a) not leak or crash, (b) produce
    results identical to cold, and (c) re-pin FRESH handles — blocks()
    and term_stats() short-circuit to pinned frames, so a re-warm that
    read through them would freeze the first warm's snapshot forever."""
    eng = build_fixture_engine(
        spark,
        CARL_MEMORY,
        tmp_path_factory.mktemp("rewarm_idx"),
        config=EngineConfig(score_weights=WEIGHTS),
    )
    cold = _singles(eng, QUERIES[:4])
    eng.warm()
    first_blocks = eng._blocks
    first_stats = eng._term_stats
    eng.warm()
    # fresh handles (fresh parquet listings): object identity is the
    # observable — storageLevel can't distinguish old from new because
    # Spark's CacheManager keys entries by logical plan, and both
    # handles share the plan (same path)
    assert eng._blocks is not first_blocks
    assert eng._term_stats is not first_stats
    warmed = _singles(eng, QUERIES[:4])
    for i in range(4):
        assert warmed[i] == cold[i]
