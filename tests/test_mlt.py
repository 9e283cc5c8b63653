"""Engine-side More-Like-This over the persisted index.

Semantics: the seed doc's top tf·idf terms form a disjunctive query;
other docs rank by summed idf of the seed terms they share. The corpus
twin (mining_extras.q_more_like_this) is oracle-gated; these tests pin
the INDEX path: seed-term selection from the doc's own postings, warm
vs cold parity, and the bounded-collect contract."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from conftest import build_fixture_engine  # noqa: E402

# distinctive vocabulary: docs 0/1 share "asteroid belt", doc 2 is
# unrelated except through the ubiquitous word "probe" (in every doc,
# so its idf is 0 and it never drives ranking), doc 3 shares only
# "belt" with the seed
FIXTURE = [
    {
        "url": "u0",
        "title": "seed",
        # title words are indexed too: with tf(asteroid)=2 the top-5
        # tf-idf terms are asteroid, seed, survey (idf ln4), belt
        # (ln(4/3)) and probe (idf 0 — in every doc)
        "text": "asteroid belt survey probe asteroid",
        "rank": 100,
    },
    {
        "url": "u1",
        "title": "near dup",
        "text": "asteroid belt probe flyby of the asteroid cluster",
        "rank": 100,
    },
    {
        "url": "u2",
        "title": "unrelated",
        "text": "deep ocean probe trench dive pressure hull",
        "rank": 100,
    },
    {
        "url": "u3",
        "title": "partial",
        "text": "kuiper belt probe beyond neptune horizon",
        "rank": 100,
    },
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return build_fixture_engine(
        spark, FIXTURE, tmp_path_factory.mktemp("mlt_idx")
    )


def seed_doc_id(engine) -> int:
    return engine.docs.filter("url = 'u0'").collect()[0]["doc_id"]


def test_mlt_ranks_by_shared_idf(engine):
    sid = seed_doc_id(engine)
    rows = engine.more_like_this(sid, n_terms=5, k=10).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    urls = {
        r["doc_id"]: r["url"]
        for r in engine.docs.select("doc_id", "url").collect()
    }
    ranked_urls = [urls[r["doc_id"]] for r in rows]
    # u1 shares asteroid+belt (two rare terms) -> first; u3 shares belt
    assert ranked_urls[0] == "u1"
    assert "u3" in ranked_urls
    # the seed itself is excluded
    assert all(urls[d] != "u0" for d in by_doc)
    # scores strictly ordered desc, ties by doc_id
    scores = [r["mlt_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # u2 shares only zero-idf "probe": score 0.0 if present
    for r in rows:
        if urls[r["doc_id"]] == "u2":
            assert r["mlt_score"] == 0.0


def test_mlt_warm_parity(engine):
    sid = seed_doc_id(engine)
    cold = [tuple(r) for r in engine.more_like_this(sid, k=10).collect()]
    engine.warm(pin_docs=False)
    try:
        warm = [tuple(r) for r in engine.more_like_this(sid, k=10).collect()]
    finally:
        # leave the module-scoped engine cold for other tests
        for h in (engine.postings, engine.term_positions,
                  engine._term_stats, engine._blocks):
            if h is not None:
                h.unpersist()
        engine._term_stats = None
        engine._blocks = None
        engine._stats_map = None
        engine._warmed = False
    assert warm == cold


def test_mlt_unknown_doc_is_empty(engine):
    out = engine.more_like_this(10_000_000, k=10)
    assert out.count() == 0
    assert out.columns == ["doc_id", "mlt_score", "n_shared"]


def test_mlt_n_terms_bounds_query(engine):
    sid = seed_doc_id(engine)
    # with a single seed term (the highest tf*idf one: "asteroid", tf=2)
    # only docs containing it can appear
    rows = engine.more_like_this(sid, n_terms=1, k=10).collect()
    urls = {
        r["doc_id"]: r["url"]
        for r in engine.docs.select("doc_id", "url").collect()
    }
    assert {urls[r["doc_id"]] for r in rows} == {"u1"}


def test_mlt_skips_terms_missing_from_stats(engine):
    """Serve-while-ingest: a segment written before its stats refresh has
    postings for terms term_stats doesn't know yet — MLT must skip them
    (like BM25's join semantics), not crash with KeyError."""
    sid = seed_doc_id(engine)
    engine.warm(pin_docs=False)
    try:
        # simulate the stats lag: drop the seed's strongest term from the
        # pinned vocab map
        assert engine._stats_map is not None
        engine._stats_map = {
            t: df for t, df in engine._stats_map.items() if t != "asteroid"
        }
        rows = engine.more_like_this(sid, n_terms=1, k=10).collect()
        # with "asteroid" unscorable the top-1 term becomes the next by
        # tf-idf; the call must succeed and exclude the dropped term's
        # contribution (u1 no longer guaranteed first)
        assert isinstance(rows, list)
        # extreme lag: EVERY seed term unknown -> empty result, no crash
        engine._stats_map = {}
        assert engine.more_like_this(sid, k=10).count() == 0
    finally:
        for h in (engine.postings, engine.term_positions,
                  engine._term_stats, engine._blocks):
            if h is not None:
                h.unpersist()
        engine._term_stats = None
        engine._blocks = None
        engine._stats_map = None
        engine._warmed = False
