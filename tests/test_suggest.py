"""SearchEngine.suggest: did-you-mean over the index vocabulary via the
SymSpell deletion-neighborhood equi-join (functions/suggest.py). The
corpus-level twin (symspell_suggest) is driver-oracle-checked against
brute force; these tests cover the ENGINE surface: correction of
misspelled query terms against term_stats, dist-0 self-match for
correctly spelled ones, ranking, and plan hygiene."""

import pytest

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    synthesize_transcripts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    idx = str(tmp_path_factory.mktemp("suggest_idx") / "index")
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    build_index(spark, corpus_from_transcripts(tx), idx, config=cfg, segments=2)
    return SearchEngine(spark, idx, config=cfg)


def test_suggest_corrects_typos(engine):
    rows = engine.suggest("windoq mrge").collect()
    best = {r["query_term"]: r for r in rows if r["rank"] == 1}
    assert best["windoq"]["suggestion"] == "window"
    assert best["windoq"]["dist"] == 1
    assert best["mrge"]["suggestion"] == "merge"
    assert best["mrge"]["dist"] == 1
    # ranks are dense per term, suggestions ordered (dist, df desc, term)
    for qt in ("windoq", "mrge"):
        ranks = [r["rank"] for r in rows if r["query_term"] == qt]
        assert ranks == list(range(1, len(ranks) + 1))


def test_suggest_exact_brute_force_equivalence(engine):
    """The deletion-neighborhood candidates + levenshtein verify must
    equal a brute-force scan of the vocabulary (the SymSpell losslessness
    claim, checked here at the engine surface too)."""
    from pyspark.sql import functions as F

    query = "windoq scon"
    got = [
        (r["query_term"], r["rank"], r["suggestion"], r["dist"])
        for r in engine.suggest(query, max_dist=2, k=3).collect()
    ]
    vocab = engine.term_stats().select("term", "df").collect()
    want = []
    for qt in sorted(query.split()):
        cands = []
        for row in vocab:
            d = _lev(qt, row["term"])
            if d <= 2:
                cands.append((d, -row["df"], row["term"]))
        cands.sort()
        for i, (d, _negdf, t) in enumerate(cands[:3], start=1):
            want.append((qt, i, t, d))
    assert got == want


def test_suggest_correct_term_is_dist_zero(engine):
    rows = engine.suggest("window").collect()
    assert rows[0]["suggestion"] == "window" and rows[0]["dist"] == 0


def test_suggest_empty_and_short(engine):
    assert engine.suggest("").count() == 0
    assert engine.suggest("a").count() == 0  # length-1 terms skipped


def test_suggest_plan_jvm_side(engine):
    df = engine.suggest("windoq")
    qe = df._jdf.queryExecution()
    plan = qe.toString() + "\n" + qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "levenshtein" in plan


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]
