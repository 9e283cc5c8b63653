"""Metadata-filtered search (``search(where=...)``) and typo-tolerant
``search_fuzzy`` over the persisted index.

The filter is the transcript-payload use case: corpus_from_transcripts
maps ``role:tool`` into the title, so ``where=title.startswith(
"assistant:")`` searches only assistant turns. The cap-semantics test
pins the design decision that the predicate gates candidates BEFORE the
reference's intersection cap (engine.ts:134), so a filtered query fills
``max_count`` from the filtered set."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import build_fixture_engine, urls

# transcript-shaped corpus: url = conv#turn, title = role:tool
FIX = [
    {"url": "c1#0", "title": "user:", "rank": 0,
     "text": "alpha merge window query"},
    {"url": "c1#1", "title": "assistant:", "rank": 1,
     "text": "merge window beta result"},
    {"url": "c2#0", "title": "assistant:", "rank": 2,
     "text": "gamma merge window plan"},
    {"url": "c2#1", "title": "tool:tool_web", "rank": 3,
     "text": "delta merge window output"},
    {"url": "c3#0", "title": "assistant:", "rank": 4,
     "text": "epsilon merge window done"},
]

ASSISTANT_URLS = {d["url"] for d in FIX if d["title"] == "assistant:"}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return build_fixture_engine(
        spark, FIX, tmp_path_factory.mktemp("filtered_idx")
    )


def _assistant(eng, **kw):
    return eng.search(
        "merge window",
        where=F.col("title").startswith("assistant:"),
        **kw,
    )


def test_where_restricts_to_role(eng):
    res = _assistant(eng).collect()
    assert {r["url"] for r in res} == ASSISTANT_URLS
    assert all(r["title"] == "assistant:" for r in res)


def test_where_fills_cap_from_filtered_set(eng):
    # 3 assistant docs match; max_count=2 must return 2 of THEM — a
    # post-filter over a capped unfiltered page could return fewer
    res = _assistant(eng, max_count=2).collect()
    assert len(res) == 2
    assert all(r["url"] in ASSISTANT_URLS for r in res)


def test_where_none_is_parity_path(eng):
    plain = eng.search("merge window").collect()
    via_kwarg = eng.search("merge window", where=None).collect()
    assert plain == via_kwarg
    assert {r["url"] for r in plain} == {d["url"] for d in FIX}


def test_where_no_match_is_empty(eng):
    res = eng.search(
        "merge window", where=F.col("title").startswith("nosuchrole:")
    )
    assert res.count() == 0


def test_fuzzy_corrects_unknown_term(eng):
    corrected, res = eng.search_fuzzy("mergw window")
    assert corrected == "merge window"
    assert urls(res) == urls(eng.search("merge window"))


def test_fuzzy_known_terms_pass_through(eng):
    corrected, res = eng.search_fuzzy("merge window")
    assert corrected == "merge window"
    assert urls(res) == urls(eng.search("merge window"))


def test_fuzzy_phrase_never_corrected(eng):
    corrected, res = eng.search_fuzzy('"mergw window"')
    assert corrected == '"mergw window"'
    assert urls(res) == urls(eng.search('"mergw window"'))


def test_fuzzy_unsuggestable_term_stays(eng):
    corrected, res = eng.search_fuzzy("zzzzzzqx, window")
    # no correction applied -> the ORIGINAL text comes back verbatim
    # (not a tokenized rejoin), so UIs don't show a false banner
    assert corrected == "zzzzzzqx, window"
    assert res.count() == 0  # honest empty conjunction, not a guess


# keep LAST in the file: warming the module-scoped engine would flip the
# fuzzy tests above off the cold _known_terms/term_stats branch
def test_where_and_fuzzy_warm_parity(eng):
    cold_filtered = _assistant(eng).collect()
    cold_fuzzy = urls(eng.search_fuzzy("mergw window")[1])
    eng.warm()
    assert _assistant(eng).collect() == cold_filtered
    corrected, res = eng.search_fuzzy("mergw window")
    assert corrected == "merge window"
    assert urls(res) == cold_fuzzy
