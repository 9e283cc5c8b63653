"""Planets end-to-end query suite — rank-identical port of
/root/reference/src/engine.test.ts:4-135 (no scoreWeights, no stopWords)."""

import re

import pytest

from conftest import build_fixture_engine, intros, urls
from fixtures_data import PLANETS

JUPITER = "https://en.wikipedia.org/wiki/Jupiter"
SATURN = "https://en.wikipedia.org/wiki/Saturn"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return build_fixture_engine(
        spark, PLANETS, tmp_path_factory.mktemp("planets_idx")
    )


def test_single_hit(engine):
    result = engine.search("brightest").collect()
    assert len(result) == 1
    assert result[0]["url"] == JUPITER
    assert 'of the "brightest" objects visible' in result[0]["introduction"]
    assert 'the third "brightest" natural object' in result[0]["introduction"]


def test_two_results(engine):
    result = engine.search("giant").collect()
    assert [r["url"] for r in result] == [JUPITER, SATURN]
    assert 'gas "giant"' in result[0]["introduction"]
    assert 'gas "giant"' in result[1]["introduction"]


def test_multiple_hits(engine):
    assert len(engine.search("Solar").collect()) == 2


def test_single_adjacent_words(engine):
    result = engine.search("ancient civilizations").collect()
    assert len(result) == 1
    assert result[0]["url"] == JUPITER
    assert result[0]["introduction"] == 'known to "ancient civilizations" since before'


def test_single_words(engine):
    result = engine.search("planet sixth").collect()
    assert len(result) == 1
    assert result[0]["url"] == SATURN
    assert result[0]["introduction"] == 'is the "sixth planet" from the'


def test_quotes_no_matches(engine):
    assert engine.search('"planet sixth"').collect() == []


def test_quotes_one_match(engine):
    result = engine.search('"after Jupiter"').collect()
    assert len(result) == 1
    assert result[0]["url"] == SATURN
    assert "after Jupiter" in result[0]["introduction"]


def test_quotes_suffix_word(engine):
    result = engine.search('"from the Sun" Moon').collect()
    assert len(result) == 1
    assert result[0]["url"] == JUPITER
    assert re.search(r'"from the Sun".*?"Moon"', result[0]["introduction"])


def test_quotes_prefix_word_occurring_after_incorrect_case(engine):
    result = engine.search('moon "from the Sun"').collect()
    assert len(result) == 1
    assert result[0]["url"] == JUPITER
    assert re.search(r'"from the Sun".*?"Moon"', result[0]["introduction"])


def test_quotes_prefix_word_occurring_first_incorrect_case(engine):
    result = engine.search('fifth "from the sun"').collect()
    assert len(result) == 1
    assert result[0]["url"] == JUPITER
    assert re.search(r'"fifth".*"from the Sun"', result[0]["introduction"])


def test_quotes_incorrect_case(engine):
    assert len(engine.search('"moon and venus"').collect()) == 1
