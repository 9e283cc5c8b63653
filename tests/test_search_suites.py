"""carl friedrich / Rank Haber / Rank Star suites — rank-identical ports of
/root/reference/src/engine.test.ts:137-344 and engine-binary.test.ts:9-126."""

import pytest

from search_engine_spark.config import EngineConfig, ScoreWeights
from conftest import build_fixture_engine
from fixtures_data import CARL_BINARY, CARL_MEMORY, RANK_HABER, RANK_STAR


def test_carl_friedrich_memory(spark, tmp_path):
    engine = build_fixture_engine(spark, CARL_MEMORY, tmp_path / "idx")
    result = engine.search('"carl friedrich"').collect()
    assert len(result) == 6
    assert 'by "Carl Friedrich" Gauss in' in result[0]["introduction"]
    assert 'mathematician "Carl Friedrich" Gauss 1777' in result[1]["introduction"]
    assert '"CARL FrieDricH"' in result[5]["introduction"]


def test_carl_friedrich_binary_ranks(spark, tmp_path):
    engine = build_fixture_engine(spark, CARL_BINARY, tmp_path / "idx")
    result = engine.search('"carl friedrich"').collect()
    assert len(result) == 6
    assert result[0]["url"] == "https://en.wikipedia.org/wiki/Carl_Friedrich_Gauss"
    assert 'arithmetic by "Carl Friedrich" Gauss in' in result[1]["introduction"]
    assert '"CARL FrieDricH"' in result[5]["introduction"]


@pytest.fixture(scope="module")
def haber_engine(spark, tmp_path_factory):
    config = EngineConfig(
        score_weights=ScoreWeights(
            title_exact_match=10,
            title_begins=5,
            title_contains_in_beginning=1,
            url_contains=1,
        )
    )
    return build_fixture_engine(
        spark, RANK_HABER, tmp_path_factory.mktemp("haber_idx"), config=config
    )


def test_rank_haber_process(haber_engine):
    result = haber_engine.search("process").collect()
    assert result[0]["url"] == "https://en.wikipedia.org/wiki/Process"


def test_rank_haber_haber(haber_engine):
    result = haber_engine.search("haber").collect()
    assert result[0]["url"] == "https://en.wikipedia.org/wiki/Haber"


def test_rank_haber_haber_process(haber_engine):
    result = haber_engine.search("haber process").collect()
    assert result[0]["url"] == "https://en.wikipedia.org/wiki/Haber_process"


@pytest.fixture(scope="module")
def star_engine(spark, tmp_path_factory):
    return build_fixture_engine(
        spark, RANK_STAR, tmp_path_factory.mktemp("star_idx")
    )


def test_rank_star_star(star_engine):
    result = star_engine.search("star").collect()
    assert result[0]["url"] == "https://en.wikipedia.org/wiki/Star"


def test_rank_star_trek(star_engine):
    result = star_engine.search("trek").collect()
    assert (
        result[0]["url"]
        == "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series"
    )


def test_rank_star_star_trek(star_engine):
    result = star_engine.search("star trek").collect()
    assert (
        result[0]["url"]
        == "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series"
    )
