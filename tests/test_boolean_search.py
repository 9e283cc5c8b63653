"""Extended boolean query surface (operators/boolean.py): -word exclusion
and word* prefix atoms over the persisted index, plus plan hygiene (one
pushed scan, no Python stage)."""

import pytest

from tests.conftest import build_fixture_engine, urls
from tests.fixtures_data import PLANETS

from search_engine_spark.operators.boolean import parse_boolean_query

JUPITER = "https://en.wikipedia.org/wiki/Jupiter"
SATURN = "https://en.wikipedia.org/wiki/Saturn"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return build_fixture_engine(
        spark, PLANETS, tmp_path_factory.mktemp("bool_idx")
    )


def test_parse(eng):
    req, exc, pre, xpre = parse_boolean_query(
        "planet -sickle bright* -The -nak*", eng.config.stop_words
    )
    assert req == ["planet"]
    # default config has no stop words (reference parity), so 'the' stays
    assert exc == ["sickle", "the"]
    assert pre == ["bright"]
    assert xpre == ["nak"]  # -word* = negated PREFIX, not exact -word


def test_parse_stop_words_dropped():
    from search_engine_spark.config import DEMO_STOP_WORDS

    req, exc, pre, xpre = parse_boolean_query(
        "planet -The merge* -a x", DEMO_STOP_WORDS
    )
    assert req == ["planet"]  # 'x' is sub-2-char -> dropped
    assert exc == []  # 'the' and 'a' are stop words -> dropped
    assert pre == ["merge"]
    assert xpre == []


def test_and_unchanged(eng):
    assert urls(eng.search_boolean("planet")) == [JUPITER, SATURN]


def test_exclusion(eng):
    # 'sickle' appears only in the Saturn text
    assert urls(eng.search_boolean("planet -sickle")) == [JUPITER]
    # Saturn's text mentions Jupiter, so -jupiter excludes BOTH docs
    assert urls(eng.search_boolean("planet -jupiter")) == []


def test_prefix(eng):
    # bright/brightest only in the Jupiter text
    assert urls(eng.search_boolean("bright* planet")) == [JUPITER]
    # sol* (Solar) in both
    assert urls(eng.search_boolean("sol*")) == [JUPITER, SATURN]
    # prefix matching nothing
    assert urls(eng.search_boolean("zzz*")) == []


def test_negated_prefix(eng):
    # bright/brightest appear only in the Jupiter text: -bright* must
    # exclude Jupiter via the PREFIX (Saturn has neither form)
    assert urls(eng.search_boolean("planet -bright*")) == [SATURN]
    # exact -brightest would NOT exclude a doc that only has 'bright',
    # but -bright* excludes any bright-prefixed term
    assert urls(eng.search_boolean("planet -zzz*")) == [JUPITER, SATURN]


def test_exclusion_only_is_empty(eng):
    assert eng.search_boolean("-jupiter").count() == 0
    assert eng.search_boolean("").count() == 0


def test_max_count(eng):
    assert len(urls(eng.search_boolean("planet", max_count=1))) == 1


def test_warm_parity(spark, tmp_path_factory):
    e = build_fixture_engine(
        spark, PLANETS, tmp_path_factory.mktemp("bool_warm_idx")
    )
    queries = ["planet -sickle", "bright* planet", "sol*", "planet"]
    cold = [urls(e.search_boolean(q)) for q in queries]
    e.warm()
    warmed = [urls(e.search_boolean(q)) for q in queries]
    assert warmed == cold


def test_plan_pushdown_and_jvm_only(eng):
    from search_engine_spark.operators.boolean import boolean_candidates

    plan = (
        eng.search_boolean("planet -sickle bright*")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan

    # the SHIPPED candidate stage (the exact plan search_boolean runs):
    # the OR-of-(In, StartsWith) predicate must reach the parquet scan —
    # a lower()/cast on the term column would silently kill this
    cand = boolean_candidates(
        eng, ["planet"], ["sickle"], ["bright"], ["nak"]
    )
    cand_plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in cand_plan
    assert "PushedFilters" in cand_plan
    assert "StringStartsWith" in cand_plan
    # and the In() half of the scan predicate is pushed alongside
    assert "In(term" in cand_plan or "In(`term`" in cand_plan
