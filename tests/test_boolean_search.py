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
    req, exc, pre = parse_boolean_query(
        "planet -sickle bright* -The", eng.config.stop_words
    )
    assert req == ["planet"]
    # default config has no stop words (reference parity), so 'the' stays
    assert exc == ["sickle", "the"]
    assert pre == ["bright"]


def test_parse_stop_words_dropped():
    from search_engine_spark.config import DEMO_STOP_WORDS

    req, exc, pre = parse_boolean_query(
        "planet -The merge* -a x", DEMO_STOP_WORDS
    )
    assert req == ["planet"]  # 'x' is sub-2-char -> dropped
    assert exc == []  # 'the' and 'a' are stop words -> dropped
    assert pre == ["merge"]


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
    from pyspark.sql import functions as F

    plan = (
        eng.search_boolean("planet -sickle bright*")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan

    # the candidate scan's OR-of-(In, StartsWith) predicate reaches parquet
    scan = eng.postings.select("doc_id", "term").filter(
        F.col("term").isin(["planet", "sickle"])
        | F.col("term").startswith("bright")
    )
    scan_plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in scan_plan
    assert "StringStartsWith" in scan_plan
