"""Tokenizer parity tests (FIXTURES.md §4 + SURVEY.md §7.4 quirks) and
equality of the three implementations (Python / Column expr / Arrow UDF)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.tokenizer import (
    is_stop_word,
    tokenize,
    tokenize_expr,
    tokenize_words_udf,
)
from fixtures_data import JUPITER_TEXT, SATURN_TEXT, RANK_STAR

CASES = [
    ("god´s sickle", ["god", "s", "sickle"], []),
    ("Haber–Bosch process", ["Haber", "Bosch", "process"], []),
    ('"from the Sun" Moon', ["from", "the", "Sun", "Moon"], [0, 3]),
    ('fifth "from the sun"', ["fifth", "from", "the", "sun"], [1, 4]),
    ("Jupiter.[18] When", ["Jupiter", "18", "When"], []),
    ("räksmörgås åäö", ["räksmörgås", "åäö"], []),
    ("a_b_c", ["a_b_c"], []),
    ("", [], []),
    ('""', [], [0, 0]),
    ("ÅÄÖ keep", ["keep"], []),  # uppercase åäö are NOT word chars
]


@pytest.mark.parametrize("text,words,quotes", CASES)
def test_tokenize_fixtures(text, words, quotes):
    got = tokenize(text)
    assert got.words == words
    assert got.quotes == quotes


def test_lowercase_mode():
    assert tokenize("Jupiter IS Big", lower_case=True).words == [
        "jupiter", "is", "big",
    ]


def test_stop_words():
    assert is_stop_word("a")  # len<2 always stops (engine.ts:491)
    assert is_stop_word("x", set())
    assert not is_stop_word("the")  # no list configured
    assert is_stop_word("the", {"the"})


def test_remove_stop_words_keeps_quote_tokens():
    got = tokenize('"the sun"', remove_stop_words=True, stop_words={"the"})
    assert got.words == ["sun"]
    # quote positions computed over the filtered stream
    assert got.quotes == [0, 1]


def test_expr_and_udf_match_python(spark):
    texts = [c[0] for c in CASES] + [
        JUPITER_TEXT,
        SATURN_TEXT,
        RANK_STAR[0]["text"],
        'quotes "in the middle" of text',
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        tokenize_expr(F.col("text")).alias("expr_words"),
        tokenize_words_udf(F.col("text")).alias("udf_words"),
    ).collect()
    for t, row in zip(texts, got):
        expected = tokenize(t).words
        assert list(row["expr_words"]) == expected, t
        assert list(row["udf_words"]) == expected, t


def test_expr_matches_python_on_sample_documents(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200)
        .select("text", tokenize_expr(F.col("text")).alias("w"))
    )
    for row in df.collect():
        assert list(row["w"]) == tokenize(row["text"]).words
