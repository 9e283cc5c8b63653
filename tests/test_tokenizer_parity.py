"""Three-way tokenizer parity: pure-Python ground truth vs JVM Column
expression vs the DuckDB SQL twin used by every oracle check.

The reference tokenizer (/root/reference/src/engine.ts:459-484) is the
root of rank-identity — if any of the three implementations drifts
(JS-vs-Java-vs-RE2 char classes, lowercase ordering, quote padding), every
downstream operator silently diverges. Property-tests the Python impl
against DuckDB per example, and all three in batch over a deterministic
corpus of adversarial strings (SURVEY.md §5: property tests vs the quirk
list).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.functions.tokenizer import (  # noqa: E402
    duckdb_tokenize_sql,
    tokenize,
    tokenize_expr,
    tokenize_words_udf,
)

# alphabet exercising every regex boundary: ASCII words, digits,
# underscore, åäö vs Å/Ä/Ö (only lowercase are word chars), other accented
# letters (never word chars), quotes, JS-whitespace variants (NBSP, BOM,
# ideographic space), punctuation the fixtures hit (´ – —), emoji
ALPHABET = (
    "abcXYZ019_åäöÅÄÖéßñ\"'´–—.,;:!?()[]{}<>|/\\+=*&%$#@^~ \t\n\r"
    "  　﻿\U0001f600"
)


def _duck_tokens(con, text: str, lower_case: bool) -> list[str]:
    sql = duckdb_tokenize_sql("t", lower_case=lower_case)
    row = con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [text]).fetchone()
    return list(row[0]) if row[0] is not None else []


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=ALPHABET, max_size=80), st.booleans())
def test_python_vs_duckdb(text: str, lower: bool):
    con = duckdb.connect()
    try:
        assert tokenize(text, lower_case=lower).words == _duck_tokens(
            con, text, lower
        )
    finally:
        con.close()


def _corpus() -> list[str]:
    rng = random.Random(42)
    texts = [
        "",
        '"',
        '""',
        'a"b',
        ' " lone quote " ',
        "Åland är ön",  # Å stripped, but å/ä/ö kept
        "god´s Haber–Bosch pro_cess",
        'He said "Carl FrieDricH" loudly',
        " 　﻿space zoo ",
        "emoji \U0001f600 mid",
    ]
    for _ in range(200):
        texts.append(
            "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 60)))
        )
    return texts


@pytest.mark.parametrize("lower", [False, True])
def test_three_way_batch(spark, duck, lower):
    texts = _corpus()
    expected = [tokenize(t, lower_case=lower).words for t in texts]

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    via_expr = [
        r["w"]
        for r in df.select(
            tokenize_expr(df["t"], lower_case=lower).alias("w")
        ).collect()
    ]
    assert via_expr == expected, "Column expression drifted from Python"

    if not lower:
        via_udf = [
            r["w"]
            for r in df.select(tokenize_words_udf(df["t"]).alias("w")).collect()
        ]
        assert via_udf == expected, "Arrow UDF drifted from Python"

    via_duck = [_duck_tokens(duck, t, lower) for t in texts]
    assert via_duck == expected, "DuckDB twin drifted from Python"
