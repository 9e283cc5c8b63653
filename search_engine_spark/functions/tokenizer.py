"""Tokenizer with exact parity to the reference engine's ``toWords``.

Reference semantics (/root/reference/src/engine.ts:459-484):

1. replace every char not in ``[\\w\\dåäö"\\s]`` (JS classes) with a space
2. pad every ``"`` with spaces so it becomes a standalone token
3. split on single whitespace chars
4. strip residual junk per token (a provable no-op after step 1 — kept in
   the Python reference impl for fidelity)
5. drop empty tokens
6. fold: ``"`` tokens are removed from ``words`` and their positions
   (in the words-only index space: ``index - len(quotes)``) are pushed to
   ``quotes`` as flat ``[start, end)`` pairs

Three implementations are provided, tested equal on all fixtures:

- :func:`tokenize` — pure-Python reference implementation (exact, used for
  driver-side query parsing and as the ground truth in tests)
- :func:`tokenize_words_udf` — Arrow-vectorized pandas UDF
  (``text -> array<string>`` of words, quote tokens dropped)
- :func:`tokenize_expr` — pure Column expression (regexp_replace + split +
  filter); stays inside whole-stage codegen, the default hot path for
  index builds

JS char-class notes (why the explicit classes below):

- JS ``\\w``/``\\d`` are ASCII-only → ``A-Za-z0-9_``. Python's unicode
  ``\\w`` would wrongly keep é, ß, etc.
- ``åäö`` are literal *lowercase* chars in the reference pattern; Å/Ä/Ö are
  NOT word chars (engine.ts:470).
- JS ``\\s`` is the explicit set below (incl. NBSP, BOM, unicode spaces);
  Java/RE2 ``\\s`` is ASCII-only, so the same explicit class is embedded in
  the Spark patterns too.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, NamedTuple, Optional, Sequence

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JS \s, written out explicitly so Python / Java regex / RE2 agree.
WS_CLASS = (
    "\t\n\x0b\x0c\r    -     　﻿"
)
# JS [\w\d] = ASCII word chars; åäö literal (lowercase only), engine.ts:470.
WORD_CLASS = "A-Za-z0-9_åäö"

NONWORD_PATTERN = f'[^{WORD_CLASS}"{WS_CLASS}]'
SPLIT_PATTERN = f"[{WS_CLASS}]"
TOKEN_JUNK_PATTERN = f'[^{WORD_CLASS}"]'

_RE_NONWORD = re.compile(NONWORD_PATTERN)
_RE_SPLIT = re.compile(SPLIT_PATTERN)
_RE_TOKEN_JUNK = re.compile(TOKEN_JUNK_PATTERN)


class Tokens(NamedTuple):
    """Result of :func:`tokenize` — mirrors engine.ts:463 return shape."""

    words: list[str]
    quotes: list[int]  # flat [start, end) pairs in `words` index space


def is_stop_word(word: str, stop_words: Optional[Iterable[str]] = None) -> bool:
    """Reference ``isStopWord`` (engine.ts:490-492): length<2 is ALWAYS a
    stop word, even with no configured stop list."""
    return len(word) < 2 or (stop_words is not None and word in stop_words)


def tokenize(
    text: str,
    lower_case: bool = False,
    remove_stop_words: bool = False,
    stop_words: Optional[set[str]] = None,
) -> Tokens:
    """Exact Python port of the reference tokenizer semantics
    (engine.ts:459-484). ``remove_stop_words`` keeps ``"`` tokens, like the
    reference's ``isOkWord``."""
    s = _RE_NONWORD.sub(" ", text)
    s = s.replace('"', ' " ')
    tokens = _RE_SPLIT.split(s)
    tokens = [_RE_TOKEN_JUNK.sub("", t) for t in tokens]

    def ok(word: str) -> bool:
        if not word:
            return False
        if remove_stop_words:
            return word == '"' or not is_stop_word(word, stop_words)
        return True

    words: list[str] = []
    quotes: list[int] = []
    index = 0  # index within the filtered token stream (quotes included)
    for tok in tokens:
        if not ok(tok):
            continue
        if tok == '"':
            # engine.ts:478: position in words-only space
            quotes.append(index - len(quotes))
        else:
            words.append(tok.lower() if lower_case else tok)
        index += 1
    return Tokens(words, quotes)


def tokenize_expr(col: Column, lower_case: bool = False) -> Column:
    """Column-expression tokenizer: ``string -> array<string>`` of words
    (quote tokens and empties dropped — identical to ``tokenize().words``).

    For the words list the reference semantics collapse to "maximal runs
    of word characters": every non-word char (including ``"`` and all
    whitespace variants) acts as a separator, so ONE split on
    ``[^word]+`` replaces the reference's replace→pad→split→filter chain
    (~30% less regex work on the build hot path; equivalence is
    property-tested three ways in tests/test_tokenizer_parity.py).
    Stays fully JVM-side inside whole-stage codegen.
    """
    arr = F.split(col, f"[^{WORD_CLASS}]+", -1)
    arr = F.filter(arr, lambda w: w != F.lit(""))
    if lower_case:
        arr = F.transform(arr, F.lower)
    return arr


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_words_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-vectorized tokenizer UDF (``text -> array<string>`` of words).

    Alternative hot path per the north star ("tokenize transcript turns
    with a vectorized Arrow UDF"); tested equal to :func:`tokenize_expr`.
    """
    for batch in batches:
        yield batch.map(lambda t: tokenize(t).words if t is not None else None)


def duckdb_tokenize_sql(col_sql: str, lower_case: bool = False) -> str:
    """DuckDB SQL expression producing the same ``array<string>`` of words,
    used by the driver's oracle checks. RE2 char classes match the explicit
    classes above.

    Lowercasing happens AFTER tokenization (per-element), exactly like the
    reference (engine.ts:69) — lowercasing the input first would let
    Å/Ä/Ö survive as å/ä/ö even though uppercase Å/Ä/Ö are NOT word chars
    in the reference pattern (engine.ts:470). Same single-split form as
    :func:`tokenize_expr` (see there for the equivalence argument)."""
    toks = (
        f"list_filter(string_split_regex({col_sql}, '[^{WORD_CLASS}]+'),"
        " w -> w <> '')"
    )
    if lower_case:
        toks = f"list_transform({toks}, w -> lower(w))"
    return toks
