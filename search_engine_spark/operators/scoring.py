"""Reference heuristic scoring (Q8-Q10), quirk-faithful.

Re-expresses ``scorePages`` (/root/reference/src/engine.ts:158-243) as an
Arrow-batched pandas UDF over the (<=100-row) candidate set — the reference
likewise scores only the post-intersection candidates, fetching each page.

Quirks deliberately reproduced for rank-identity (SURVEY.md §7.4):

1. ``urlMatch`` builds its regex from the STRING ``'(?![\\w\\d])'`` where
   ``\\w``/``\\d`` are not string escapes, so the effective pattern is
   ``(?![wd])word(?![wd])`` with the 'i' flag — the lookaheads reject the
   letters w/W/d/D themselves (engine.ts:200-202, the `// prettier-ignore`
   line).
2. Title "match" counting is query-position alignment: query word i matches
   iff the FIRST occurrence of that word in the page's full token stream
   equals i (title tokens come first because pages index
   ``title + ' ' + text``, engine.ts:54,174-179).
3. ``pos`` uses case-sensitive ``indexOf`` of the raw query word against
   LOWERCASED title tokens (capitalized query words never position-match),
   and JS default ``.sort()`` — lexicographic, so [2,10] sorts to [10,2]
   (engine.ts:186-189).
4. Score 0 for every page when no scoreWeights are configured
   (engine.ts:211-213); ties always break by ascending doc id
   (engine.ts:238 — "lower pages is better").
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ScoreWeights
from ..functions.tokenizer import tokenize


@lru_cache(maxsize=65536)
def _title_tokens(title: str) -> tuple[str, ...]:
    """Lowercased title token tuple — a pure function of the title
    string, cached because the scorer sees the same ≤100 candidate
    titles on every repeat of a hot query (serve tier) and per Arrow
    batch (Spark tier). Tuple, so the cache can never be mutated."""
    return tuple(tokenize(title, lower_case=True).words)


@lru_cache(maxsize=65536)
def _url_pattern(word: str):
    """Compiled quirk-1 url regex for one query word (the word is
    inserted RAW, exactly like the reference's template string — a word
    that happens to be an invalid regex raises, as engine.ts would)."""
    return re.compile("(?![wd])" + word + "(?![wd])", re.IGNORECASE)


def score_page(
    query_words: Sequence[str],
    weights: Optional[ScoreWeights],
    title: str,
    url: str,
    page_words: Sequence[str],
) -> float:
    """Score one page exactly like ``getScore`` (engine.ts:211-223).

    ``query_words`` is the stop-word-filtered query word list in original
    case (``wordsWithoutStopWords``, engine.ts:109-111,138).

    The reference builds a full first-occurrence map of the page stream
    and counts query positions i whose word first occurs AT i
    (engine.ts:174-185). ``first_occ[w] == i`` holds iff
    ``page_words[i].lower() == w`` and w does not appear among the
    lowered ``page_words[:i]`` — both conditions touch only the first
    ``len(query_words)`` page tokens, so the scan below over that prefix
    is exactly equivalent to the reference's whole-page map (the
    describe-block suites pin rank identity) at O(|query|²) instead of
    O(|page|) per candidate.
    """
    if weights is None:
        return 0.0

    n_q = len(query_words)
    prefix = [w.lower() for w in page_words[:n_q]]
    matches = 0
    for i, w in enumerate(query_words):
        lw = w.lower()
        if i < len(prefix) and prefix[i] == lw and lw not in prefix[:i]:
            matches += 1

    title_words = _title_tokens(title)
    exact = matches == len(title_words)
    begins = matches > 0
    # quirk 3: case-sensitive indexOf + lexicographic sort
    pos_list = sorted(
        (title_words.index(w) for w in query_words if w in title_words),
        key=str,
    )
    pos = pos_list[0] if pos_list else None

    score = 0.0
    if exact:
        score += weights.title_exact_match
    elif begins:
        score += weights.title_begins
    elif pos is not None and pos < 3:
        score += weights.title_contains_in_beginning

    # quirk 1: the effective (buggy) url pattern, case-insensitive
    n_match = sum(
        1 for w in query_words if _url_pattern(w).search(url)
    )
    if n_match >= len(query_words):
        score += weights.url_contains
    return score


def make_score_intro_udf(
    query_words: Sequence[str],
    all_words: Sequence[str],
    quotes: Sequence[int],
    weights: Optional[ScoreWeights],
):
    """ONE Arrow-batched UDF ``(title, url, words) -> struct<score,
    introduction>`` fusing Q8-Q10 scoring with Q13 snippet construction.

    Candidates are <=100 rows (intersection cap, engine.ts:134) in a
    single partition, so this is one Python-worker round-trip per query;
    the previous two-stage plan (score UDF -> sort/limit -> snippet UDF)
    paid a second Arrow stage (~0.4-0.5 s measured) to snippet 10 rows
    instead of 100 — per-row snippet cost is microseconds, the stage
    setup was the cost. ``query_words`` is the stop-filtered list the
    scorer sees (engine.ts:109-111,138); ``all_words``/``quotes`` are the
    full parse the snippet builder needs (positions must line up,
    engine.ts:291-374)."""
    from .snippets import construct_introduction

    qw = list(query_words)
    aw, qt = list(all_words), list(quotes)
    out_schema = T.StructType(
        [
            T.StructField("score", T.DoubleType()),
            T.StructField("introduction", T.StringType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _score_intro(
        batches: Iterator[tuple[pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        for title, url, words in batches:
            rows = [
                (
                    score_page(qw, weights, t, u, list(w)),
                    construct_introduction(aw, qt, list(w)),
                )
                for t, u, w in zip(title, url, words)
            ]
            yield pd.DataFrame(rows, columns=["score", "introduction"])

    return _score_intro


def make_batch_score_intro_udf(
    specs: dict,
    weights: Optional[ScoreWeights],
):
    """Batch-query variant of :func:`make_score_intro_udf`: ONE Arrow UDF
    ``(qid, title, url, words) -> struct<score, introduction>`` serving
    every query of a batch — the per-row query spec is looked up by qid
    from the closed-over dict (a few small lists per query, shipped once
    per task in the closure, never per row).

    ``specs``: qid -> (lookup_words, all_words, quotes), exactly the three
    sequences the single-query UDF closes over.
    """
    from .snippets import construct_introduction

    frozen = {
        int(qid): (list(lk), list(aw), list(qt))
        for qid, (lk, aw, qt) in specs.items()
    }
    out_schema = T.StructType(
        [
            T.StructField("score", T.DoubleType()),
            T.StructField("introduction", T.StringType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _batch_score_intro(
        batches: Iterator[
            tuple[pd.Series, pd.Series, pd.Series, pd.Series]
        ]
    ) -> Iterator[pd.DataFrame]:
        for qid, title, url, words in batches:
            rows = []
            for q, t, u, w in zip(qid, title, url, words):
                lk, aw, qt = frozen[int(q)]
                rows.append(
                    (
                        score_page(lk, weights, t, u, list(w)),
                        construct_introduction(aw, qt, list(w)),
                    )
                )
            yield pd.DataFrame(rows, columns=["score", "introduction"])

    return _batch_score_intro
