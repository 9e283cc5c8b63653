"""Snippet ("introduction") construction, quirk-faithful (Q13).

Re-expresses ``constructIntroduction`` (/root/reference/src/engine.ts:291-374)
as an Arrow-batched pandas UDF over the final top-k rows only — matching
the reference's fetch-after-slice (engine.ts:141-150), so the heavy
``words`` arrays are touched for <= maxCount pages.

Semantics: collect the page positions of quoted phrases first (phrase
start from the adjacency intersection with maxCount=1, engine.ts:283, then
consecutive follow positions via the growing-array quirk engine.ts:325-327),
splice quoted word slots out of the plain indices with the reference's
splice(start, END-AS-DELETE-COUNT) confusion (engine.ts:331-333), merge,
sort ascending, then emit ±2-token context windows around runs with ``"``
around matched runs and ``...`` between gaps.

Known deviation (documented): when a quote pair has NO occurrence on the
page (possible only when another quote matched, or via the single-lookup-
word predicate skip, engine.ts:398-404), the reference pushes NaN indices
whose sort position is unspecified in JS; we drop them. No reference test
exercises that path.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence


def adjacent_intersection(position_lists: Sequence[Sequence[int]]) -> list[int]:
    """First position where the word sequence occurs adjacently.

    Reference ``adjecentWordIndicesIntersection`` (engine.ts:267-284):
    shift list j by -j, then k-way intersect with maxCount=1 — i.e. the
    smallest common shifted position, as a 0/1-element list. The
    single-list fast path returns the first element (engine.ts:398-404).
    """
    if len(position_lists) == 0:
        return []
    shifted = [
        {p - j for p in arr} for j, arr in enumerate(position_lists)
    ]
    if len(shifted) == 1:
        first = sorted(shifted[0])
        return first[:1]
    common = set.intersection(*shifted)
    return [min(common)] if common else []


def construct_introduction(
    query_words: Sequence[str],
    quotes: Sequence[int],
    page_words: Sequence[str],
) -> str:
    """Exact re-expression of engine.ts:291-374 (see module docstring)."""
    # full positional index of the page for the query words
    page_index: dict[str, list[int]] = {}
    for i, w in enumerate(page_words):
        page_index.setdefault(w.lower(), []).append(i)

    indices: list[list[int]] = [
        list(page_index.get(w.lower(), [])) for w in query_words
    ]

    # quoted phrase positions first (kept separate)
    quoted_indices: list[list[Optional[int]]] = []
    for i in range(0, len(quotes), 2):
        end = quotes[i + 1] if i + 1 < len(quotes) else None
        q_idx = indices[quotes[i]:end]
        intersection: list[Optional[int]] = list(
            adjacent_intersection(q_idx)
        )
        # engine.ts:325-327 — extend by +1 into the growing array
        for j in range(0, len(q_idx) - 1):
            prev = intersection[j] if j < len(intersection) else None
            intersection.append(None if prev is None else prev + 1)
        quoted_indices.append(intersection)

    # engine.ts:331-333 — splice(start, deleteCount=quote END index) quirk
    for i in range(0, len(quotes), 2):
        start = quotes[i]
        if i + 1 < len(quotes):
            del indices[start:start + quotes[i + 1]]
        else:
            del indices[start:]

    merged: list[Optional[int]] = []
    for arr in quoted_indices:
        merged.extend(arr)
    for arr in indices:
        merged.extend(arr)
    arr = sorted(x for x in merged if x is not None)  # documented deviation

    out: list[str] = []

    def push_at(idx: int) -> None:
        if 0 <= idx < len(page_words) and page_words[idx]:
            out.append(page_words[idx])

    for ai, idx in enumerate(arr):
        is_first = ai == 0 or idx != arr[ai - 1] + 1
        is_last = ai == len(arr) - 1 or idx != arr[ai + 1] - 1
        if is_first:
            push_at(idx - 2)
            push_at(idx - 1)
            out.append('"-')
        push_at(idx)
        if is_last:
            out.append('-"')
            push_at(idx + 1)
            push_at(idx + 2)
        if ai < len(arr) - 1 and abs(idx - arr[ai + 1]) > 1:
            out.append("...")

    return re.sub('("- | -")', '"', " ".join(out))


# The Arrow UDF that evaluates construct_introduction lives in
# scoring.make_score_intro_udf — snippets share the scorer's single
# Python-worker stage over the <=100 candidates (one round-trip/query).
