"""Engine configuration.

Mirrors the reference's ``EngineProps`` (/root/reference/src/engine.ts:11-15)
plus the scale-path knobs the reference lacks (BM25 params, posting block
size, tokenizer backend).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ScoreWeights:
    """Reference ``RankWeights`` (engine.ts:4-9)."""

    title_exact_match: float = 10.0
    title_begins: float = 5.0
    title_contains_in_beginning: float = 1.0
    url_contains: float = 1.0


# Reference README.md:22-37 / demo.ts:66-81 stop-word configuration.
DEMO_STOP_WORDS = frozenset(
    "a an am and be have i in is of on that the to".split()
)


@dataclass(frozen=True)
class EngineConfig:
    stop_words: frozenset[str] = frozenset()
    score_weights: Optional[ScoreWeights] = None
    # BM25 (scale path; the reference has no tf/df statistics)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    # delta-encoded posting block size for block-max WAND
    block_size: int = 128
    # "expr" = pure Column expressions (whole-stage codegen, default);
    # "arrow" = vectorized pandas UDF. Tested equal.
    tokenizer: str = "expr"
    # parquet codec for every index-table write. zstd measured 2.2x
    # smaller than snappy on this index shape (20 vs 44 MB at 160k
    # turns) at equal build time and query latency — at 100 TB that
    # halves storage AND every scan's I/O for free (BENCH/NOTES.md).
    parquet_codec: str = "zstd"
    # cold-path doc fetch for search(): "pushdown" = collect the <=100
    # candidate ids and push an IN-filter into the docs parquet scan
    # (row-group pruning — the only sane shape on an unbounded table);
    # "fused" = keep the candidates inside ONE plan and broadcast-join
    # docs (no driver roundtrip, no second plan compile — wins while an
    # unpruned docs scan is cheap); "auto" (default) = fused below
    # search.COLD_FUSED_MAX_DOCS docs, pushdown above.
    cold_fetch: str = "auto"
