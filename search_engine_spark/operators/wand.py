"""Block-max WAND top-k over the delta-encoded blocks table.

Implemented in a later milestone of this round; the exact DataFrame BM25
path (bm25.py) is the correctness baseline it must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def wand_topk(engine, text: str, k: int = 10) -> DataFrame:
    raise NotImplementedError("block-max WAND lands in a later milestone")
