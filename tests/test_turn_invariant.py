"""input_hint invariant: per-turn text equality under stable turn order.

Every indexed doc must map 1:1 to a source transcript turn by
(conv_id, turn_idx): url = conv_id#turn_idx, words = tokenize(title +
' ' + text) of exactly that turn, and doc_id order = (conv_id, turn_idx)
order — i.e. the build never reorders, drops, duplicates, or mutates a
turn's text.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig  # noqa: E402
from search_engine_spark.functions.tokenizer import tokenize_expr  # noqa: E402
from search_engine_spark.operators.index_build import build_index  # noqa: E402
from search_engine_spark.sources.transcripts import (  # noqa: E402
    corpus_from_transcripts,
    synthesize_transcripts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_per_turn_text_equality(spark, tmp_path):
    tx = synthesize_transcripts(spark, f"{SF_DIR}/documents.parquet")
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus_from_transcripts(tx), idx, config=cfg, segments=3)

    docs = spark.read.parquet(f"{idx}/docs")
    n_tx = tx.count()
    assert docs.count() == n_tx  # no drops, no duplicates

    joined = docs.join(tx, ["conv_id", "turn_idx"], "inner")
    assert joined.count() == n_tx  # 1:1 by the turn key

    expected_words = tokenize_expr(
        F.concat_ws(
            " ",
            F.concat_ws(":", F.col("role"), F.coalesce(F.col("tool"), F.lit(""))),
            F.col("text"),
        )
    )
    bad = joined.filter(
        (F.col("words") != expected_words)
        | (F.col("url") != F.concat_ws("#", "conv_id", "turn_idx"))
    ).count()
    assert bad == 0  # per-turn text (via its token stream) is preserved

    # doc_id order == stable (conv_id, turn_idx) order
    order_breaks = (
        docs.select("doc_id", "conv_id", "turn_idx")
        .withColumn(
            "rank_by_key",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("conv_id", "turn_idx")
            ),
        )
        .filter(F.col("doc_id") != F.col("rank_by_key"))
        .count()
    )
    assert order_breaks == 0
