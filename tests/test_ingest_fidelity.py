"""Ingest-fidelity parity: the reference demo's malformed-row skip rule
(demo.ts:118-122), always-on URL uniqueness (engine.ts:56-58), and
warm/serve-mode result parity for the fused query path."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig, ScoreWeights
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.sources.transcripts import (
    corpus_from_transcripts,
    is_wellformed,
)
from conftest import build_fixture_engine, corpus_df, urls
from fixtures_data import PLANETS


def _tx(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_malformed_rows_skipped(spark):
    """demo.ts:118-122: skip when text empty/null, key missing, text
    contains '|', or text starts with ']'."""
    rows = [
        ("c1", 0, "user", "a good turn", None, None),
        ("c1", 1, "user", "bad | pipe", None, None),
        ("c1", 2, "user", "]bad bracket", None, None),
        ("c1", 3, "user", "", None, None),
        ("c1", 4, "user", None, None, None),
        (None, 5, "user", "missing key", None, None),
        ("c2", 0, "user", "pipe ] inside is fine if not leading", None, None),
    ]
    corpus = corpus_from_transcripts(_tx(spark, rows))
    kept = sorted(r["text"] for r in corpus.collect())
    assert kept == ["a good turn", "pipe ] inside is fine if not leading"]
    # opt-out keeps every row, like calling engine.add directly
    raw = corpus_from_transcripts(_tx(spark, rows), malformed_filter=False)
    assert raw.count() == len(rows)


def test_is_wellformed_counts_skips(spark):
    rows = [
        ("c1", 0, "user", "ok", None, None),
        ("c1", 1, "user", "no | good", None, None),
    ]
    df = _tx(spark, rows)
    n_skipped = df.filter(
        ~is_wellformed(F.col("text"), F.col("conv_id"))
    ).count()
    assert n_skipped == 1


def test_duplicate_url_raises_by_default(spark, tmp_path):
    """engine.ts:56-58 throws unconditionally on a duplicate url; the
    builder's uniqueness guard is now default-on."""
    fixture = PLANETS + [dict(PLANETS[0], rank=7)]  # same url twice
    with pytest.raises(ValueError, match="already in index"):
        build_index(
            spark,
            corpus_df(spark, fixture),
            str(tmp_path / "dup_idx"),
            mode="reference",
            segments=1,
        )
    # explicit opt-out (e.g. pre-validated 100 TB ingest) skips the check
    build_index(
        spark,
        corpus_df(spark, PLANETS),
        str(tmp_path / "ok_idx"),
        mode="reference",
        segments=1,
        check_unique_urls=False,
    )


def test_warm_serve_parity(spark, tmp_path):
    """The warmed fused broadcast-join path and serve_mode conf flips must
    return results identical to the cold path (ADVICE.md)."""
    config = EngineConfig(
        score_weights=ScoreWeights(
            title_exact_match=10,
            title_begins=5,
            title_contains_in_beginning=1,
            url_contains=1,
        )
    )
    engine = build_fixture_engine(
        spark, PLANETS, tmp_path / "idx", config=config
    )
    queries = [
        "brightest",
        "planet sixth",
        '"the Sun" sixth',
        "zz_no_such_term",
        "of",  # stop-word-only -> empty
    ]
    cold = {
        q: [tuple(r) for r in engine.search(q).collect()] for q in queries
    }
    engine.warm().serve_mode(True)
    # double-enable must not clobber the saved build conf (ADVICE.md)
    engine.serve_mode(True)
    try:
        for q in queries:
            got = [tuple(r) for r in engine.search(q).collect()]
            assert got == cold[q], f"warm/cold mismatch for {q!r}"
    finally:
        engine.serve_mode(False)
    # restore must bring back the original build-time conf
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_warm_without_doc_pin_matches(spark, tmp_path):
    """pin_docs=False (the 100 TB mode) keeps the cold fetch-after-slice
    doc path; results must be unchanged."""
    engine = build_fixture_engine(spark, PLANETS, tmp_path / "idx")
    cold = [tuple(r) for r in engine.search("planet sixth").collect()]
    engine.warm(pin_docs=False)
    assert [tuple(r) for r in engine.search("planet sixth").collect()] == cold
