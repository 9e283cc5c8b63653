import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.config import EngineConfig  # noqa: E402
from search_engine_spark.operators.index_build import build_index  # noqa: E402
from search_engine_spark.operators.search import SearchEngine  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def corpus_df(spark, fixture: list[dict]):
    """Fixture corpus -> DataFrame with explicit rank + arrival order."""
    rows = [
        (d["url"], d["title"], d["text"], d["rank"], i)
        for i, d in enumerate(fixture)
    ]
    return spark.createDataFrame(
        rows, "url string, title string, text string, rank long, arrival long"
    )


def build_fixture_engine(
    spark, fixture, tmp_dir, config: EngineConfig = EngineConfig(), segments: int = 2
) -> SearchEngine:
    build_index(
        spark,
        corpus_df(spark, fixture),
        str(tmp_dir),
        config=config,
        mode="reference",
        segments=segments,
    )
    return SearchEngine(spark, str(tmp_dir), config=config)


def urls(result_df) -> list[str]:
    return [r["url"] for r in result_df.collect()]


def intros(result_df) -> list[str]:
    return [r["introduction"] for r in result_df.collect()]
