"""Driver-checkable twins for the serving tier (serving/local.py).

Each entry builds a REAL persisted index over the driver's ``documents``
table (Spark build, cached per sf_dir), serves the query through
:class:`..serving.local.LocalIndexReader` — pyarrow reads, no Spark job
in the query path — and returns the rows as a DataFrame so the driver
can hash-compare them against the SAME ANSI-SQL oracles the index-free
declarative twins use (SQL_CONJUNCTIVE_SEARCH / SQL_BM25_TOPK in
corpus_queries.py). This puts the serving tier itself, not just the
Spark paths it mirrors, behind the DuckDB correctness gate.

Corpus mapping: url = the documents table's doc_id (stringified,
unique), title = '' (tokens then equal the text's tokens), ordered by
doc_id so the dense index ids 1..n enumerate documents in doc_id order;
results map back through the url column.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig

# one persisted index per sf_dir per process — the build is the setup
# cost, every entry after the first reuses it (same lifecycle as the
# bench's index_dir). The atexit hook removes the temp dirs when the
# process ends, so repeated sweeps in long-lived sessions don't
# accumulate orphan index dirs under /tmp; ``teardown_serve_indexes``
# is the explicit variant for harnesses that want it sooner.
_INDEX_CACHE: dict[str, str] = {}
_URL_MAP_CACHE: dict[str, dict] = {}


def teardown_serve_indexes() -> None:
    """Delete every cached serve-tier index dir and drop the caches."""
    import shutil

    for idx in _INDEX_CACHE.values():
        shutil.rmtree(idx, ignore_errors=True)
    _INDEX_CACHE.clear()
    _URL_MAP_CACHE.clear()


_atexit_registered = False


def _serve_index(spark: SparkSession, sf_dir: str) -> str:
    idx = _INDEX_CACHE.get(sf_dir)
    if idx is not None:
        return idx
    global _atexit_registered
    if not _atexit_registered:
        import atexit

        atexit.register(teardown_serve_indexes)
        _atexit_registered = True
    from .index_build import build_index

    idx = tempfile.mkdtemp(prefix="serve_tier_idx_")
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit("").alias("title"),
        "text",
        "doc_id",
    )
    build_index(
        spark, corpus, idx, config=EngineConfig(),
        order_cols=("doc_id",), segments=2,
    )
    _INDEX_CACHE[sf_dir] = idx
    return idx


def _url_map(idx: str) -> dict:
    """index doc_id → original documents doc_id (via the url column),
    read without Spark like any serving-node lookup table; cached per
    index dir (the indexes themselves are process-cached and
    immutable)."""
    cached = _URL_MAP_CACHE.get(idx)
    if cached is not None:
        return cached
    import pyarrow.dataset as ds

    t = ds.dataset(f"{idx}/docs", format="parquet", partitioning="hive").to_table(
        columns=["doc_id", "url"]
    )
    out = {
        int(d): int(u)
        for d, u in zip(t["doc_id"].to_pylist(), t["url"].to_pylist())
    }
    _URL_MAP_CACHE[idx] = out
    return out


def q_serve_tier_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-tier conjunctive candidates ≡ SQL_CONJUNCTIVE_SEARCH: first
    100 docs (doc_id asc) containing every CONJ_TERM, answered by the
    parity search path (score 0.0 under no weights → doc_id order)."""
    from ..serving import LocalIndexReader
    from .corpus_queries import CONJ_TERMS

    idx = _serve_index(spark, sf_dir)
    reader = LocalIndexReader(idx)
    pdf = reader.search(" ".join(CONJ_TERMS), max_count=100)
    url_of = _url_map(idx)
    ids = sorted(url_of[int(d)] for d in pdf["doc_id"])
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def q_serve_tier_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-tier Block-Max WAND ≡ SQL_BM25_TOPK — the COLD reader
    (pin_postings=False) answering through block-metadata pruning +
    candidate-bounded exact rescoring (serving/local.py wand_topk), hashed
    against the SAME exhaustive-BM25 oracle as q_serve_tier_bm25. k=∞
    (θ=0, no block pruned) so boundary ties resolve exactly like the
    oracle's ORDER BY round(...) — the driver thus gates the WAND
    decode/rescore/fold path; the θ>0 PRUNING losslessness is gated by
    tests/test_serving_wand.py and evidenced in the bench's serve-tier
    wand point."""
    import math

    from ..serving import LocalIndexReader
    from .corpus_queries import CONJ_TERMS

    idx = _serve_index(spark, sf_dir)
    reader = LocalIndexReader(idx, pin_postings=False)
    pdf = reader.wand_topk(" ".join(CONJ_TERMS), k=1 << 62)
    url_of = _url_map(idx)
    rows = [
        (
            url_of[int(r.doc_id)],
            math.floor(float(r.score) * 1e6 + 0.5) / 1e6,
            int(r.n_terms),
        )
        for r in pdf.itertuples(index=False)
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        rows[:100], "doc_id long, score double, n_terms long"
    )


def q_serve_tier_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-tier BM25 ≡ SQL_BM25_TOPK: disjunctive top-100 over
    CONJ_TERMS. Ranked over the FULL match set, then rounded to 6
    decimals (half-up, like F.round/duckdb round) and re-sorted on the
    rounded score so boundary ties resolve exactly like the oracle's
    ORDER BY round(...) DESC, doc_id ASC."""
    import math

    from ..serving import LocalIndexReader
    from .corpus_queries import CONJ_TERMS

    idx = _serve_index(spark, sf_dir)
    reader = LocalIndexReader(idx)
    pdf = reader.search_bm25(" ".join(CONJ_TERMS), k=1 << 62)
    url_of = _url_map(idx)
    rows = [
        (
            url_of[int(r.doc_id)],
            math.floor(float(r.score) * 1e6 + 0.5) / 1e6,
            int(r.n_terms),
        )
        for r in pdf.itertuples(index=False)
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        rows[:100], "doc_id long, score double, n_terms long"
    )
