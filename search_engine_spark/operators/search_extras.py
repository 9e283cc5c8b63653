"""Query-side IR extras, each with a DuckDB twin.

Rounds out the engine's query surface beyond the reference's AND/phrase
paths (engine.ts:118-175) with the standard inverted-index query family:

- disjunctive (OR) top-k — the north rule names "conjunctive/disjunctive"
  explicitly; ranked by match count like coordinate-level ranking.
- prefix search — on the persisted index this is a sorted-term range scan
  (``StringStartsWith`` pushes into the parquet term column, which the
  build lays out range-partitioned by term, so it prunes both partitions
  and row groups); here re-expressed over the raw corpus for the oracle.
- proximity search — positional-index use beyond strict adjacency
  (engine.ts:267-284 generalized from gap==1 to gap<=W).
- champion lists (impact-ordered postings) — per-term top-N docs by tf,
  the classic top-k acceleration structure next to block-max WAND;
  built skew-safe with the salted two-stage window (no Zipf head term
  funnels through a single task).

Same contract as ``corpus_queries``: identical aliases on both sides,
integer columns BIGINT-cast on both sides, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .corpus_queries import (
    QUERIES,
    _TOKS_SQL,
    CONJ_TERMS,
    _docs,
    _tokens_df,
)

# --------------------------------------------------------------------------
# disjunctive (OR) top-k: docs matching ANY query term, ranked by how many
# --------------------------------------------------------------------------

OR_TERMS = CONJ_TERMS  # same query set as the AND twin → results contrast


def q_disjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-semantics companion to ``q_conjunctive_search``: a doc qualifies
    when it contains ANY query term; ranking is coordinate-level (number
    of distinct matched terms, descending) with doc_id tie-break. On the
    persisted index this is the same pushed ``term IN (...)`` postings
    scan as AND — only the HAVING filter differs — and the BM25/WAND path
    (operators/wand.py) is the scored version of this shape."""
    toks = _tokens_df(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(OR_TERMS))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
        .orderBy(F.desc("n_matched"), F.asc("doc_id"))
        .limit(100)
    )


_or_in = ", ".join(f"'{t}'" for t in OR_TERMS)
SQL_DISJUNCTIVE_SEARCH = f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched FROM (
  SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
) WHERE term IN ({_or_in})
GROUP BY doc_id ORDER BY n_matched DESC, doc_id ASC LIMIT 100
"""


# --------------------------------------------------------------------------
# prefix search: term LIKE 'pre%' — sorted-term range scan on the index
# --------------------------------------------------------------------------

PREFIX = "s"


def q_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing any term with the given prefix, ranked by how many
    distinct such terms they contain. Scale path: the index build writes
    ``postings`` range-partitioned and sorted by term, so
    ``startswith(term, p)`` compiles to a ``StringStartsWith`` pushed
    filter — a contiguous term-range slice of the table, not a full scan
    (asserted for the IN-scan variant in test_plan_hygiene; same
    mechanism)."""
    toks = _tokens_df(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").startswith(PREFIX))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_prefix_terms"))
        .orderBy(F.desc("n_prefix_terms"), F.asc("doc_id"))
        .limit(100)
    )


SQL_PREFIX_SEARCH = f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_prefix_terms FROM (
  SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
) WHERE term LIKE '{PREFIX}%'
GROUP BY doc_id ORDER BY n_prefix_terms DESC, doc_id ASC LIMIT 100
"""


# --------------------------------------------------------------------------
# proximity search: two terms within W positions (positional index, gap<=W)
# --------------------------------------------------------------------------

PROX_TERMS = ("sort", "merge")
PROX_WINDOW = 3  # |pos(a) - pos(b)| <= 3  →  up to 2 intervening tokens


def q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered proximity: both terms present with some occurrence pair
    within PROX_WINDOW positions. Same per-doc position-list aggregation
    as the phrase operator (one shuffle over the two terms' postings —
    the quote-group aggregation in search.py generalizes the same way:
    the adjacency shift becomes a window predicate), then a nested
    ``exists`` over the two position arrays — JVM higher-order functions,
    no Python. Oracle mirrors it as a bounded-gap regex on the
    whitespace-normalized text (exact for this tokenizer; quote-free docs
    guard as in phrase_search)."""
    docs = _docs(spark, sf_dir).filter(~F.col("text").contains('"'))
    from ..functions.tokenizer import tokenize_expr

    toks = docs.select(
        "doc_id", tokenize_expr(F.col("text"), lower_case=True).alias("toks")
    )
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).filter(F.col("term").isin(list(PROX_TERMS)))
    agg = pos.groupBy("doc_id").agg(
        F.collect_list(
            F.when(F.col("term") == PROX_TERMS[0], F.col("pos"))
        ).alias("p0"),
        F.collect_list(
            F.when(F.col("term") == PROX_TERMS[1], F.col("pos"))
        ).alias("p1"),
    )
    near = F.exists(
        F.col("p0"),
        lambda x: F.exists(F.col("p1"), lambda y: F.abs(y - x) <= PROX_WINDOW),
    )
    return agg.filter(near).select("doc_id").orderBy("doc_id")


_w = "[a-z0-9_åäö]+"
_gap = f"([ ]+{_w}){{0,{PROX_WINDOW - 1}}}[ ]+"
SQL_PROXIMITY_SEARCH = f"""
SELECT doc_id FROM documents
WHERE NOT contains(text, '"')
  AND regexp_matches(
        regexp_replace(lower(text), '[^a-z0-9_åäö" \t\n]', ' ', 'g'),
        '(^|[ ])({PROX_TERMS[0]}{_gap}{PROX_TERMS[1]}|{PROX_TERMS[1]}{_gap}{PROX_TERMS[0]})([ ]|$)')
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# champion lists: per-term top-N docs by tf (impact-ordered postings)
# --------------------------------------------------------------------------

CHAMP_N = 5
CHAMP_TERMS = 100  # restrict to the top-df slice of the vocabulary
CHAMP_SALTS = 8


def q_champion_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered postings (champion lists): for each of the top-df
    CHAMP_TERMS terms, the CHAMP_N highest-tf docs. At 100 TB a
    ``row_number() OVER (PARTITION BY term)`` funnels a Zipf head term's
    entire posting list through one task, so stage 1 ranks within
    (term, doc_id % CHAMP_SALTS) — bounded parallel slices — and stage 2
    re-ranks the ≤ N·CHAMP_SALTS survivors (exact: a global top-N row is
    top-N within its salt slice). The term restriction broadcasts."""
    toks = _tokens_df(spark, sf_dir)
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    top_terms = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(CHAMP_TERMS)
        .select("term")
    )
    cand = tf.join(F.broadcast(top_terms), "term")
    order = [F.desc("tf"), F.asc("doc_id")]
    stage1 = Window.partitionBy("term", F.col("doc_id") % CHAMP_SALTS).orderBy(*order)
    stage2 = Window.partitionBy("term").orderBy(*order)
    return (
        cand.withColumn("rk", F.row_number().over(stage1))
        .filter(F.col("rk") <= CHAMP_N)
        .drop("rk")
        .withColumn("rk", F.row_number().over(stage2).cast("long"))
        .filter(F.col("rk") <= CHAMP_N)
        .select("term", "rk", "doc_id", "tf")
        .orderBy("term", "rk")
    )


SQL_CHAMPION_LISTS = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
  ) GROUP BY doc_id, term
), top_terms AS (
  SELECT term FROM (
    SELECT term, count(*) AS df FROM tf GROUP BY term
    ORDER BY df DESC, term ASC LIMIT {CHAMP_TERMS}
  )
)
SELECT term, rk, doc_id, tf FROM (
  SELECT term, doc_id, tf,
         CAST(row_number() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id ASC
         ) AS BIGINT) AS rk
  FROM tf WHERE term IN (SELECT term FROM top_terms)
) WHERE rk <= {CHAMP_N} ORDER BY term, rk
"""


EXTRA_QUERIES = {
    "disjunctive_search": (q_disjunctive_search, SQL_DISJUNCTIVE_SEARCH),
    "prefix_search": (q_prefix_search, SQL_PREFIX_SEARCH),
    "proximity_search": (q_proximity_search, SQL_PROXIMITY_SEARCH),
    "champion_lists": (q_champion_lists, SQL_CHAMPION_LISTS),
}

QUERIES.update(EXTRA_QUERIES)
