"""Block-max WAND top-k over the delta-encoded blocks table.

The scale path for disjunctive top-k the reference cannot express (its
top-k early exit, /root/reference/src/engine.ts:391-431, streams postings
best-first in a single thread). Here the same "stop before scoring
everything" idea becomes *block-level pruning* — a batch-friendly,
deterministic re-statement of Block-Max WAND (Ding & Suel, SIGIR'11):

1. driver-side (tiny): per-term idf from ``term_stats`` and per-term upper
   bound ``ub_t = idf_t * (k1+1) * max(block_max_partial)`` via an algebraic
   ``groupBy(term).max`` over the term-pruned blocks scan (map-side combine
   absorbs head-term skew; result is |query terms| rows).
2. threshold seed: decode each term's top ``seed_blocks`` blocks by block
   upper bound, exact-score those docs, take the k-th best score as θ.
   θ is only a *lower bound* for pruning — correctness never depends on
   how good it is.
3. prune: a block of term t survives iff
   ``idf_t*(k1+1)*block_max_partial + Σ_{t'≠t} ub_{t'} ≥ θ``.
   Proof a top-k doc d survives: for t* = argmax contribution c_t(d), the
   block holding d for t* has ub ≥ c_{t*}(d) and the Σ-other bound covers
   the rest, so its bound ≥ score(d) ≥ θ. Pure Column filter, no shuffle.
4. decode surviving blocks (vectorized Arrow UDF, np.cumsum of deltas) →
   distinct candidate doc_ids.
5. exact BM25 on candidates only — same deterministic term-ordered fold as
   bm25.py, so ranks AND scores are bit-identical to the exhaustive path
   (tested), just computed over far fewer docs.

At 10^12 turns every step is either a term-pruned scan, an algebraic agg,
a literal filter, or a candidate-bounded join — nothing materializes a
full posting list on the driver.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .bm25 import query_terms


def decode_doc_ids_udf():
    """Arrow UDF: (first_doc, doc_deltas) -> array of absolute doc_ids.

    deltas[0] is always 0 (first_doc carried separately, index_build.py),
    so ids = first_doc + cumsum(deltas). Vectorized per Arrow batch.
    """
    import numpy as np

    @pandas_udf("array<long>")
    def decode(first_doc: pd.Series, deltas: pd.Series) -> pd.Series:
        out = []
        for fd, ds in zip(first_doc.to_numpy(), deltas):
            arr = np.asarray(ds, dtype="int64")
            out.append((fd + np.cumsum(arr)).tolist())
        return pd.Series(out)

    return decode


def _exact_scores(engine, terms: list[str], candidates: DataFrame,
                  stats: DataFrame) -> DataFrame:
    """Exact BM25 for the candidate doc_ids — identical expression tree to
    bm25.bm25_topk so WAND results are bit-identical to the exhaustive
    path (deterministic term-ordered fold)."""
    cfg = engine.config
    k1 = F.lit(cfg.bm25_k1)
    b = F.lit(cfg.bm25_b)
    n_docs = F.lit(float(engine.corpus_stats["n_docs"]))
    avgdl = F.lit(float(engine.corpus_stats["avgdl"]) or 1.0)

    p = engine.postings.filter(F.col("term").isin(terms))
    p = p.join(F.broadcast(stats), "term")
    p = p.join(candidates.hint("broadcast"), "doc_id")

    idf = F.log(F.lit(1.0) + (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (F.lit(1.0) - b + b * F.col("dl") / avgdl)
    score = (idf * tf * (k1 + F.lit(1.0)) / norm).alias("s")

    return (
        p.select("doc_id", "term", score)
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )


def wand_topk(engine, text: str, k: int = 10, seed_blocks: int = 2,
              conjunctive: bool = False) -> DataFrame:
    """Block-max-pruned BM25 top-k. Returns (doc_id, score, n_terms)
    ordered (score desc, doc_id asc) — rank- and score-identical to
    ``bm25.bm25_topk`` (tested)."""
    spark = engine.spark
    terms = query_terms(engine, text)
    empty = "doc_id long, score double, n_terms int"
    if not terms:
        return spark.createDataFrame([], empty)

    cfg = engine.config
    k1 = cfg.bm25_k1
    n = float(engine.corpus_stats["n_docs"])

    stats = (
        engine.term_stats()
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    blocks = engine.blocks().filter(F.col("term").isin(terms))

    # -- step 1: per-term stats + upper bounds (driver-side, |terms| rows) --
    stats_map = getattr(engine, "_stats_map", None)
    bmax_map = getattr(engine, "_block_max_map", None)
    if stats_map is not None and bmax_map is not None:
        # warmed: both maps pinned vocab-sized at warm() — no per-query
        # stats job at all
        df_map = {t: stats_map[t] for t in terms if t in stats_map}
        term_max = {t: bmax_map[t] for t in terms if t in bmax_map}
    else:
        # cold: ONE collect — stats and block maxima join before hitting
        # the driver
        per_term = (
            blocks.groupBy("term")
            .agg(F.max("block_max_partial").alias("mx"))
            .join(stats, "term")
            .collect()
        )
        df_map = {r["term"]: r["df"] for r in per_term}
        term_max = {r["term"]: r["mx"] for r in per_term}
    present = [t for t in terms if t in df_map and t in term_max]
    if not present:
        return spark.createDataFrame([], empty)

    def idf(t: str) -> float:
        d = df_map[t]
        return math.log(1.0 + (n - d + 0.5) / (d + 0.5))

    ub = {t: idf(t) * (k1 + 1.0) * term_max[t] for t in present}
    sum_other = {t: sum(v for u, v in ub.items() if u != t) for t in present}

    decode = decode_doc_ids_udf()

    # -- step 2: threshold seed from each term's top blocks ----------------
    block_ub = (
        F.col("block_max_partial") * _idf_expr(df_map, n) * F.lit(k1 + 1.0)
    )
    seed = (
        blocks.withColumn("ub", block_ub)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("term").orderBy(
                    F.desc("ub"), F.asc("first_doc")
                )
            ),
        )
        .filter(F.col("rn") <= seed_blocks)
        .select("first_doc", "doc_deltas")
    )
    seed_ids = seed.select(
        F.explode(decode("first_doc", "doc_deltas")).alias("doc_id")
    ).distinct()
    seed_scores = _exact_scores(engine, present, seed_ids, stats)
    if conjunctive:
        # θ must lower-bound the *conjunctive* k-th score, which can sit
        # below the disjunctive one — seed with the same filter applied
        seed_scores = seed_scores.filter(F.col("n_terms") == len(present))
    kth = (
        seed_scores.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = kth[-1]["score"] if len(kth) >= k else 0.0

    # -- step 3: block pruning (pure filter, literal per-term thresholds) --
    # survive iff block_max_partial >= (theta - sum_other[t]) / (idf_t*(k1+1))
    expr = None
    for t in present:
        c = (theta - sum_other[t]) / (idf(t) * (k1 + 1.0))
        cond = (F.col("term") == t) & (F.col("block_max_partial") >= F.lit(c))
        expr = cond if expr is None else (expr | cond)
    survivors = blocks.filter(expr)

    # -- step 4: decode -> candidates; step 5: exact score ----------------
    cand = survivors.select(
        F.explode(decode("first_doc", "doc_deltas")).alias("doc_id")
    ).distinct()
    scored = _exact_scores(engine, present, cand, stats)
    if conjunctive:
        scored = scored.filter(F.col("n_terms") == len(present))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _idf_expr(df_map: dict, n: float):
    """Literal when/otherwise chain mapping term -> idf (few query terms)."""
    expr = F.lit(0.0)
    for t, d in df_map.items():
        expr = F.when(
            F.col("term") == t,
            F.lit(math.log(1.0 + (n - d + 0.5) / (d + 0.5))),
        ).otherwise(expr)
    return expr
