"""Measure IVF ANN recall@10 vs brute-force cosine top-10: k-means-trained
coarse centroids (corpus_queries._ivf_trained_centroids) vs the r02
untrained ones (raw vectors vec_id 1..IVF_NLIST).

Recall is averaged over the first NQ vectors as queries, each excluded
from its own candidate set. One plan per variant (no per-query driver
loop): assignment + probe selection + rerank are all window/groupBy over
the same cross-join frame the operators use at this scale.

Usage: python tools/ivf_recall.py [sf_dir] [n_queries]
Prints one JSON line {"sf_dir", "n_queries", "recall_trained",
"recall_untrained", "nlist", "nprobe"}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.operators.corpus_queries import (
    IVF_NLIST,
    IVF_NPROBE,
    _cos_sim,
    _embeddings,
    _ivf_trained_centroids,
)
from search_engine_spark.session import get_spark


def _topk_sets(df: DataFrame, k: int = 10) -> dict[int, frozenset]:
    """{qid: top-k vec_id set} from a (qid, vec_id, sim) frame."""
    w = Window.partitionBy("qid").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    rows = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("qid")
        .agg(F.collect_set("vec_id").alias("ids"))
        .collect()
    )
    return {int(r["qid"]): frozenset(r["ids"]) for r in rows}


def ivf_sims(emb: DataFrame, cent: DataFrame, queries: DataFrame) -> DataFrame:
    """(qid, vec_id, sim) limited to each query's IVF_NPROBE probed lists —
    the same assign/probe/rerank shape as q_ann_ivf_cosine, for all
    queries in one plan."""
    csims = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _cos_sim(F.col("e"), F.col("c")).alias("csim")
    )
    asn = (
        csims.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("csim").alias("s"), (-F.col("cid")).alias("nc"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.nc")).alias("centroid"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        queries.select(F.col("vec_id").alias("qid"), F.col("e").alias("q"))
        .crossJoin(F.broadcast(cent))
        .select("qid", "cid", _cos_sim(F.col("q"), F.col("c")).alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("qid", F.col("cid").alias("centroid"))
    )
    qv = queries.select(F.col("vec_id").alias("qid"), F.col("e").alias("q"))
    return (
        asn.join(F.broadcast(probes), "centroid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(emb, "vec_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid", "vec_id", _cos_sim(F.col("e"), F.col("q")).alias("sim")
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    queries = emb.filter(F.col("vec_id") < nq)

    brute = (
        queries.select(F.col("vec_id").alias("qid"), F.col("e").alias("q"))
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", _cos_sim(F.col("e"), F.col("q")).alias("sim")
        )
    )
    truth = _topk_sets(brute)

    untrained = F.broadcast(
        emb.filter(F.col("vec_id").between(1, IVF_NLIST)).select(
            F.col("vec_id").cast("long").alias("cid"), F.col("e").alias("c")
        )
    )
    trained_map = _ivf_trained_centroids(spark, sf_dir)
    trained = F.broadcast(
        spark.createDataFrame(
            [(cid, trained_map[cid]) for cid in sorted(trained_map)],
            "cid BIGINT, c array<double>",
        )
    )

    out = {
        "sf_dir": sf_dir,
        "n_queries": nq,
        "nlist": IVF_NLIST,
        "nprobe": IVF_NPROBE,
    }
    for name, cent in (("untrained", untrained), ("trained", trained)):
        got = _topk_sets(ivf_sims(emb, cent, queries))
        rec = [
            len(got.get(q, frozenset()) & truth[q]) / max(1, len(truth[q]))
            for q in truth
        ]
        out[f"recall_{name}"] = round(sum(rec) / len(rec), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
