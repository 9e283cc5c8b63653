"""Streaming query serving: answer a continuous stream of search queries
with the fused batch plan.

The reference serves queries from an interactive readline loop, one at a
time (/root/reference/src/demo.ts:160-186). At cluster scale the serving
shape is different: queries arrive continuously (a request log, a Kafka
topic, a staging directory), and per-query Spark-job overhead is the
bottleneck — so the engine's unit of work must be the *micro-batch of
in-flight queries*, not the query.

This module is that serving tier: ``readStream`` over a query source →
``foreachBatch`` → ``operators/batch.py``'s fused plan (ONE pushed
IN-scan + one aggregation + one Arrow stage for the whole micro-batch,
regardless of batch size) → append results to a sink directory. The
stream checkpoint gives exactly-once per query file; per-batch metrics
(queries, wall sec, amortized ms/query, QPS) are recorded for the bench.

Scale notes: each micro-batch touches only the query-term slivers of the
(warmed) index — work is proportional to the in-flight query set, never
the corpus. The one driver-side ``collect()`` is the micro-batch of query
TEXTS (bounded by ``maxFilesPerTrigger`` × file size — the in-flight
request set, which any serving tier holds in memory by definition); the
per-doc work all stays in the fused executor-side plan. Kafka would slot
in by swapping the file reader for ``format("kafka")`` — the sink
function is source-agnostic.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_SCHEMA = "query_id long, text string"


# literal-map remap is a plan-size bet: above this many in-flight queries
# the CreateMap expression's 2n literal children threaten codegen limits
# (64KB JVM methods), so fall back to the broadcast join
REMAP_LITERAL_MAX = 1024


def _remap_query_ids(spark: SparkSession, res: DataFrame,
                     ext_ids: list[int]) -> DataFrame:
    """batch.py numbers queries 0..n-1 by position; map back to the
    caller's external query_id. Small micro-batches (the default
    ``max_files_per_trigger=1`` serves a file at a time) use a literal
    map lookup inside the existing projection — no createDataFrame, no
    broadcast exchange per micro-batch. An unbounded trigger
    (``max_files_per_trigger=None``) can put ALL pending queries in one
    batch, where 2n map literals would blow plan analysis / codegen
    limits — above REMAP_LITERAL_MAX the remap is a broadcast join."""
    if len(ext_ids) <= REMAP_LITERAL_MAX:
        id_map = F.create_map(
            *[F.lit(x) for i, e in enumerate(ext_ids) for x in (i, e)]
        )
        return res.withColumn(
            "query_id", id_map[F.col("query_id")].cast("long")
        )
    mapping = spark.createDataFrame(
        [(i, e) for i, e in enumerate(ext_ids)], "query_id long, ext long"
    )
    return (
        res.join(F.broadcast(mapping), "query_id")
        .drop("query_id")
        .withColumnRenamed("ext", "query_id")
        .select(*res.columns)  # same column order as the literal path
    )


def serve_query_stream(
    engine,
    queries_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "search",
    max_count: int = 10,
    conjunctive: bool = False,
    max_files_per_trigger: int | None = 1,
    metrics: list | None = None,
):
    """Drain query files (json lines: ``{"query_id": N, "text": "..."}``)
    from ``queries_dir`` and append per-query results to ``out_dir``
    (parquet), one fused plan per micro-batch.

    ``mode`` = ``"search"`` (reference-parity conjunctive + heuristic
    score + snippets, columns query_id/rank/doc_id/score/title/
    introduction/url) or ``"bm25"`` (columns query_id/rank/doc_id/score).
    Per-query rows are identical to the single-query engine calls —
    asserted by tests/test_streaming_serving.py.

    Returns the drained StreamingQuery handle; per-batch metrics are
    appended to ``metrics`` (if given) as dicts.
    """
    from ..operators.batch import bm25_many, search_many

    spark = engine.spark
    reader = spark.readStream.schema(QUERY_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(queries_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        rows = (
            batch_df.filter(F.col("text").isNotNull())
            .select("query_id", "text")
            .collect()
        )
        if not rows:
            return
        ext_ids = [int(r["query_id"]) for r in rows]
        texts = [r["text"] for r in rows]
        if mode == "bm25":
            res = bm25_many(
                engine, texts, k=max_count, conjunctive=conjunctive
            )
        else:
            res = search_many(engine, texts, max_count=max_count)
        out = _remap_query_ids(spark, res, ext_ids)
        # one sub-dir per micro-batch: append semantics without relying
        # on parquet-append into a live directory listing. repartition(1)
        # (NOT coalesce — that would collapse the upstream Arrow/window
        # stage to one task): a micro-batch's results are ≤ k·|batch|
        # rows, so one tiny shuffle buys one output file + one task
        # commit per batch instead of one per serve partition
        out.repartition(1).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        wall = time.time() - t0
        if metrics is not None:
            metrics.append(
                {
                    "batch_id": batch_id,
                    "n_queries": len(texts),
                    "wall_sec": round(wall, 3),
                    "ms_per_query": round(1000 * wall / len(texts), 2),
                    "qps": round(len(texts) / wall, 1),
                }
            )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_served_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All results appended by :func:`serve_query_stream`, ordered
    (query_id, rank)."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(f"{out_dir}/batch=*")
        .drop("batch")
        .orderBy("query_id", "rank")
    )
