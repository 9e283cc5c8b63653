"""Streaming heavy hitters: a space-saving sketch per hash bucket.

The reference has no streaming (SURVEY.md §2.3); this is the engine's
continuous "hot terms" monitor — the structure a 10^12-turn feed needs
where an exact streaming groupBy(term).count() cannot exist (state =
one counter PER DISTINCT TERM, unbounded). Space-saving (Metwally et
al.) keeps at most ``capacity`` counters per bucket and still carries
two hard guarantees, both asserted in tests/test_streaming_hh.py:

- every term whose true count exceeds N/capacity (N = terms processed
  in the bucket) IS in the summary — no false negatives above the
  threshold;
- each estimate brackets truth: ``count_est − err ≤ true ≤ count_est``.

Capacity ≥ the bucket's distinct-term count degrades to EXACT counts
(no eviction ever fires), which is what makes the batch twin a strict
equality test rather than a tolerance check.

Sharding by ``pmod(hash(term), n_buckets)`` makes the sketch
distributed: each bucket's state is independent, so state per executor
is ``capacity × buckets/executors`` regardless of stream length, and
the union of bucket summaries is the global summary (a term lives in
exactly one bucket — no cross-bucket merge error).

Eviction transfers the evicted entry's estimate (``new = min + batch``,
``err = min``), so Σ estimates == N at all times — the invariant the
N/capacity guarantee's proof rides on; the per-batch merge of
pre-aggregated counts preserves it (mergeable-summaries property).

Each trigger emits the bucket's full summary stamped with a
monotonically increasing ``upto`` (terms processed); ``read_summary``
keeps each bucket's latest snapshot. The sink therefore holds an
append-only history of summaries — at scale, compact it like any
changelog table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import fsio
from ..functions.tokenizer import tokenize_expr
from ..operators.corpus_queries import STOP_LIST

HH_CAPACITY = 64
HH_BUCKETS = 8

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("count_est", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("upto", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("upto", T.LongType()),
    ]
)


def term_stream(docs: DataFrame) -> DataFrame:
    """(bucket, term) occurrences under the index build's B4 filter —
    the same tokenization the batch twin uses."""
    terms = docs.select(
        F.explode(tokenize_expr(F.col("text"), lower_case=True)).alias(
            "term"
        )
    ).filter((F.length("term") >= 2) & ~F.col("term").isin(STOP_LIST))
    return terms.withColumn(
        "bucket", F.pmod(F.hash("term"), F.lit(HH_BUCKETS)).cast("int")
    )


def batch_term_counts(docs: DataFrame) -> DataFrame:
    """Exact batch twin: true term counts over the same token stream."""
    return (
        term_stream(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _hh_fn(capacity: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        agg = batch.groupby("term").size()

        if state.exists:
            terms, counts, errs, upto = state.get
            d: dict[str, list[int]] = {
                t: [int(c), int(e)] for t, c, e in zip(terms, counts, errs)
            }
            upto = int(upto)
        else:
            d, upto = {}, 0

        # deterministic merge order (sorted terms) so a replayed batch
        # rebuilds the identical summary after checkpoint recovery
        for term, b in sorted(agg.items()):
            b = int(b)
            if term in d:
                d[term][0] += b
            elif len(d) < capacity:
                d[term] = [b, 0]
            else:
                # evict the minimum estimate (term as tie-break keeps it
                # deterministic); the newcomer inherits the evicted
                # estimate so Σ counts stays == terms processed
                mt = min(d, key=lambda t: (d[t][0], t))
                mc = d[mt][0]
                del d[mt]
                d[term] = [mc + b, mc]
        upto += int(len(batch))

        ts = sorted(d)
        state.update(
            (ts, [d[t][0] for t in ts], [d[t][1] for t in ts], upto)
        )
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(ts),
                "term": ts,
                "count_est": [d[t][0] for t in ts],
                "err": [d[t][1] for t in ts],
                "upto": [upto] * len(ts),
            }
        )

    return fn


def stream_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    capacity: int = HH_CAPACITY,
    max_files_per_trigger: int | None = None,
):
    """Drain document parquet files through the per-bucket space-saving
    sketch, appending each trigger's summary snapshot to ``out_dir``."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    summaries = (
        term_stream(docs)
        .groupBy("bucket")
        .applyInPandasWithState(
            _hh_fn(capacity),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # "append" because the parquet sink only supports append;
            # the emitted rows are self-versioned snapshots (``upto``),
            # so append-only history + read_summary's latest-per-bucket
            # gives update-mode semantics on top of an append sink
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        summaries.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fsio.mkdirs(out_dir)
    return q


def read_summary(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest snapshot per bucket from the append-only summary history."""
    hist = spark.read.parquet(out_dir)
    latest = hist.groupBy(F.col("bucket").alias("b")).agg(
        F.max("upto").alias("u")
    )
    return hist.join(
        F.broadcast(latest),
        (F.col("bucket") == F.col("b")) & (F.col("upto") == F.col("u")),
    ).select("bucket", "term", "count_est", "err")
