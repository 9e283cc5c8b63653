"""Doc-id (pageId) assignment.

The reference allocates ids serially: ``getSeed(rank)`` probes DOWNWARD
from the requested rank to the first free id and throws when it reaches
below zero (/root/reference/src/memory-storage.ts:101-106,
/root/reference/src/binary-file-storage.ts:240-244). Because posting lists
are kept sorted by id, pageId doubles as the global rank ("lower page id
means better page rank", reference README.md:106-108).

Two modes:

- :func:`allocate_reference_ids` — exact reproduction of the serial probe
  semantics. The probe is order-dependent (doc i's id depends on ids of all
  docs that arrived before it), i.e. inherently sequential, so it runs on
  the driver over just the ``(arrival, rank)`` pairs using a union-find
  "next free at or below" structure. The union-find itself is O(α)/doc and
  ~16 B/doc, but the collected pairs are Python Row objects (~100 B each),
  so the practical driver ceiling is ~10^7 docs — this mode exists ONLY
  for rank-parity with the reference test fixtures (tens of docs) and is
  not a scale path; production ingest uses with_global_sequence.

- :func:`with_global_sequence` — the scale path (BASELINE.json input_hint:
  ``rank = row_number() over (order by conv_id, turn_idx)``). Collision-free
  dense ids from a total order, computed WITHOUT a single-partition window:
  range-repartition on the sort keys, count per partition (tiny driver
  collect), then per-partition offset + local enumeration via mapInPandas.
  The result depends only on the total order, not on the partition count —
  identical output at local[8] and local[32] (asserted in tests), and at
  1000 executors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def allocate_reference_ids(ranks: Sequence[int]) -> list[int]:
    """Exact serial-probe allocation: for each requested rank in arrival
    order, return the largest free id <= rank; raise when it goes below 0
    (message parity with memory-storage.ts:104)."""
    # union-find with path compression: parent[i] = candidate free id <= i
    parent: dict[int, int] = {}

    def find_free(i: int) -> int:
        path = []
        while i in parent:
            path.append(i)
            i = parent[i]
        for p in path:
            parent[p] = i
        return i

    out: list[int] = []
    for rank in ranks:
        free = find_free(rank)
        if free < 0:
            raise ValueError("Rank <= 0")
        out.append(free)
        parent[free] = free - 1
    return out


def with_reference_ids(
    df: DataFrame, rank_col: str = "rank", arrival_cols: Sequence[str] = ("arrival",)
) -> DataFrame:
    """Attach ``doc_id`` reproducing the reference's serial allocator.

    ``arrival_cols`` define the insertion order (the reference inserts one
    doc at a time; demo.ts:139-144 uses arrival count as rank). Only the
    (arrival, rank) pairs are collected to the driver — see module
    docstring for why and for the scale-path alternative.
    """
    pairs = (
        df.select(*arrival_cols, rank_col)
        .orderBy(*arrival_cols)
        .collect()
    )
    ids = allocate_reference_ids([row[rank_col] for row in pairs])
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [
            tuple(row[c] for c in arrival_cols) + (doc_id,)
            for row, doc_id in zip(pairs, ids)
        ],
        schema=T.StructType(
            list(df.select(*arrival_cols).schema.fields)
            + [T.StructField("doc_id", T.LongType(), False)]
        ),
    )
    return df.join(F.broadcast(mapping), on=list(arrival_cols), how="inner")


def with_global_sequence(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "doc_id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """See :func:`with_global_sequence_counted`; drops the row count.

    Releases the internal cache immediately: downstream actions re-read
    the (reused) shuffle files and redo only the in-partition sort, which
    is deterministic, so results are unchanged. Callers that consume the
    output more than once should use the counted variant and unpersist
    the returned handle after their terminal action instead."""
    out, _n, cached = with_global_sequence_counted(
        df, order_cols, out_col, start, num_partitions
    )
    cached.unpersist()
    return out


def with_global_sequence_counted(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "doc_id",
    start: int = 1,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Attach a dense global sequence (``start``-based) over the total order
    given by ``order_cols`` — the distributed row_number.

    Returns ``(out, n_rows, cached)`` where ``cached`` is the persisted
    range-partitioned frame the output reads through. The CALLER must
    ``cached.unpersist()`` after its terminal action over ``out`` —
    previously this leaked one cached frame per call, which in the
    streaming append path accumulated without bound (one per micro-batch).

    Fully JVM-side, two jobs over a persisted range-partitioned frame:
    1. count rows per range partition (collects one small row per partition)
    2. ``monotonically_increasing_id`` encodes ``(partition, local index)``
       — with the frame sorted within partitions its low 33 bits ARE the
       local row number — so ``doc_id = partition offset + local index`` is
       pure column arithmetic: no Python round-trip, no second shuffle, no
       single-partition window.

    No global shuffle to one partition, no skew: ranges are balanced by
    Spark's range partitioner sampling. The result depends only on the
    total order, not the partition count (tested).
    """
    spark = df.sparkSession
    if num_partitions is None:
        # follow the shuffle width so output layout (and therefore doc-id
        # enumeration inputs) is independent of executor count
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # deliberately NOT caching the input: the range partitioner's sampling
    # pass recomputes the upstream pipeline once, but that is parallel
    # compute, which scales with executors — a cache fill is a serialized
    # memory copy through a shared resource and measurably hurts scaling
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    part = part.persist()
    sizes = {
        row["_pid"]: row["n"]
        for row in part.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # offset lookup: flat array literal indexed by partition id — an
    # O(num_partitions)-deep nested WHEN chain here costs seconds of
    # driver-side Catalyst/codegen time per downstream action, pure serial
    # overhead (partition ids of a fresh shuffle are dense 0..n-1)
    max_pid = max(offsets, default=-1)
    offset_arr = F.array(
        *[F.lit(offsets.get(pid, start)) for pid in range(max_pid + 1)]
    )
    offset_expr = (
        F.element_at(offset_arr, F.col("_pid") + 1)
        if max_pid >= 0
        else F.lit(start)
    )
    local_idx = F.col("_mid") - F.shiftleft(F.col("_pid").cast("long"), 33)
    out = part.withColumn(
        out_col, (offset_expr + local_idx).cast("long")
    ).drop("_pid", "_mid")
    return out, acc - start, part
