"""Document deletion via tombstones (Lucene/Iceberg-style lifecycle).

The reference engine has no delete — its index lives and dies with one
process (memory-storage.ts). A long-lived Spark index needs one: takedown
requests, re-crawled pages, PII purges. The design is the standard
log-structured one (Lucene deleted-docs bitmaps / Iceberg position
deletes), re-expressed over the segment layout this repo already has:

- ``delete_docs`` appends a tiny ``tombstones/`` parquet of
  (doc_id, url) — O(|deletes|) work, NO rewrite of any index table.
- the read side (:class:`..operators.search.SearchEngine`) anti-joins
  every table handle against the broadcast tombstone set at load time,
  so every query path (parity search, BM25, WAND via its exact-score
  join, batch serving) excludes deleted docs immediately.
- ``compact_index`` applies tombstones PHYSICALLY during its staged
  rewrite and refreshes corpus_stats/term_stats, then clears the applied
  tombstone files — exactly Lucene's merge-applies-deletes contract.

Between delete and compaction, BM25 df/avgdl still count deleted docs
(scores drift by a hair, membership is already correct). That is the
same documented staleness window Lucene serves with; compaction is the
repair. All IO goes through fsio (HDFS/S3A-safe); deletes are idempotent
(re-deleting an already-tombstoned doc appends nothing).

100 TB story: tombstones stay tiny relative to the corpus (deletes are
operational events, not a data stream), so the broadcast anti-join costs
one hash lookup per row already being scanned; the heavy work happens
once, inside the compaction rewrite the index needed anyway.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsio
from ..config import EngineConfig
from .index_build import _append_manifest

TOMBSTONES = "tombstones"


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONES)


def read_tombstones(
    spark: SparkSession, index_dir: str
) -> Optional[DataFrame]:
    """(doc_id, url) of all pending tombstones, or None when there are
    none. Checks for actual part files — an append-mode dir can exist
    with only a _SUCCESS marker after compaction cleared it."""
    tdir = _tomb_dir(index_dir)
    if not fsio.exists(tdir, spark):
        return None
    if not any(f.startswith("part-") for f in fsio.list_dir(tdir, spark)):
        return None
    return spark.read.parquet(tdir)


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    urls: Optional[Sequence[str]] = None,
    doc_ids: Optional[Sequence[int]] = None,
    config: EngineConfig = EngineConfig(),
) -> int:
    """Tombstone documents by url and/or doc_id. Returns the number of
    NEW tombstones written (0 when everything asked for was already
    deleted or never existed). Appends one manifest lineage entry.

    Resolution happens against the live ``docs`` table so a url maps to
    its doc_id once, here — queries then only ever filter on the integer
    key. The requested url/id sets are query-sized (an operational
    action), so they travel as pushed IN-filters on the docs scan."""
    t0 = time.time()
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    parts = []
    if urls:
        parts.append(
            docs.filter(F.col("url").isin(list(urls)))
            .select("doc_id", "url")
        )
    if doc_ids:
        parts.append(
            docs.filter(F.col("doc_id").isin([int(i) for i in doc_ids]))
            .select("doc_id", "url")
        )
    if not parts:
        return 0
    asked = parts[0]
    for p in parts[1:]:
        asked = asked.unionByName(p)
    asked = asked.dropDuplicates(["doc_id"])

    existing = read_tombstones(spark, index_dir)
    if existing is not None:
        asked = asked.join(
            F.broadcast(existing.select("doc_id")), "doc_id", "left_anti"
        )

    # count BEFORE writing: a request matching nothing must not leave an
    # empty tombstone part file behind — read_tombstones / the compaction
    # policy treat any part file as a pending backlog, so an empty one
    # would force spurious rewrites forever. Deletes are rare operational
    # actions; the extra tiny-scan job is irrelevant.
    asked = asked.persist()
    n_new = asked.count()
    if n_new == 0:
        asked.unpersist()
        return 0
    (
        asked.write.mode("append")
        .option("compression", config.parquet_codec)
        .parquet(_tomb_dir(index_dir))
    )
    asked.unpersist()
    _append_manifest(
        index_dir,
        {
            "stage": "delete",
            "ok": True,
            "n_deleted": n_new,
            "seconds": round(time.time() - t0, 3),
        },
    )
    return n_new
