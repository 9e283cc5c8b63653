"""Inverted-index build: corpus -> docs / term_positions / postings /
blocks / stats, resumable from per-segment checkpoints with lineage +
metrics.

Reference behavior being re-expressed (not ported):

- ``engine.add`` (/root/reference/src/engine.ts:43-99): tokenize
  title+' '+text, allocate pageId from rank, dedup words per page, insert
  (word -> pageId) into sorted posting lists, build the per-page positional
  index (stop words INCLUDED per engine.ts:88-94; the global index EXCLUDES
  them per engine.ts:68-70), persist the page.
- bulk ingest + checkpoint/resume (/root/reference/src/demo.ts:102-153):
  the `last-url` file + skippingMode replay scales up here to a manifest of
  completed doc-id segments with per-segment metrics (postings/sec,
  bytes) — per-partition lineage per the north rule.

Spark shape (one declarative plan per stage, Catalyst optimizes):

    corpus -> assign doc_ids (distributed sequence / reference allocator)
           -> stage (sorted by doc_id, parquet)                 [resumable]
    per doc-id segment k:                                        [resumable]
           stage filter(seg k)   (parquet row-group pruned)
           -> tokenize (Column exprs or Arrow UDF)
           -> docs/seg=k
           -> posexplode -> groupBy(doc_id, term) -> term_positions/seg=k
           -> stop-filter -> postings/seg=k  (term, doc_id, tf, dl)
    merge: postings/* -> repartitionByRange(term, doc_id)
           -> delta-encoded blocks with block-max metadata (mapInPandas)
           -> term_stats (df per term), corpus_stats (N, avgdl)

Skew note: postings are laid out with ``repartitionByRange(term, doc_id)``,
which SPLITS a Zipf head term across partitions (unlike hash partitioning,
which would send every 'the' posting to one reducer). Group-bys that key on
``term`` alone are restricted to algebraic aggregates (count/max) where
map-side partial aggregation absorbs the skew. Block building never groups
a whole term: blocks are cut per partition-local run (Lucene-segment
style), so a boundary-straddling term just yields one short block per
boundary — harmless for WAND.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.tokenizer import tokenize_expr, tokenize_words_udf
from .docids import with_global_sequence, with_reference_ids

MANIFEST = "manifest.jsonl"


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    n_postings: int
    seconds: float
    segments: int


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST)


def read_manifest(index_dir: str) -> list[dict]:
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _append_manifest(index_dir: str, entry: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    with open(_manifest_path(index_dir), "a") as fh:
        fh.write(json.dumps(entry, sort_keys=True) + "\n")


def _completed(manifest: list[dict], stage: str) -> set:
    return {e.get("segment") for e in manifest if e["stage"] == stage and e.get("ok")}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def stop_word_filter(term_col, stop_words: frozenset[str]):
    """Reference isStopWord (engine.ts:490-492): len<2 always stops; the
    configured list is checked against the lowercased term."""
    cond = F.length(term_col) >= 2
    if stop_words:
        cond = cond & ~term_col.isin(*sorted(stop_words))
    return cond


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    config: EngineConfig = EngineConfig(),
    mode: str = "sequence",
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
    segments: int = 4,
    shuffle_partitions: Optional[int] = None,
    fail_after_segment: Optional[int] = None,
    check_unique_urls: bool = False,
) -> BuildResult:
    """Build (or resume) the index for ``corpus`` into ``index_dir``.

    ``corpus`` columns: url, title, text (+ ``order_cols`` for
    mode="sequence", or ``rank``+``arrival`` for mode="reference").

    Re-running after a failure skips completed stages/segments via the
    manifest (kill/rerun yields an identical index; tested).
    ``fail_after_segment`` injects a crash for the resume test.
    """
    t0 = time.time()
    os.makedirs(index_dir, exist_ok=True)
    manifest = read_manifest(index_dir)
    # layout width follows the shuffle setting, not the executor count, so
    # the same input yields the same files at any cluster size
    npart = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # ---- stage 0: doc-id assignment + staged corpus (resumable) ----------
    staged_dir = os.path.join(index_dir, "staged")
    if "staged" not in {e["stage"] for e in manifest if e.get("ok")}:
        if check_unique_urls:
            dupes = (
                corpus.groupBy("url").count().filter(F.col("count") > 1).take(1)
            )
            if dupes:
                # parity with engine.ts:56-58
                raise ValueError(f"page already in index: {dupes[0]['url']}")
        if mode == "reference":
            assigned = (
                with_reference_ids(corpus, "rank", ["arrival"])
                .repartitionByRange(npart, "doc_id")
                .sortWithinPartitions("doc_id")
            )
        else:
            # with_global_sequence already leaves the data range-partitioned
            # and sorted in doc_id order — re-ranging would just add a
            # sampling pass + full shuffle for a no-op
            assigned = with_global_sequence(
                corpus, list(order_cols), "doc_id", num_partitions=npart
            )
        assigned.write.mode("overwrite").parquet(staged_dir)
        n_docs = spark.read.parquet(staged_dir).count()
        _append_manifest(
            index_dir,
            {"stage": "staged", "ok": True, "n_docs": n_docs,
             "seconds": round(time.time() - t0, 3)},
        )
        manifest = read_manifest(index_dir)
    n_docs = next(e["n_docs"] for e in manifest if e["stage"] == "staged")

    staged = spark.read.parquet(staged_dir)
    if not n_docs:
        min_id, max_id = 0, 0
    elif mode == "sequence":
        # dense 1-based sequence by construction — no job needed
        min_id, max_id = 1, n_docs
    else:
        min_id, max_id = staged.agg(
            F.min("doc_id"), F.max("doc_id")
        ).first()

    # ---- stage 1: per-segment tokenize + docs/positions/postings ---------
    done = _completed(manifest, "segment")
    span = (max_id - min_id + 1) if n_docs else 1
    for k in range(segments):
        if k in done:
            continue
        lo = min_id + (span * k) // segments
        hi = min_id + (span * (k + 1)) // segments  # exclusive
        t_seg = time.time()
        seg = staged.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

        if config.tokenizer == "arrow":
            words = tokenize_words_udf(F.concat_ws(" ", "title", "text"))
        else:
            words = tokenize_expr(F.concat_ws(" ", "title", "text"))
        docs = seg.withColumn("words", words).withColumn(
            "n_tokens", F.size("words")
        )
        docs_out = docs.select(
            "doc_id", "url", "title", "words", "n_tokens",
            *[c for c in ("conv_id", "turn_idx", "ts") if c in seg.columns],
        )
        docs_out.write.mode("overwrite").parquet(
            os.path.join(index_dir, "docs", f"seg={k}")
        )

        # per-page positional index (stop words INCLUDED, engine.ts:88-94)
        term_pos = (
            docs.select(
                "doc_id",
                "n_tokens",
                F.posexplode("words").alias("pos", "word"),
            )
            .select(
                "doc_id", "n_tokens", F.lower("word").alias("term"), "pos"
            )
            .groupBy("doc_id", "term")
            .agg(
                F.sort_array(F.collect_list("pos")).alias("positions"),
                F.first("n_tokens").alias("dl"),
            )
        )
        term_pos = term_pos.persist()
        (
            term_pos.select("doc_id", "term", "positions")
            .repartitionByRange(npart, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, "term_positions", f"seg={k}"))
        )

        # global inverted index (stop words EXCLUDED, engine.ts:68-77);
        # tf = positions count; dl denormalized for join-free BM25 scoring
        postings = (
            term_pos.filter(stop_word_filter(F.col("term"), config.stop_words))
            .select(
                "term",
                "doc_id",
                F.size("positions").alias("tf"),
                "dl",
            )
            .repartitionByRange(npart, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id")
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(index_dir, "postings", f"seg={k}")
        )
        term_pos.unpersist()

        n_seg_docs = hi - lo if n_docs else 0
        n_seg_postings = spark.read.parquet(
            os.path.join(index_dir, "postings", f"seg={k}")
        ).count()
        seg_seconds = time.time() - t_seg
        seg_bytes = _dir_bytes(os.path.join(index_dir, "postings", f"seg={k}"))
        _append_manifest(
            index_dir,
            {
                "stage": "segment",
                "segment": k,
                "ok": True,
                "doc_id_range": [lo, hi],
                "n_postings": n_seg_postings,
                "postings_per_sec": round(n_seg_postings / max(seg_seconds, 1e-9), 1),
                "bytes": seg_bytes,
                "seconds": round(seg_seconds, 3),
            },
        )
        if fail_after_segment is not None and k >= fail_after_segment:
            raise RuntimeError(f"injected failure after segment {k}")
    manifest = read_manifest(index_dir)

    # ---- stage 2: merge-compress -> blocks + stats ------------------------
    if "merged" not in {e["stage"] for e in manifest if e.get("ok")}:
        t_merge = time.time()
        postings_all = spark.read.parquet(os.path.join(index_dir, "postings"))

        stats_row = (
            spark.read.parquet(os.path.join(index_dir, "docs"))
            .agg(
                F.count("*").alias("n_docs"),
                F.avg("n_tokens").alias("avgdl"),
            )
            .first()
        )
        corpus_stats = {
            "n_docs": int(stats_row["n_docs"]),
            "avgdl": float(stats_row["avgdl"] or 0.0),
        }
        with open(os.path.join(index_dir, "corpus_stats.json"), "w") as fh:
            json.dump(corpus_stats, fh)

        # df per term: algebraic agg -> map-side combine absorbs Zipf skew
        (
            postings_all.groupBy("term")
            .agg(F.count("*").alias("df"), F.max("tf").alias("max_tf"))
            .repartitionByRange(max(npart // 4, 1), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, "term_stats"))
        )

        build_blocks(
            postings_all,
            os.path.join(index_dir, "blocks"),
            corpus_stats["avgdl"],
            config,
            npart,
        )
        _append_manifest(
            index_dir,
            {"stage": "merged", "ok": True,
             "seconds": round(time.time() - t_merge, 3)},
        )
        manifest = read_manifest(index_dir)

    n_postings = sum(
        e.get("n_postings", 0) for e in manifest if e["stage"] == "segment"
    )
    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        n_postings=n_postings,
        seconds=time.time() - t0,
        segments=segments,
    )


def build_blocks(
    postings: DataFrame,
    out_dir: str,
    avgdl: float,
    config: EngineConfig,
    num_partitions: int,
) -> None:
    """Cut postings into delta-encoded, block-max-annotated blocks.

    Layout: one row per (term, first_doc) block —
      term, first_doc, max_doc, n, doc_deltas:array<long>, tfs:array<int>,
      block_max_partial:double
    where ``block_max_partial = max(tf / (tf + k1*(1-b+b*dl/avgdl)))`` so a
    query-time upper bound is ``idf * (k1+1) * block_max_partial`` (idf is
    corpus-global, known at query time).

    Blocks are cut per partition-local (term, doc_id)-sorted run via
    mapInPandas — no per-term groupBy, so head-term skew never concentrates
    on one task. A term straddling a partition boundary yields one short
    boundary block; WAND treats blocks independently so this only costs a
    few extra rows.
    """
    k1, b = config.bm25_k1, config.bm25_b
    block = config.block_size
    part = postings.repartitionByRange(
        num_partitions, "term", "doc_id"
    ).sortWithinPartitions("term", "doc_id")

    schema = (
        "term string, first_doc long, max_doc long, n int, "
        "doc_deltas array<long>, tfs array<int>, block_max_partial double"
    )

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        carry: Optional[pd.DataFrame] = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # hold back the last (possibly incomplete) term run to merge
            # with the next Arrow batch of this partition
            last_term = pdf["term"].iloc[-1]
            tail_mask = pdf["term"].to_numpy() == last_term
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield _cut_runs(head, block, k1, b, avgdl, np)
        if carry is not None and len(carry):
            import numpy as np

            yield _cut_runs(carry, block, k1, b, avgdl, np)

    part.mapInPandas(cut, schema=schema).write.mode("overwrite").parquet(out_dir)


def _cut_runs(pdf: pd.DataFrame, block: int, k1: float, b: float,
              avgdl: float, np) -> pd.DataFrame:
    """Vectorized block cutting for one or more complete term runs."""
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype="int64")
    tfs = pdf["tf"].to_numpy(dtype="int64")
    dls = pdf["dl"].to_numpy(dtype="float64")
    partial = (tfs / (tfs + k1 * (1 - b + b * dls / max(avgdl, 1e-9)))) if len(pdf) else np.array([])

    rows = {"term": [], "first_doc": [], "max_doc": [], "n": [],
            "doc_deltas": [], "tfs": [], "block_max_partial": []}
    start = 0
    n = len(pdf)
    while start < n:
        term = terms[start]
        end = start
        while end < n and terms[end] == term:
            end += 1
        for s in range(start, end, block):
            e = min(s + block, end)
            ids = doc_ids[s:e]
            deltas = np.diff(ids, prepend=ids[0]).astype("int64")
            deltas[0] = 0  # first_doc carried separately
            rows["term"].append(term)
            rows["first_doc"].append(int(ids[0]))
            rows["max_doc"].append(int(ids[-1]))
            rows["n"].append(e - s)
            rows["doc_deltas"].append(deltas.tolist())
            rows["tfs"].append(tfs[s:e].astype("int32").tolist())
            rows["block_max_partial"].append(float(partial[s:e].max()))
        start = end
    return pd.DataFrame(rows)
