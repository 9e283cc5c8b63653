"""In-process serving tier over a Spark-built index directory — no Spark
job, no JVM, in the query path.

Spark BUILDS and maintains the index (operators/index_build.py, deletes,
compaction, streaming/incremental); this module SERVES it. It exists
because a Spark action pays a ~0.2-0.5 s scheduling floor per query on
any cluster — the right tool for the build and for analytic/batch
retrieval, the wrong tool for a single 4 ms probe. The reference engine
(/root/reference/src/engine.ts + memory-storage.ts) answers from process
memory; the equal-semantics analogue over a Spark-built index is a
serving node that pins its shard of the posting lists and reads
everything else from pruned parquet scans. This class is that node.

100 TB story. The build already lays the tables out for sharded serving:
``postings``/``term_positions`` are range-partitioned and SORTED on
(term, doc_id), ``docs`` on doc_id, all under plain parquet files on a
Hadoop-compatible FS. A serving fleet therefore shards by term range
(each node opens only its term-range's files — this class accepts any
subset of the table's files via the directory it is pointed at) and
fetches documents by doc-id from row-group-pruned reads against object
storage. What a node PINS is the postings sliver only — (term, doc_id,
tf, dl), a few bytes per posting — never the corpus; document bodies and
positional lists stay on storage behind bounded caches. One node serving
the whole bench-scale index here is the degenerate (single-shard) case
of that fleet, exactly like the reference's single process.

Parity by construction: the query paths reuse the SAME pure-Python
implementations the Spark engine's Arrow stages run —
``functions.tokenizer.tokenize``, ``operators.scoring.score_page``,
``operators.snippets.construct_introduction`` — and BM25 reproduces
``operators.bm25.bm25_topk``'s deterministic fold (per-doc sum in
sorted-term order, Lucene idf, identical expression grouping), so
results are rank-identical to the Spark paths with scores equal to
within 1 ULP (libm log vs JVM Math.log); pytest-gated
in tests/test_serving_local.py against parity search (engine.test.ts
suites), BM25 (disjunctive/conjunctive), tombstoned indexes, and the
unpinned (cold) read path.

Freshness contract matches SearchEngine: a reader is a SNAPSHOT of the
index at open time (the parquet file listing + tombstones it saw);
reopen to advance after a refresh/compaction — the staged snapshot-swap
in compaction keeps directories consistent at every instant.
"""

from __future__ import annotations

import json
import math
import os
from collections import OrderedDict
from typing import Iterable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as ds

from ..config import EngineConfig
from ..functions.tokenizer import is_stop_word, tokenize
from ..operators.scoring import score_page
from ..operators.search import INTERSECT_CAP, _quote_pairs
from ..operators.snippets import construct_introduction

RESULT_COLUMNS = ["doc_id", "score", "title", "introduction", "url"]
BM25_COLUMNS = ["doc_id", "score", "n_terms"]
BM25_RESULT_COLUMNS = [
    "doc_id", "score", "n_terms", "title", "introduction", "url"
]

# positional postings kept per term in the phrase LRU — bounds phrase
# serving memory to O(cache_terms × positions of one term's shard)
POSITIONS_CACHE_TERMS = 1024

# WAND caches: block METADATA per term (first_doc/max_doc/bmax — a few
# numbers per block, df/block_size rows per term) and DECODED block
# postings per (term, first_doc) key (≤ block_size postings each, so the
# cache is ≤ BLOCK_CACHE_BLOCKS × block_size × 24 B ≈ tens of MB) — a
# serving node's working set, never the index
BLOCK_META_CACHE_TERMS = 512
BLOCK_CACHE_BLOCKS = 4096

# query shapes (terms, conjunctive, k) proven unprunable and routed to
# the exhaustive scorer — a few dozen bytes per entry
WAND_PLAN_CACHE_SHAPES = 4096

# dense per-doc score accumulator cap for BM25: below this doc-id span a
# float64 scatter-add array (8 bytes/doc) beats sorting the concatenated
# posting ids; above it (or with sparse ids beyond 4× n_docs) the
# sort-based merge path runs — at fleet scale a shard never owns a dense
# doc space, so the merge path is the 100 TB shape
DENSE_SCORE_MAX_DOCS = 50_000_000


def snapshot_token(index_dir: str) -> tuple:
    """Cheap fingerprint of an index directory's state. Every mutation
    path touches at least one constituent: ``build_index`` /
    ``append_batch`` append manifest entries, ``refresh_stats`` rewrites
    corpus_stats.json, ``delete_docs`` adds a tombstones part file, and
    compaction's staged snapshot-swap rewrites the manifest. A handful
    of stat/listdir calls — cheap enough to poll per serving batch
    (LocalIndexReader.is_stale and serve_daemon --refresh auto do)."""
    parts: list = []
    for name in ("manifest.jsonl", "corpus_stats.json"):
        p = os.path.join(index_dir, name)
        try:
            st = os.stat(p)
            parts.append((name, st.st_size, st.st_mtime_ns))
        except FileNotFoundError:
            parts.append((name, -1, -1))
    tdir = os.path.join(index_dir, "tombstones")
    try:
        files = tuple(sorted(
            f for f in os.listdir(tdir) if f.startswith("part-")
        ))
    except FileNotFoundError:
        files = ()
    parts.append(("tombstones", files))
    return tuple(parts)


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two ASCENDING unique arrays without re-sorting
    (np.intersect1d sorts the concatenation — O((m+n)log(m+n)); this is
    O(m log n) with m the smaller side)."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0 or len(b) == 0:
        return a[:0]
    idx = np.searchsorted(b, a)
    np.clip(idx, 0, len(b) - 1, out=idx)
    return a[b[idx] == a]


def _group_runs(tbl: pa.Table) -> tuple[dict, np.ndarray, list[np.ndarray]]:
    """(term → (start, end)) run offsets over a (term, …)-sorted table,
    plus the remaining columns as numpy/list views. Vectorized via
    dictionary codes — no Python loop over rows."""
    n = tbl.num_rows
    if n == 0:
        return {}, np.empty(0, dtype="int64"), []
    enc = pc.dictionary_encode(tbl["term"])
    chunk = (
        enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
    )
    if isinstance(chunk, pa.ChunkedArray):  # older pyarrow returns CA
        chunk = chunk.chunk(0)
    codes = chunk.indices.to_numpy(zero_copy_only=False)
    vocab = chunk.dictionary.to_pylist()
    bounds = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [n]])
    runs = {
        vocab[codes[s]]: (int(s), int(e)) for s, e in zip(starts, ends)
    }
    return runs, codes, []


class LocalIndexReader:
    """Single-node (single-shard) serving reader over an index built by
    :func:`..operators.index_build.build_index`.

    ``pin_postings`` (default True): load + sort the shard's
    (term, doc_id, tf, dl) columns into process memory at open — the
    reference's resident-index shape. With False, every query reads its
    term sliver through a pyarrow dataset filter (parquet row-group
    stats on the sorted ``term`` column prune the read) — the
    beyond-node-RAM mode; results identical (tested).

    ``pin_docs`` (default False): additionally pin the
    (doc_id, title, url, words) projection for in-memory snippet/score
    fetches. Bench-scale convenience — at 100 TB the docs table stays on
    storage and the ≤100-id fetch is a pruned parquet read (default).
    """

    def __init__(
        self,
        index_dir: str,
        config: EngineConfig = EngineConfig(),
        pin_postings: bool = True,
        pin_docs: bool = False,
    ):
        self.index_dir = index_dir
        self.config = config
        self._want_pin_postings = pin_postings
        self._want_pin_docs = pin_docs
        self._open()

    def _open(self) -> None:
        """(Re)bind this reader to the CURRENT on-disk index state: fresh
        dataset handles (file listings), stats, tombstones, empty caches,
        re-pinned tables. ``__init__`` and :meth:`refresh` both land
        here, so a refreshed reader is indistinguishable from a freshly
        opened one."""
        index_dir = self.index_dir
        self._snapshot = self._snapshot_token()
        with open(os.path.join(index_dir, "corpus_stats.json")) as fh:
            self.corpus_stats = json.load(fh)
        self._docs_ds = ds.dataset(
            os.path.join(index_dir, "docs"),
            format="parquet", partitioning="hive",
        )
        self._tp_ds = ds.dataset(
            os.path.join(index_dir, "term_positions"),
            format="parquet", partitioning="hive",
        )
        self._post_ds = ds.dataset(
            os.path.join(index_dir, "postings"),
            format="parquet", partitioning="hive",
        )
        self._blk_ds = ds.dataset(
            os.path.join(index_dir, "blocks"),
            format="parquet", partitioning="hive",
        )
        self._tombstones = self._load_tombstones()
        self._df_map = self._load_term_stats()
        self._runs: Optional[dict] = None
        if self._want_pin_postings:
            self._pin_postings()
        self._pos_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._blk_meta_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._blk_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        # (terms, conjunctive, k) shapes proven unprunable → exhaustive
        self._wand_plan_cache: "OrderedDict[tuple, bool]" = OrderedDict()
        self._docs_pin: Optional[tuple] = None
        if self._want_pin_docs:
            self._pin_docs()

    # -- snapshot / refresh ----------------------------------------------

    def _snapshot_token(self) -> tuple:
        return snapshot_token(self.index_dir)

    def is_stale(self) -> bool:
        """True when the on-disk index has advanced past the snapshot
        this reader serves (new segments, refreshed stats, new
        tombstones, or a compaction swap)."""
        return self._snapshot_token() != self._snapshot

    def refresh(self, force: bool = False) -> bool:
        """Advance to the current on-disk snapshot; returns whether a
        reopen happened. The serving-fleet contract for serve-while-
        ingest: writers only ever ADD files or replace whole small files
        atomically (fsio's temp/rename), so an open reader keeps serving
        its snapshot untouched and ``refresh()`` swaps to the new one in
        one step — no partially-visible state in between (pytest-gated in
        tests/test_serving_refresh.py). No-op (and no cache loss) when
        nothing changed, unless ``force``."""
        if not force and not self.is_stale():
            return False
        self._open()
        return True

    # -- open-time loading ---------------------------------------------------

    def _load_tombstones(self) -> np.ndarray:
        tdir = os.path.join(self.index_dir, "tombstones")
        if not os.path.isdir(tdir) or not any(
            f.startswith("part-") for f in os.listdir(tdir)
        ):
            return np.empty(0, dtype="int64")
        t = ds.dataset(tdir, format="parquet").to_table(columns=["doc_id"])
        return np.unique(t["doc_id"].to_numpy(zero_copy_only=False))

    def _mask_tombstones(self, tbl: pa.Table) -> pa.Table:
        """Serve-with-deletes, same contract as SearchEngine._load_tables:
        membership drops tombstoned docs immediately; df/avgdl stats stay
        as built until compaction applies deletes physically."""
        if len(self._tombstones) == 0 or tbl.num_rows == 0:
            return tbl
        return tbl.filter(
            pc.invert(
                pc.is_in(tbl["doc_id"], value_set=pa.array(self._tombstones))
            )
        )

    def _load_term_stats(self) -> dict:
        t = ds.dataset(
            os.path.join(self.index_dir, "term_stats"), format="parquet"
        ).to_table(columns=["term", "df"])
        return dict(
            zip(t["term"].to_pylist(),
                t["df"].to_numpy(zero_copy_only=False).tolist())
        )

    def _pin_postings(self) -> None:
        tbl = self._post_ds.to_table(
            columns=["term", "doc_id", "tf", "dl"]
        )
        tbl = self._mask_tombstones(tbl)
        tbl = tbl.sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        ).combine_chunks()
        self._runs, _, _ = _group_runs(tbl)
        self._doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        self._tfs = tbl["tf"].to_numpy(zero_copy_only=False)
        self._dls = tbl["dl"].to_numpy(zero_copy_only=False)

    def _pin_docs(self) -> None:
        t = (
            self._docs_ds.to_table(
                columns=["doc_id", "title", "url", "words"]
            )
            .sort_by("doc_id")
            .combine_chunks()
        )
        self._docs_pin = (
            t["doc_id"].to_numpy(zero_copy_only=False),
            t["title"].to_pylist(),
            t["url"].to_pylist(),
            t["words"].to_pylist(),
        )

    # -- per-term array access (pinned or cold) -------------------------------

    def _term_arrays(self, terms: Sequence[str]) -> dict:
        """term → (doc_ids asc, tf, dl) numpy views for the given terms.
        Pinned: dict lookup + array slice. Cold: ONE pruned dataset read
        for all terms (row-group stats on the sorted term column)."""
        if self._runs is not None:
            out = {}
            for t in terms:
                se = self._runs.get(t)
                if se is None:
                    continue
                s, e = se
                out[t] = (
                    self._doc_ids[s:e], self._tfs[s:e], self._dls[s:e]
                )
            return out
        tbl = self._post_ds.to_table(
            filter=pc.field("term").isin(list(terms)),
            columns=["term", "doc_id", "tf", "dl"],
        )
        tbl = self._mask_tombstones(tbl)
        tbl = tbl.sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        ).combine_chunks()
        runs, _, _ = _group_runs(tbl)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        tfs = tbl["tf"].to_numpy(zero_copy_only=False)
        dls = tbl["dl"].to_numpy(zero_copy_only=False)
        return {
            t: (ids[s:e], tfs[s:e], dls[s:e])
            for t, (s, e) in runs.items()
        }

    def _positions(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids asc, flat_doc, flat_pos) for one term from
        term_positions (stop words INCLUDED — quoted stop words need
        them, B6), LRU-cached per term. ``flat_doc``/``flat_pos`` are
        the per-occurrence (doc_id, position) pairs in (doc, pos) order
        — the columnar layout the vectorized adjacency works on."""
        hit = self._pos_cache.get(term)
        if hit is not None:
            self._pos_cache.move_to_end(term)
            return hit
        tbl = self._tp_ds.to_table(
            filter=pc.field("term") == term,
            columns=["doc_id", "positions"],
        )
        tbl = self._mask_tombstones(tbl)
        tbl = tbl.sort_by("doc_id").combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        plist = tbl["positions"]
        if isinstance(plist, pa.ChunkedArray):
            plist = (
                plist.combine_chunks() if plist.num_chunks != 1
                else plist.chunk(0)
            )
        if tbl.num_rows:
            counts = pc.list_value_length(plist).to_numpy(
                zero_copy_only=False
            ).astype("int64")
            flat_doc = np.repeat(ids, counts)
            flat_pos = plist.flatten().to_numpy(
                zero_copy_only=False
            ).astype("int64")
        else:
            flat_doc = np.empty(0, dtype="int64")
            flat_pos = np.empty(0, dtype="int64")
        entry = (ids, flat_doc, flat_pos)
        self._pos_cache[term] = entry
        while len(self._pos_cache) > POSITIONS_CACHE_TERMS:
            self._pos_cache.popitem(last=False)
        return entry

    # -- Q16 -------------------------------------------------------------------

    def count(self) -> int:
        return int(self.corpus_stats["n_docs"]) - len(self._tombstones)

    # -- Q1-Q15: reference-parity search ---------------------------------------

    def search(
        self,
        text: str,
        max_count: int = 100,
        allowed_ids: Optional[Iterable[int]] = None,
        arrays: Optional[dict] = None,
    ) -> pd.DataFrame:
        """Reference-parity free-text search; row- and order-identical to
        ``SearchEngine.search`` (tested). ``allowed_ids``: optional
        precomputed doc-id set gating candidates BEFORE the intersection
        cap — the serving-node analogue of ``search(where=...)``, whose
        id frames a fleet precomputes per filter (SearchEngine's
        _allowed_ids cache is exactly that, Spark-side)."""
        words, quotes = tokenize(text)
        lookup = [
            w for w in words if not is_stop_word(w, self.config.stop_words)
        ]
        if not lookup:
            return pd.DataFrame(columns=RESULT_COLUMNS)
        cand = self._candidate_ids(
            words, quotes, lookup, allowed_ids, arrays=arrays
        )
        return self._render_parity(words, quotes, lookup, cand, max_count)

    def _render_parity(
        self,
        words: Sequence[str],
        quotes: Sequence[int],
        lookup: Sequence[str],
        cand: np.ndarray,
        max_count: int,
    ) -> pd.DataFrame:
        """Score + rank + snippet the candidate ids — the tail of
        :meth:`search`, shared with the fleet coordinator
        (``serving.fleet.FleetReader``), which computes candidates
        across shards but renders through any one node (the docs table
        is shared storage)."""
        scored = [
            (
                doc_id,
                score_page(
                    lookup, self.config.score_weights, title, url, pwords
                ),
                title, url, pwords,
            )
            for doc_id, title, url, pwords in self._fetch(cand)
        ]
        scored.sort(key=lambda r: (-r[1], r[0]))
        # snippet AFTER the slice — the reference's own shape
        # (engine.ts:141-150 snippets only the top maxCount); identical
        # output, ~40% less per-query Python at max_count << candidates
        rows = [
            (
                doc_id, score, title,
                construct_introduction(words, quotes, pwords), url,
            )
            for doc_id, score, title, url, pwords in scored[:max_count]
        ]
        return pd.DataFrame(rows, columns=RESULT_COLUMNS)

    def _candidate_ids(
        self,
        words: Sequence[str],
        quotes: Sequence[int],
        lookup: Sequence[str],
        allowed_ids: Optional[Iterable[int]],
        arrays: Optional[dict] = None,
    ) -> np.ndarray:
        """Candidate generation ≡ SearchEngine.candidates: single-list
        fast path (quote predicate SKIPPED, engine.ts:398-404), k-way
        intersection, fused phrase predicate; ascending doc_id, capped
        at INTERSECT_CAP after the allowed gate."""
        terms = sorted({w.lower() for w in lookup})
        allowed = self._as_id_array(allowed_ids)
        if len(lookup) == 1:
            arrays = (
                arrays if arrays is not None else self._term_arrays(terms)
            )
            ids = (
                arrays[terms[0]][0]
                if terms[0] in arrays
                else np.empty(0, dtype="int64")
            )
            ids = self._apply_allowed(ids, allowed)
            return ids[:INTERSECT_CAP]
        ids = self._membership(terms, arrays=arrays)
        ids = self._apply_allowed(ids, allowed)
        if quotes:
            pairs, _ = _quote_pairs(words, quotes)
            ids = _intersect_sorted(ids, self._quote_match_docs(pairs))
        return ids[:INTERSECT_CAP]

    @staticmethod
    def _as_id_array(allowed_ids) -> Optional[np.ndarray]:
        if allowed_ids is None:
            return None
        return np.unique(np.fromiter(
            (int(x) for x in allowed_ids), dtype="int64"
        ))

    @staticmethod
    def _apply_allowed(
        ids: np.ndarray, allowed: Optional[np.ndarray]
    ) -> np.ndarray:
        if allowed is None or len(ids) == 0:
            return ids
        return ids[np.isin(ids, allowed, assume_unique=False)]

    def _membership(
        self, terms: Sequence[str], arrays: Optional[dict] = None
    ) -> np.ndarray:
        """Docs containing EVERY term: fold of merge-based intersections
        over the per-term posting id arrays (each ascending-unique by
        build-time dedup, B5), smallest list first so each step is
        O(m log n) in the running intersection size m. ``arrays``: the
        fleet-merge hook — pre-merged per-term arrays replacing this
        node's own slivers (serving/fleet.py)."""
        arrays = arrays if arrays is not None else self._term_arrays(terms)
        if len(arrays) < len(terms):
            return np.empty(0, dtype="int64")
        per = sorted((arrays[t][0] for t in terms), key=len)
        ids = per[0]
        for cur in per[1:]:
            ids = _intersect_sorted(ids, cur)
            if len(ids) == 0:
                break
        return ids

    def _quote_match_docs(self, pairs: Sequence[Sequence[str]]) -> np.ndarray:
        """Docs where ANY quoted word sequence occurs adjacently —
        vectorized ≡ of search._adjacency_expr: quoted word j's
        occurrences become keys ``doc*span + (pos - j)``; a doc contains
        the phrase iff all k key arrays share a key. One sorted-array
        intersection per quoted word, over the quoted terms' position
        slivers only — replaces a per-candidate Python loop, whose cost
        on a never-matching phrase would be O(|membership|)."""
        matched: list[np.ndarray] = []
        for qw in pairs:
            if not qw:
                continue
            entries = [self._positions(w.lower()) for w in qw]
            if any(len(e[1]) == 0 for e in entries):
                continue
            # span > max_pos + shift keeps keys unique per (doc, pos)
            # and ascending across docs
            span = 2 + len(qw) + max(int(e[2].max()) for e in entries)
            folded: Optional[np.ndarray] = None
            for j, (_, flat_doc, flat_pos) in enumerate(entries):
                keys = flat_doc * span + (flat_pos - j)
                folded = (
                    keys if folded is None
                    else _intersect_sorted(folded, keys)
                )
                if len(folded) == 0:
                    break
            if folded is not None and len(folded):
                # folded ⊆ the j=0 keys, so pos ≥ 0 and // is exact
                matched.append(np.unique(folded // span))
        if not matched:
            return np.empty(0, dtype="int64")
        return np.unique(np.concatenate(matched))

    def _fetch(self, ids: np.ndarray) -> list[tuple]:
        """(doc_id, title, url, words) for a bounded id set — pinned-docs
        array lookups, else ONE row-group-pruned parquet read (the docs
        table is doc_id-sorted per segment, so an IN filter prunes to a
        handful of row groups — the only viable shape at 10^12 docs)."""
        if len(ids) == 0:
            return []
        if self._docs_pin is not None:
            d_ids, titles, urls, words = self._docs_pin
            if len(d_ids) == 0:
                return []
            ids = np.asarray(ids, dtype="int64")
            pos = np.searchsorted(d_ids, ids)
            np.clip(pos, 0, len(d_ids) - 1, out=pos)
            hit = d_ids[pos] == ids
            return [
                (int(doc), titles[i], urls[i], words[i])
                for doc, i in zip(
                    ids[hit].tolist(), pos[hit].tolist()
                )
            ]
        tbl = self._docs_ds.to_table(
            filter=pc.field("doc_id").isin([int(x) for x in ids]),
            columns=["doc_id", "title", "url", "words"],
        )
        return list(zip(
            tbl["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            tbl["title"].to_pylist(),
            tbl["url"].to_pylist(),
            tbl["words"].to_pylist(),
        ))

    # -- BM25 (scale path) -------------------------------------------------------

    def _render_bm25(
        self, out: pd.DataFrame, words: Sequence[str],
        quotes: Sequence[int],
    ) -> pd.DataFrame:
        """(title, introduction, url) projection over <=k ranked BM25
        rows — shared by search_bm25, wand_topk, and the fleet merge
        (any node can render: the docs table is shared storage)."""
        fetched = {
            doc: (title, url, pwords)
            for doc, title, url, pwords in self._fetch(
                out["doc_id"].to_numpy()
            )
        }
        rows = []
        for r in out.itertuples(index=False):
            title, url, pwords = fetched[int(r.doc_id)]
            rows.append((
                int(r.doc_id), float(r.score), int(r.n_terms), title,
                construct_introduction(words, quotes, pwords), url,
            ))
        return pd.DataFrame(rows, columns=BM25_RESULT_COLUMNS)

    def bm25_accumulators(
        self, terms: Sequence[str], arrays: Optional[dict] = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-doc partial BM25 sums over THIS reader's postings for the
        given sorted term list: ``(doc_ids asc, partial_scores,
        matched_term_counts)``. The building block of both
        :meth:`search_bm25` (single node = whole index) and the
        term-range-sharded fleet merge (``serving.fleet.FleetReader``):
        a fleet partitions the posting FILES across shards, so each
        (term, doc) posting row lives in exactly one shard and summing
        the shards' accumulators in shard (= term-range) order
        reproduces the single-reader sorted-term fold bit-for-bit.
        Scoring uses corpus-GLOBAL df/avgdl/N (the full term_stats table
        every node opens) — sharding narrows which postings a node
        holds, never what the corpus looks like."""
        empty = np.empty(0, dtype="int64")
        k1, b = self.config.bm25_k1, self.config.bm25_b
        n = float(self.corpus_stats["n_docs"])
        avgdl = float(self.corpus_stats["avgdl"]) or 1.0
        arrays = arrays if arrays is not None else self._term_arrays(terms)
        id_chunks: list[np.ndarray] = []
        sc_chunks: list[np.ndarray] = []
        for t in terms:  # sorted-term order = the Spark fold's add order
            if t not in arrays:
                continue
            df = self._df_map.get(t)
            if df is None:
                # serve-while-ingest edge: postings landed before their
                # stats refresh — unscorable, same as the stats join
                # dropping the rows
                continue
            ids, tf, dl = arrays[t]
            tf = tf.astype("float64")
            dl = dl.astype("float64")
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            sc = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            id_chunks.append(ids)
            sc_chunks.append(sc)
        if not id_chunks:
            return empty, np.empty(0), np.empty(0, dtype="int64")
        max_id = max(int(ids[-1]) for ids in id_chunks)  # each asc
        if max_id <= max(4 * int(n), DENSE_SCORE_MAX_DOCS // 8) and \
                max_id <= DENSE_SCORE_MAX_DOCS:
            # dense scatter-add over the doc-id span: per-term ids are
            # unique, so `acc[ids] += sc` is one vectorized pass per
            # term, added in sorted-term chunk order — the same fold
            # order as the merge path and the Spark aggregate
            acc = np.zeros(max_id + 1)
            cnt = np.zeros(max_id + 1, dtype="int64")
            for ids, sc in zip(id_chunks, sc_chunks):
                acc[ids] += sc
                cnt[ids] += 1
            uniq = np.flatnonzero(cnt)
            return uniq, acc[uniq], cnt[uniq]
        # sparse doc ids (a fleet shard's slice of a 10^12-doc space):
        # sort-based merge, no dense allocation
        all_ids = np.concatenate(id_chunks)
        all_sc = np.concatenate(sc_chunks)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        scores = np.bincount(inv, weights=all_sc, minlength=len(uniq))
        counts = np.bincount(inv, minlength=len(uniq))
        return uniq, scores, counts

    def search_bm25(
        self,
        text: str,
        k: int = 10,
        conjunctive: bool = False,
        allowed_ids: Optional[Iterable[int]] = None,
        with_results: bool = False,
        arrays: Optional[dict] = None,
    ) -> pd.DataFrame:
        """BM25 top-k ≡ ``operators.bm25.bm25_topk`` (Lucene idf; per-doc
        sum folded in sorted-term order, matching the Spark path's
        deterministic aggregate — scores agree to 1 ULP, ranks exactly;
        ties break on ascending doc_id). ``with_results`` appends the
        (title, introduction, url)
        projection over the ≤k ranked ids, like
        ``SearchEngine.search_bm25(with_results=True)``."""
        words, quotes = tokenize(text)
        terms = sorted({
            w.lower()
            for w in words
            if not is_stop_word(w, self.config.stop_words)
        })
        empty_cols = BM25_RESULT_COLUMNS if with_results else BM25_COLUMNS
        if not terms:
            return pd.DataFrame(columns=empty_cols)
        uniq, scores, counts = self.bm25_accumulators(terms, arrays=arrays)
        if len(uniq) == 0:
            return pd.DataFrame(columns=empty_cols)
        keep = np.ones(len(uniq), dtype=bool)
        if conjunctive:
            keep &= counts == len(terms)
        allowed = self._as_id_array(allowed_ids)
        if allowed is not None:
            keep &= np.isin(uniq, allowed)
        uniq, scores, counts = uniq[keep], scores[keep], counts[keep]
        order = np.lexsort((uniq, -scores))[:k]
        out = pd.DataFrame({
            "doc_id": uniq[order],
            "score": scores[order],
            "n_terms": counts[order].astype("int64"),
        })
        if not with_results:
            return out
        return self._render_bm25(out, words, quotes)

    # -- Block-Max WAND (cold-mode scale path) ---------------------------------

    def _mask_dead(self, ids: np.ndarray) -> np.ndarray:
        """Boolean keep-mask dropping tombstoned doc ids (tombstones are
        sorted unique, so membership is one searchsorted pass)."""
        if len(self._tombstones) == 0 or len(ids) == 0:
            return np.ones(len(ids), dtype=bool)
        pos = np.searchsorted(self._tombstones, ids)
        np.clip(pos, 0, len(self._tombstones) - 1, out=pos)
        return self._tombstones[pos] != ids

    def _read_block_postings(self, keys: set) -> dict:
        """Decode the blocks named by ``keys`` (a set of
        ``(term, first_doc)`` pairs) into ``term -> (doc_ids, tfs, dls)``
        numpy arrays. Decoded blocks live in a bounded LRU (a serving
        node's warm working set); misses are fetched in ONE pruned
        parquet read for all missing blocks (term + first_doc filters
        hit the row-group stats of the (term, doc_id)-sorted layout);
        per-block delta decode is a vectorized cumsum, ids within a term
        are unique across blocks (a doc lives in exactly one build
        segment)."""
        if not keys:
            return {}
        miss = [kk for kk in keys if kk not in self._blk_cache]
        if miss:
            tbl = self._blk_ds.to_table(
                filter=(
                    pc.field("term").isin(sorted({t for t, _ in miss}))
                    & pc.field("first_doc").isin(
                        sorted({f for _, f in miss})
                    )
                ),
                columns=["term", "first_doc", "doc_deltas", "tfs", "dls"],
            )
            miss_set = set(miss)
            terms_col = tbl["term"].to_pylist()
            firsts = tbl["first_doc"].to_numpy(zero_copy_only=False)
            deltas_col = tbl["doc_deltas"]
            tfs_col = tbl["tfs"]
            dls_col = tbl["dls"]
            for i, (t, fd) in enumerate(zip(terms_col, firsts)):
                kk = (t, int(fd))
                if kk not in miss_set:  # isin over-selects cross pairs
                    continue
                dls_py = dls_col[i].as_py()
                if dls_py is None:
                    # mixed-format index: this fragment predates the
                    # self-contained (dls-carrying) block format, so the
                    # schema-level guard in wand_topk couldn't catch it
                    raise ValueError(
                        "index blocks segment for term "
                        f"{t!r} lacks dls values (written before the "
                        "self-contained block format) — rebuild or "
                        "compact the index to serve WAND from blocks"
                    )
                d = np.asarray(deltas_col[i].as_py(), dtype="int64")
                self._blk_cache[kk] = (
                    int(fd) + np.cumsum(d),
                    np.asarray(tfs_col[i].as_py(), dtype="float64"),
                    np.asarray(dls_py, dtype="float64"),
                )
        out: dict[str, list] = {}
        for kk in sorted(keys):
            hit = self._blk_cache.get(kk)
            if hit is None:
                continue  # key names a block that doesn't exist
            self._blk_cache.move_to_end(kk)
            out.setdefault(kk[0], []).append(hit)
        while len(self._blk_cache) > BLOCK_CACHE_BLOCKS:
            self._blk_cache.popitem(last=False)
        return {
            t: tuple(np.concatenate(cols) for cols in zip(*chunks))
            for t, chunks in out.items()
        }

    def _block_meta(self, terms: Sequence[str]) -> tuple:
        """Per-block metadata (term list, first_doc, max_doc,
        drift-corrected block_max_partial arrays) for the given terms,
        through a bounded per-term LRU — the metadata is a few numbers
        per block, so a term's entry is df/block_size rows, read WITHOUT
        the array columns.

        The cached bound is ``block_max_partial · max(1, avgdl_now /
        bake_avgdl)`` — the numpy twin of ``operators.wand.block_max_eff``
        (see its docstring for the monotonicity proof): the baked partial
        under-estimates true contributions whenever this reader's corpus
        avgdl exceeds the one the block was baked with (stats refreshed
        ahead of a block re-bake), which would make pruning lossy. The
        reader's avgdl is a constant of the open snapshot, so the
        correction bakes into the cache entry. Pre-``bake_avgdl`` indexes
        fall back to the uncorrected bound."""
        missing = [t for t in terms if t not in self._blk_meta_cache]
        if missing:
            has_bake = "bake_avgdl" in self._blk_ds.schema.names
            cols = ["term", "first_doc", "max_doc", "block_max_partial"]
            if has_bake:
                cols.append("bake_avgdl")
            meta = self._blk_ds.to_table(
                filter=pc.field("term").isin(sorted(missing)), columns=cols
            )
            tarr = np.asarray(meta["term"].to_pylist(), dtype=object)
            first = meta["first_doc"].to_numpy(zero_copy_only=False)
            mx = meta["max_doc"].to_numpy(zero_copy_only=False)
            bmp = meta["block_max_partial"].to_numpy(zero_copy_only=False)
            if has_bake:
                avgdl_now = float(self.corpus_stats["avgdl"]) or 1.0
                bake = meta["bake_avgdl"].to_numpy(zero_copy_only=False)
                # Mixed-format index (segments appended after the format
                # change next to pre-bake_avgdl ones): old fragments read
                # as null -> NaN, and np.maximum PROPAGATES NaN — the
                # poisoned bound would fail every >= comparison and prune
                # those blocks even at zero drift. Match the Spark twin
                # (F.greatest skips nulls): unknown bake -> uncorrected
                # bound, per-block.
                with np.errstate(invalid="ignore", divide="ignore"):
                    factor = avgdl_now / bake
                factor = np.where(
                    np.isfinite(factor), np.maximum(1.0, factor), 1.0
                )
                bmp = bmp * factor
            for t in missing:
                m = tarr == t
                self._blk_meta_cache[t] = (first[m], mx[m], bmp[m])
        m_terms: list[str] = []
        chunks = []
        for t in terms:
            entry = self._blk_meta_cache[t]
            self._blk_meta_cache.move_to_end(t)
            m_terms.extend([t] * len(entry[0]))
            chunks.append(entry)
        while len(self._blk_meta_cache) > BLOCK_META_CACHE_TERMS:
            self._blk_meta_cache.popitem(last=False)
        return (
            m_terms,
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
            np.concatenate([c[2] for c in chunks]),
        )

    def wand_topk(
        self,
        text: str,
        k: int = 10,
        conjunctive: bool = False,
        allowed_ids: Optional[Iterable[int]] = None,
        with_results: bool = False,
        seed_blocks: int = 4,
    ) -> pd.DataFrame:
        """Block-Max WAND top-k ≡ :meth:`search_bm25` (rank- and
        score-identical, pytest-gated) that reads only the posting BLOCKS
        that can matter instead of the query terms' full posting lists —
        the cold-mode (beyond-node-RAM) serving shape at 10^12 turns,
        where a head term's sliver is GBs but its surviving blocks are
        KBs. Same bound algebra as the Spark path (operators/wand.py,
        Ding & Suel SIGIR'11):

        1. read per-block METADATA only (term, first_doc, max_doc,
           block_max_partial — no array columns) for the query terms;
        2. θ seed: decode each term's top ``seed_blocks`` blocks by block
           upper bound, fold exact contributions per doc; the k-th best
           PARTIAL sum is a valid lower bound of the k-th best total
           (partial ≤ total pointwise), filter-aware: seeds are masked by
           ``allowed_ids``/tombstones first, and under ``conjunctive``
           only docs seen with ALL terms in the seed may set θ;
        3. prune: a block of term t survives iff
           ``ub_block + Σ_{t'≠t} max_ub(t') ≥ θ``;
        4. candidates = docs decoded from surviving blocks; exact
           rescoring additionally decodes each term's blocks whose
           [first_doc, max_doc] range intersects the candidates, then
           folds the SAME expression in the SAME sorted-term order as
           :meth:`search_bm25` — blocks carry raw (tf, dl), so the score
           is computed against CURRENT corpus stats, not baked ones.

        Diagnostics land in ``self.last_wand_stats`` (blocks_total /
        surviving / read / candidates / theta) — the bench's evidence
        that pruning holds at serve time.
        """
        if "dls" not in self._blk_ds.schema.names:
            raise ValueError(
                "index blocks lack the dls column (built before the "
                "self-contained block format) — rebuild or compact the "
                "index to serve WAND from blocks"
            )
        words, quotes = tokenize(text)
        terms = sorted({
            w.lower()
            for w in words
            if not is_stop_word(w, self.config.stop_words)
        })
        empty_cols = BM25_RESULT_COLUMNS if with_results else BM25_COLUMNS
        empty = pd.DataFrame(columns=empty_cols)
        self.last_wand_stats = {
            "terms": 0, "blocks_total": 0, "surviving_blocks": 0,
            "global_surviving_blocks": 0, "blocks_read": 0,
            "candidates": 0, "theta": 0.0, "fallback": None,
        }
        if not terms:
            return empty
        # adaptive exhaustive fallback, cached per query shape: when a
        # previous run of this (terms, conjunctive, k) shape proved that
        # NO block is prunable (flat block maxima — the bench corpus's
        # tiny uniform vocabulary is the worst case), the WAND machinery
        # is pure overhead over exhaustive BM25 (results are identical by
        # the pytest-gated equality), so repeat probes skip straight to
        # :meth:`search_bm25`. Keyed on k too (θ shrinks with k) and only
        # consulted without ``allowed_ids`` (a filter changes θ); the
        # cache dies with the snapshot (cleared in ``_open``).
        plan_key = (tuple(terms), conjunctive, k)
        if allowed_ids is None and plan_key in self._wand_plan_cache:
            self._wand_plan_cache.move_to_end(plan_key)
            self.last_wand_stats["fallback"] = "exhaustive-cached"
            return self.search_bm25(
                text, k=k, conjunctive=conjunctive,
                with_results=with_results,
            )
        k1, b = self.config.bm25_k1, self.config.bm25_b
        n = float(self.corpus_stats["n_docs"])
        avgdl = float(self.corpus_stats["avgdl"]) or 1.0
        idf = {
            t: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            for t in terms
            if (d := self._df_map.get(t)) is not None
        }
        if not idf:
            return empty
        m_terms, m_first, m_max, m_bmp = self._block_meta(sorted(idf))
        m_idf = np.fromiter(
            (idf[t] for t in m_terms), dtype="float64", count=len(m_terms)
        )
        m_ub = m_idf * (k1 + 1.0) * m_bmp
        if len(m_ub) == 0:
            return empty
        scorable = sorted({*m_terms})
        if conjunctive and len(scorable) < len(terms):
            return empty  # same as search_bm25: count can never reach
        g_ub = {t: 0.0 for t in scorable}
        for t, u in zip(m_terms, m_ub):
            if u > g_ub[t]:
                g_ub[t] = u
        sum_ub = sum(g_ub.values())
        allowed = self._as_id_array(allowed_ids)

        def fold(arrays: dict, restrict: Optional[np.ndarray]):
            """Per-doc (score, term-count) fold over term -> (ids,tf,dl),
            summed in sorted-term order — bit-compatible with
            search_bm25's chunk fold. ``restrict``: sorted candidate ids
            to score (None = every decoded doc)."""
            if restrict is None:
                restrict = np.unique(np.concatenate(
                    [a[0] for a in arrays.values()]
                )) if arrays else np.empty(0, dtype="int64")
            acc = np.zeros(len(restrict))
            cnt = np.zeros(len(restrict), dtype="int64")
            for t in sorted(arrays):
                ids, tf, dl = arrays[t]
                sc = idf[t] * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl)
                )
                pos = np.searchsorted(restrict, ids)
                np.clip(pos, 0, max(len(restrict) - 1, 0), out=pos)
                hit = (
                    restrict[pos] == ids
                    if len(restrict) else np.zeros(len(ids), dtype=bool)
                )
                np.add.at(acc, pos[hit], sc[hit])
                np.add.at(cnt, pos[hit], 1)
            return restrict, acc, cnt

        # -- θ seed (step 2) --------------------------------------------------
        order = np.lexsort((m_first, -m_ub))
        seed_keys: set = set()
        taken: dict[str, int] = {}
        for i in order:
            t = m_terms[i]
            if taken.get(t, 0) < seed_blocks:
                seed_keys.add((t, int(m_first[i])))
                taken[t] = taken.get(t, 0) + 1
        seed_arrays = self._read_block_postings(seed_keys)
        seed_arrays = self._filter_live(seed_arrays, allowed)
        theta = 0.0
        if seed_arrays:
            _, s_acc, s_cnt = fold(seed_arrays, None)
            elig = (
                s_acc[s_cnt == len(terms)] if conjunctive else s_acc
            )
            if len(elig) >= k:
                theta = float(np.partition(elig, -k)[-k])

        # -- prune + candidate blocks (steps 3-4) -------------------------------
        bound = m_ub + np.fromiter(
            ((sum_ub - g_ub[t]) for t in m_terms),
            dtype="float64", count=len(m_terms),
        )
        # fp-guarded θ: a bound that mathematically equals θ can land a
        # few ULPs below it (different multiplication order than the
        # exact fold) — see operators.wand.theta_guard
        from ..operators.wand import theta_guard
        theta_cmp = theta_guard(theta)
        surv = bound >= theta_cmp if theta > 0.0 else np.ones(
            len(m_ub), dtype=bool
        )
        global_surv = int(surv.sum())
        if theta > 0.0 and len(scorable) > 1 and surv.any():
            surv &= self._range_refine(
                scorable, m_terms, m_first, m_max, m_ub, theta, surv
            )
        if surv.all():
            # adaptive fallback: θ cannot beat ANY block bound (even
            # range-refined), so pruning would read every block anyway —
            # decode-all + restricted rescore is strictly more work than
            # the exhaustive fold over the same postings. Answer
            # exhaustively (identical results, pytest-gated) and cache
            # the shape so repeat probes skip the metadata/seed work.
            if allowed_ids is None:
                self._wand_plan_cache[plan_key] = True
                while len(self._wand_plan_cache) > WAND_PLAN_CACHE_SHAPES:
                    self._wand_plan_cache.popitem(last=False)
            self.last_wand_stats.update(
                terms=len(scorable), blocks_total=int(len(m_ub)),
                surviving_blocks=int(len(m_ub)),
                global_surviving_blocks=global_surv,
                blocks_read=len(seed_keys), theta=theta,
                fallback="exhaustive",
            )
            return self.search_bm25(
                text, k=k, conjunctive=conjunctive,
                allowed_ids=allowed_ids, with_results=with_results,
            )
        surv_keys = {
            (m_terms[i], int(m_first[i])) for i in np.flatnonzero(surv)
        }
        surv_arrays = self._read_block_postings(surv_keys)
        surv_arrays = self._filter_live(surv_arrays, allowed)
        if not surv_arrays:
            self.last_wand_stats.update(
                terms=len(scorable), blocks_total=int(len(m_ub)),
                surviving_blocks=int(surv.sum()),
                global_surviving_blocks=global_surv,
                blocks_read=len(seed_keys | surv_keys), theta=theta,
            )
            return empty
        cand = np.unique(np.concatenate(
            [a[0] for a in surv_arrays.values()]
        ))
        # exact rescoring needs every term's contribution for the
        # candidates — pull in the candidate-overlapping blocks the
        # bound pruned (range test via two searchsorted passes)
        lo = np.searchsorted(cand, m_first, side="left")
        hi = np.searchsorted(cand, m_max, side="right")
        overlap = hi > lo
        need_keys = {
            (m_terms[i], int(m_first[i]))
            for i in np.flatnonzero(overlap | surv)
        }
        extra = need_keys - surv_keys
        if extra:
            more = self._filter_live(
                self._read_block_postings(extra), allowed
            )
            for t, (ids, tf, dl) in more.items():
                if t in surv_arrays:
                    p_ids, p_tf, p_dl = surv_arrays[t]
                    surv_arrays[t] = (
                        np.concatenate([p_ids, ids]),
                        np.concatenate([p_tf, tf]),
                        np.concatenate([p_dl, dl]),
                    )
                else:
                    surv_arrays[t] = (ids, tf, dl)
        cand, acc, cnt = fold(surv_arrays, cand)
        keep = cnt > 0
        if conjunctive:
            keep &= cnt == len(terms)
        cand, acc, cnt = cand[keep], acc[keep], cnt[keep]
        self.last_wand_stats.update(
            terms=len(scorable), blocks_total=int(len(m_ub)),
            surviving_blocks=int(surv.sum()),
            global_surviving_blocks=global_surv,
            blocks_read=len(seed_keys | need_keys),
            candidates=int(len(cand)), theta=theta,
        )
        top = np.lexsort((cand, -acc))[:k]
        out = pd.DataFrame({
            "doc_id": cand[top],
            "score": acc[top],
            "n_terms": cnt[top].astype("int64"),
        })
        if not with_results:
            return out
        return self._render_bm25(out, words, quotes)

    @staticmethod
    def _range_refine(
        scorable: list,
        m_terms: list,
        m_first: np.ndarray,
        m_max: np.ndarray,
        m_ub: np.ndarray,
        theta: float,
        surv: np.ndarray,
    ) -> np.ndarray:
        """Range-aware (true Block-Max) tightening of the global bound,
        the numpy twin of operators/wand.py's ``_range_refine``: the
        doc-id space is cut into a fixed ≤4096-bucket grid (span from the
        OBSERVED doc-id high-water mark, so sparse id spaces never
        overflow the grid); each term's per-bucket max block ub replaces
        the corpus-global ``max_ub(t')`` in the Σ-other bound, so a head
        term's block in a doc range where the tail term NEVER occurs gets
        other-ub 0 and dies — the shape where the global bound provably
        prunes nothing. Never looser than the global bound
        (bucket_ub ≤ global_ub pointwise). Returns a keep-mask to AND
        into ``surv``."""
        from ..operators.wand import WAND_RANGE_GRID, theta_guard

        grid = WAND_RANGE_GRID
        span = max(1, int(int(m_max.max()) // grid + 1))
        g1 = np.minimum(m_first // span, grid - 1).astype("int64")
        g2 = np.minimum(m_max // span, grid - 1).astype("int64")
        tid_of = {t: j for j, t in enumerate(scorable)}
        m_tid = np.fromiter(
            (tid_of[t] for t in m_terms), dtype="int64",
            count=len(m_terms),
        )
        B = np.zeros((len(scorable), grid))
        single = g1 == g2
        np.maximum.at(B, (m_tid[single], g1[single]), m_ub[single])
        for i in np.flatnonzero(~single):
            seg = B[m_tid[i], g1[i]:g2[i] + 1]
            np.maximum(seg, m_ub[i], out=seg)
        tot = B.sum(axis=0)
        theta_cmp = theta_guard(theta)  # fp-guarded, see operators.wand
        keep = np.ones(len(m_ub), dtype=bool)
        check = surv & single
        keep[check] = (
            m_ub[check]
            + tot[g1[check]] - B[m_tid[check], g1[check]]
        ) >= theta_cmp
        for i in np.flatnonzero(surv & ~single):
            other = (
                tot[g1[i]:g2[i] + 1] - B[m_tid[i], g1[i]:g2[i] + 1]
            )
            keep[i] = m_ub[i] + float(other.max()) >= theta_cmp
        return keep

    def _filter_live(
        self, arrays: dict, allowed: Optional[np.ndarray]
    ) -> dict:
        """Drop tombstoned (and, when gated, disallowed) postings from
        decoded ``term -> (ids, tf, dl)`` arrays."""
        out = {}
        for t, (ids, tf, dl) in arrays.items():
            m = self._mask_dead(ids)
            if allowed is not None:
                m &= np.isin(ids, allowed, assume_unique=False)
            if m.any():
                out[t] = (ids[m], tf[m], dl[m])
        return out
