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

# dense per-doc score accumulator cap for BM25: below this doc-id span a
# float64 scatter-add array (8 bytes/doc) beats sorting the concatenated
# posting ids; above it (or with sparse ids beyond 4× n_docs) the
# sort-based merge path runs — at fleet scale a shard never owns a dense
# doc space, so the merge path is the 100 TB shape
DENSE_SCORE_MAX_DOCS = 50_000_000


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
        self._tombstones = self._load_tombstones()
        self._df_map = self._load_term_stats()
        self._runs: Optional[dict] = None
        if pin_postings:
            self._pin_postings()
        self._pos_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._docs_pin: Optional[tuple] = None
        if pin_docs:
            self._pin_docs()

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
        cand = self._candidate_ids(words, quotes, lookup, allowed_ids)
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
    ) -> np.ndarray:
        """Candidate generation ≡ SearchEngine.candidates: single-list
        fast path (quote predicate SKIPPED, engine.ts:398-404), k-way
        intersection, fused phrase predicate; ascending doc_id, capped
        at INTERSECT_CAP after the allowed gate."""
        terms = sorted({w.lower() for w in lookup})
        allowed = self._as_id_array(allowed_ids)
        if len(lookup) == 1:
            arrays = self._term_arrays(terms)
            ids = (
                arrays[terms[0]][0]
                if terms[0] in arrays
                else np.empty(0, dtype="int64")
            )
            ids = self._apply_allowed(ids, allowed)
            return ids[:INTERSECT_CAP]
        ids = self._membership(terms)
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

    def _membership(self, terms: Sequence[str]) -> np.ndarray:
        """Docs containing EVERY term: fold of merge-based intersections
        over the per-term posting id arrays (each ascending-unique by
        build-time dedup, B5), smallest list first so each step is
        O(m log n) in the running intersection size m."""
        arrays = self._term_arrays(terms)
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
            out = []
            for doc in ids:
                i = int(np.searchsorted(d_ids, doc))
                if i < len(d_ids) and d_ids[i] == doc:
                    out.append((int(doc), titles[i], urls[i], words[i]))
            return out
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

    def search_bm25(
        self,
        text: str,
        k: int = 10,
        conjunctive: bool = False,
        allowed_ids: Optional[Iterable[int]] = None,
        with_results: bool = False,
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
        k1, b = self.config.bm25_k1, self.config.bm25_b
        n = float(self.corpus_stats["n_docs"])
        avgdl = float(self.corpus_stats["avgdl"]) or 1.0
        arrays = self._term_arrays(terms)
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
            return pd.DataFrame(columns=empty_cols)
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
            scores = acc[uniq]
            counts = cnt[uniq]
        else:
            # sparse doc ids (a fleet shard's slice of a 10^12-doc
            # space): sort-based merge, no dense allocation
            all_ids = np.concatenate(id_chunks)
            all_sc = np.concatenate(sc_chunks)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            scores = np.bincount(inv, weights=all_sc, minlength=len(uniq))
            counts = np.bincount(inv, minlength=len(uniq))
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
