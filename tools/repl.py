"""Interactive query REPL over a built index — the Spark analogue of the
reference's demo driver (/root/reference/src/demo.ts:159-190: readline
loop, per-query timing, top-10 results).

Usage:
    python tools/repl.py <index_dir> [--bm25] [--wand] [--k 10]

Builds nothing; point it at an index produced by
``search_engine_spark.operators.index_build.build_index`` or the streaming
ingester. Prints title / url / snippet per hit plus wall-clock latency.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.config import DEMO_STOP_WORDS, EngineConfig, ScoreWeights
from search_engine_spark.operators.search import SearchEngine
from search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--bm25", action="store_true", help="BM25 instead of reference scoring")
    ap.add_argument("--wand", action="store_true", help="block-max pruned BM25")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master)
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS, score_weights=ScoreWeights())
    # hot-index serving: pin tables in executor memory, drop AQE replanning
    engine = SearchEngine(spark, args.index_dir, config=cfg).warm().serve_mode()
    print(f"{engine.count()} documents indexed. Empty line quits.")

    while True:
        try:
            query = input("search> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not query:
            break
        t0 = time.time()
        # :mlt <doc_id> — more-like-this on a result's doc id
        if query.split()[0] == ":mlt":
            try:
                seed_id = int(query.split()[1])
            except (IndexError, ValueError):
                print("usage: :mlt <doc_id>")
                continue
            rows = engine.more_like_this(seed_id, k=args.k).collect()
            dt = 1000 * (time.time() - t0)
            for r in rows:
                print(
                    f"  {r['mlt_score']:9.4f}  doc {r['doc_id']}"
                    f"  ({r['n_shared']} shared terms)"
                )
            print(f"-- {len(rows)} similar docs in {dt:.1f} ms")
            continue
        # :role <role> <query> — restrict to one transcript role
        # (corpus_from_transcripts maps role:tool into the title)
        if query.split()[0] == ":role":
            parts = query.split(maxsplit=2)
            if len(parts) < 3:
                print("usage: :role <user|assistant|tool> <query>")
                continue
            from pyspark.sql import functions as F

            role_pred = F.col("title").startswith(parts[1] + ":")
            if args.bm25 or args.wand:
                # filtered RANKED retrieval: the metadata gate applies
                # before the top-k, and with_results projects the
                # user-facing title/snippet/url onto the BM25/WAND path
                rows = engine.search_bm25(
                    parts[2], k=args.k, use_wand=args.wand,
                    where=role_pred, with_results=True,
                ).collect()
            else:
                rows = engine.search(
                    parts[2], max_count=args.k, where=role_pred
                ).collect()
            dt = 1000 * (time.time() - t0)
            for r in rows:
                print(f"* {r['title']}  [{r['url']}]")
            print(f"-- {len(rows)} hits in {dt:.1f} ms (role={parts[1]})")
            continue
        # :fuzzy <query> — auto-correct out-of-vocabulary terms first
        if query.split()[0] == ":fuzzy":
            parts = query.split(maxsplit=1)
            text = parts[1] if len(parts) > 1 else ""
            if not text:
                print("usage: :fuzzy <query>")
                continue
            corrected, res = engine.search_fuzzy(text, max_count=args.k)
            rows = res.collect()
            dt = 1000 * (time.time() - t0)
            if corrected != text:
                print(f"   showing results for: {corrected}")
            for r in rows:
                print(f"* {r['title']}  [{r['url']}]")
            print(f"-- {len(rows)} hits in {dt:.1f} ms (fuzzy)")
            continue
        # extended boolean syntax (operators/boolean.py): only when the
        # user wrote a real marker atom (-word / word*), didn't ask for a
        # scored mode, and isn't using phrase quotes — the boolean filter
        # is unscored and bag-of-words, so it must never silently eat a
        # --bm25 request or quoted-adjacency semantics
        boolean_atoms = any(
            (a.startswith("-") or a.endswith("*")) and len(a) >= 2
            for a in query.split()
        )
        if boolean_atoms and not (args.bm25 or args.wand) and '"' not in query:
            rows = engine.search_boolean(query, max_count=args.k).collect()
            dt = 1000 * (time.time() - t0)
            for r in rows:
                print(f"* {r['title']}  [{r['url']}]")
            print(f"-- {len(rows)} hits in {dt:.1f} ms (boolean filter)")
            continue
        if args.bm25 or args.wand:
            rows = engine.search_bm25(
                query, k=args.k, use_wand=args.wand, with_results=True
            ).collect()
            dt = 1000 * (time.time() - t0)
            for r in rows:
                print(f"  {r['score']:9.4f}  {r['title']}  [{r['url']}]")
                print(f"    {r['introduction']}")
        else:
            rows = engine.search(query, max_count=args.k).collect()
            dt = 1000 * (time.time() - t0)
            for r in rows:
                print(f"* {r['title']}  [{r['url']}]")
                print(f"    {r['introduction']}")
        print(f"-- {len(rows)} hits in {dt:.1f} ms")
        if not rows:
            # did-you-mean: best correction per misspelled term
            fixes = [
                r
                for r in engine.suggest(query).collect()
                if r["rank"] == 1 and r["dist"] > 0
            ]
            if fixes:
                print(
                    "   did you mean: "
                    + " ".join(f"{r['query_term']}→{r['suggestion']}" for r in fixes)
                )


if __name__ == "__main__":
    main()
