"""WAND pruning under a realistic (heavy-tailed) term distribution.

The default synthetic corpus has ~50 uniformly-hot terms — worst case
for block-max pruning, so the headline bench honestly reports ~0 pruned
blocks for all-head-term queries. This harness builds the SAME corpus
with the deterministic `tail_vocab` long-tail knob
(sources/transcripts.py) and reports pruned-block fractions for mixed
head+tail query shapes, plus an equality check against exhaustive BM25
for every shape (the same losslessness pytest gates at small scale).

Usage: python tools/wand_zipf_bench.py [sf_dir] [replicate] [tail_vocab]
Prints one JSON line; paste-able into BENCH.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.config import (  # noqa: E402
    DEMO_STOP_WORDS,
    EngineConfig,
    ScoreWeights,
)
from search_engine_spark.operators.index_build import build_index  # noqa: E402
from search_engine_spark.operators.search import SearchEngine  # noqa: E402
from search_engine_spark.operators.wand import (  # noqa: E402
    wand_prune_stats,
    wand_topk,
)
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.sources.transcripts import (  # noqa: E402
    corpus_from_transcripts,
    synthesize_transcripts,
)


def main() -> dict:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tail_vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    spark = get_spark(master="local[16]")
    cfg = EngineConfig(stop_words=DEMO_STOP_WORDS, score_weights=ScoreWeights())
    tx = synthesize_transcripts(
        spark, f"{sf_dir}/documents.parquet",
        replicate=replicate, tail_vocab=tail_vocab,
    )
    idx = tempfile.mkdtemp(prefix="wand_zipf_")
    shutil.rmtree(idx, ignore_errors=True)
    res = build_index(
        spark, corpus_from_transcripts(tx), idx, config=cfg, segments=2
    )
    eng = SearchEngine(spark, idx, config=cfg)
    eng.warm(pin_docs=False)

    # query shapes over the skewed vocabulary: tail_1 is the hottest
    # tail term (~50% df), tail_20 mid (~0.2% df), tail_200 rare
    shapes = {
        "head_terms": "filter join window",
        "head_plus_mid_tail": "filter tail_20",
        "head_plus_rare_tail": "filter join tail_200",
        "two_tails": "tail_20 tail_200",
        "single_mid_tail": "tail_20",
    }
    out = {"n_turns": res.n_docs, "tail_vocab": tail_vocab, "shapes": {}}
    for name, q in shapes.items():
        exact = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search_bm25(q, k=10).collect()
        ]
        pruned = [
            (r["doc_id"], round(r["score"], 9))
            for r in wand_topk(eng, q, k=10).collect()
        ]
        st = wand_prune_stats(eng, q, k=10)
        last = st["rounds"][-1]
        out["shapes"][name] = {
            "query": q,
            "lossless": exact == pruned,
            "n_blocks": st["n_blocks"],
            "pruned_fraction": last["pruned_fraction"],
            "global_pruned_fraction": last["global_pruned_fraction"],
        }

    # serve-tier twin (serving/local.py wand_topk): the SAME bound
    # algebra answered in-process from block reads — pruning fractions
    # + losslessness vs the serve tier's exhaustive BM25, plus p50
    # latency, per shape
    import time as _time

    from search_engine_spark.serving import LocalIndexReader

    reader = LocalIndexReader(idx, config=cfg, pin_postings=False)
    out["serve_tier"] = {}
    for name, q in shapes.items():
        exact_pdf = reader.search_bm25(q, k=10)
        wand_pdf = reader.wand_topk(q, k=10)
        lossless = (
            list(exact_pdf["doc_id"]) == list(wand_pdf["doc_id"])
            and list(exact_pdf["score"]) == list(wand_pdf["score"])
        )
        st = dict(reader.last_wand_stats)
        samples = []
        for _ in range(20):
            tq = _time.time()
            reader.wand_topk(q, k=10)
            samples.append(_time.time() - tq)
        samples.sort()
        out["serve_tier"][name] = {
            "lossless": lossless,
            "blocks_total": st["blocks_total"],
            "blocks_read": st["blocks_read"],
            "read_fraction": round(
                st["blocks_read"] / max(1, st["blocks_total"]), 4
            ),
            "surviving_blocks": st["surviving_blocks"],
            "global_surviving_blocks": st["global_surviving_blocks"],
            "p50_ms": round(1000 * samples[len(samples) // 2], 3),
        }
    shutil.rmtree(idx, ignore_errors=True)
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
