"""Exact vs approx quantile timing at scale: replicate the events table
N× (distinct user_ids per replica, same value distribution) and time
q_value_percentiles / q_iqr_outliers in both modes, interleaved best-of
so co-tenant CPU steal can't bias one side.

The exact interpolating `percentile` buffers every group value (sort per
group); `percentile_approx` is a mergeable Greenwald-Khanna sketch that
partial-aggregates map-side — the gap is what a 100 TB corpus pays.

Usage: python tools/quantile_bench.py [sf_dir] [replicate] [reps] [accuracy]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from search_engine_spark.operators.corpus_queries import (
    APPROX_PCT_ACCURACY,
)
from search_engine_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    accuracy = (
        int(sys.argv[4]) if len(sys.argv) > 4 else APPROX_PCT_ACCURACY
    )
    spark = get_spark()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    big = (
        ev.crossJoin(
            spark.range(replicate).select(F.col("id").alias("rep"))
        )
        .select(
            "event_type",
            "value",
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        )
    )
    big.persist()
    n = big.count()  # materialize once so neither side pays the build

    ps = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    variants = {
        "exact": lambda: big.groupBy("event_type")
        .agg(F.percentile("value", ps).alias("p"))
        .collect(),
        "approx": lambda: big.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", ps, F.lit(accuracy)
            ).alias("p")
        )
        .collect(),
    }
    best: dict[str, float] = {}
    runs: dict[str, list] = {k: [] for k in variants}
    for _ in range(max(1, reps)):  # interleaved: exact, approx, exact, ...
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))
    for name in variants:
        best[name] = min(runs[name])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "replicate": replicate,
                "n_rows": n,
                "accuracy": accuracy,
                "best_sec": best,
                "all_runs_sec": runs,
                "speedup_exact_over_approx": round(
                    best["exact"] / max(best["approx"], 1e-9), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
