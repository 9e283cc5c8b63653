"""Streaming heavy hitters: exactness at full capacity, the space-saving
guarantees under eviction, and bounded state.

Three properties, per the module docstring:
1. capacity ≥ distinct terms per bucket → summary == exact batch counts;
2. small capacity → every true heavy hitter (count > N_bucket/capacity)
   survives, and count_est − err ≤ true ≤ count_est for present terms;
3. summary size per bucket never exceeds capacity.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.streaming.heavy_hitters import (  # noqa: E402
    HH_BUCKETS,
    batch_term_counts,
    read_summary,
    stream_heavy_hitters,
    term_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _true_counts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {
        r["term"]: r["n"] for r in batch_term_counts(docs).collect()
    }


def test_full_capacity_is_exact(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_distinct = batch_term_counts(docs).count()
    in_dir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(in_dir)

    out = str(tmp_path / "out")
    stream_heavy_hitters(
        spark, in_dir, out, str(tmp_path / "ckpt"),
        capacity=n_distinct + 8, max_files_per_trigger=1,
    )
    got = {
        r["term"]: (r["count_est"], r["err"])
        for r in read_summary(spark, out).collect()
    }
    true = _true_counts(spark)
    assert {t: c for t, (c, _e) in got.items()} == true
    assert all(e == 0 for _c, e in got.values())


def test_eviction_guarantees_hold(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    in_dir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(in_dir)

    capacity = 8  # far below distinct-per-bucket -> evictions fire
    out = str(tmp_path / "out")
    stream_heavy_hitters(
        spark, in_dir, out, str(tmp_path / "ckpt"),
        capacity=capacity, max_files_per_trigger=1,
    )
    summary = read_summary(spark, out)
    rows = summary.collect()
    true = _true_counts(spark)

    # per-bucket N (true totals) and capacity bound on summary size
    bucket_of = {
        r["term"]: r["bucket"]
        for r in term_stream(docs).distinct().collect()
    }
    n_bucket: dict[int, int] = {}
    for t, n in true.items():
        n_bucket[bucket_of[t]] = n_bucket.get(bucket_of[t], 0) + n
    per_bucket_rows: dict[int, int] = {}
    for r in rows:
        per_bucket_rows[r["bucket"]] = per_bucket_rows.get(r["bucket"], 0) + 1
    assert all(v <= capacity for v in per_bucket_rows.values())
    assert set(per_bucket_rows) <= set(range(HH_BUCKETS))

    present = {r["term"]: r for r in rows}
    # (1) no false negatives above N/capacity
    for t, n in true.items():
        if n > n_bucket[bucket_of[t]] / capacity:
            assert t in present, (t, n)
    # (2) estimates bracket truth
    for t, r in present.items():
        assert r["count_est"] >= true[t], (t, r)
        assert r["count_est"] - r["err"] <= true[t], (t, r)


def test_summary_totals_match_stream_length(spark, tmp_path):
    """Σ count_est per bucket == terms processed in that bucket — the
    invariant the heavy-hitter guarantee's proof depends on."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    in_dir = str(tmp_path / "in")
    docs.repartition(2).write.parquet(in_dir)
    out = str(tmp_path / "out")
    stream_heavy_hitters(
        spark, in_dir, out, str(tmp_path / "ckpt"),
        capacity=8, max_files_per_trigger=1,
    )
    got = (
        read_summary(spark, out)
        .groupBy("bucket")
        .agg(F.sum("count_est").alias("s"))
    )
    want = term_stream(docs).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    g = {r["bucket"]: r["s"] for r in got.collect()}
    w = {r["bucket"]: r["n"] for r in want.collect()}
    assert g == w
