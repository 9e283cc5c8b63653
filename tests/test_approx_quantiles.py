"""Approx-quantile scale variants: percentile_approx results must sit
within the sketch's documented RANK-error bound of the exact path —
approx pX ∈ [exact p(X−ε), exact p(X+ε)] with ε = 1/accuracy — and the
approx IQR fences must not move outlier counts beyond what that rank
drift permits."""

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.corpus_queries import (
    APPROX_PCT_ACCURACY,
    q_value_percentiles,
)
from search_engine_spark.operators.stats_extras import q_iqr_outliers

SF_DIR = "/root/testdata/sf0.01"
EPS = 1.0 / APPROX_PCT_ACCURACY


def _exact_bounds(spark, pcts):
    """{event_type: {p: (lo_value, hi_value)}} from the exact percentile
    at ranks p±δ — the envelope the sketch guarantees. δ = rank error ε
    PLUS one element of spacing (2/n): percentile_approx returns an
    ACTUAL element while the exact percentile interpolates between
    neighbours, so the discretization adds up to one rank step of drift
    on top of the sketch bound."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_min = min(
        r["n"]
        for r in ev.groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    )
    delta = EPS + 2.0 / n_min
    lo = [max(0.0, p - delta) for p in pcts]
    hi = [min(1.0, p + delta) for p in pcts]
    rows = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(*[F.lit(p) for p in lo])).alias("lo"),
        F.percentile("value", F.array(*[F.lit(p) for p in hi])).alias("hi"),
    ).collect()
    return {
        r["event_type"]: {
            p: (r["lo"][i], r["hi"][i]) for i, p in enumerate(pcts)
        }
        for r in rows
    }


def test_value_percentiles_within_rank_error(spark):
    bounds = _exact_bounds(spark, [0.5, 0.9, 0.99])
    approx = {
        r["event_type"]: r
        for r in q_value_percentiles(spark, SF_DIR, approx=True).collect()
    }
    exact = {
        r["event_type"]: r
        for r in q_value_percentiles(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for et, row in approx.items():
        assert row["n"] == exact[et]["n"]
        for col, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            lo, hi = bounds[et][p]
            assert lo - 1e-9 <= row[col] <= hi + 1e-9, (et, col, row[col], lo, hi)


def test_iqr_outliers_approx_close_to_exact(spark):
    exact = {
        r["event_type"]: r for r in q_iqr_outliers(spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: r
        for r in q_iqr_outliers(spark, SF_DIR, approx=True).collect()
    }
    assert set(approx) == set(exact)
    for et in exact:
        ne, na = exact[et]["n_outliers"], approx[et]["n_outliers"]
        # fences built from quantiles with <=1e-4 rank drift can only
        # reclassify a sliver of the tail; allow 1% relative + 5 absolute
        assert abs(na - ne) <= max(5, 0.01 * ne), (et, ne, na)


@pytest.mark.parametrize("fn", [q_value_percentiles, q_iqr_outliers])
def test_approx_plan_is_single_aggregate_no_sort(spark, fn):
    """The sketch path must stay a partial-aggregable groupBy (ObjectHash
    aggregate), never a per-group global sort — that's the property that
    makes it the 100 TB path."""
    df = fn(spark, SF_DIR, approx=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan or "percentile_approx" in plan, plan
