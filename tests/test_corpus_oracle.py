"""DuckDB-oracle gate over every ``queries()`` entry (driver contract).

Local replica of the driver's CORRECTNESS check: each operator's Spark
DataFrame program runs at sf0.001 and is compared — row count, column
names, order-insensitive values — against its ANSI-SQL twin executed by
DuckDB on the same parquet files. Mirrors the reference's end-to-end test
strategy (/root/reference/src/engine.test.ts) lifted to the corpus
operators of SURVEY.md §2 plus the training-data pipeline ops.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from search_engine_spark.operators.corpus_queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isclose(v, round(v), abs_tol=1e-9):
                    v = float(round(v))
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_duckdb_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    s_rows = [r.asDict() for r in sdf.collect()]
    if not sql:
        assert len(s_rows) >= 0  # rows-only contract (non-SQL-expressible)
        return
    cur = duck.execute(sql)
    d_cols = [d[0] for d in cur.description]
    assert sorted(sdf.columns) == sorted(d_cols)
    order = sorted(sdf.columns)
    s_norm = normalize(s_rows, order)
    d_norm = normalize(
        [dict(zip(d_cols, r)) for r in cur.fetchall()], order
    )
    assert len(s_norm) == len(d_norm)
    assert s_norm == d_norm
