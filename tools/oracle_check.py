"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isclose(v, round(v), abs_tol=1e-9):
                    v = float(round(v))
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [r.asDict() for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:28s} rows-only: {len(s_rows)} rows")
                continue
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
            ok_cols = sorted(s_cols) == sorted(d_cols)
            order = sorted(s_cols)
            s_norm = normalize(s_rows, order)
            d_norm = normalize(
                [dict(zip(d_cols, r)) for r in d_rows], order
            )
            ok_rows = len(s_norm) == len(d_norm)
            ok_vals = s_norm == d_norm
            status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name:28s} {status} rows {len(s_norm)}/{len(d_norm)}"
                f" cols={'ok' if ok_cols else (s_cols, d_cols)}"
                f" vals={'ok' if ok_vals else 'MISMATCH'}"
            )
            if not ok_vals:
                diff_s = [r for r in s_norm if r not in d_norm][:3]
                diff_d = [r for r in d_norm if r not in s_norm][:3]
                print("   spark-only:", diff_s)
                print("   duck-only :", diff_d)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
