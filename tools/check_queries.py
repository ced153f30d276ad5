"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and an order-insensitive value
comparison. Usage: python tools/check_queries.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from datetime import date, datetime

import duckdb


def _norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == 0.0:
            v = 0.0  # fold -0.0 and +0.0 (numerically equal)
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def compare(spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return False, f"schema mismatch: spark={s_cols} duck={d_cols}"
    s_rows = spark_df.select(*s_cols).collect()
    idx = [duck_cols.index(c) for c in s_cols]
    s_set = sorted(tuple(_norm(v) for v in r) for r in s_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in idx) for r in duck_rows)
    if len(s_set) != len(d_set):
        return False, f"row count: spark={len(s_set)} duck={len(d_set)}"
    for a, b in zip(s_set, d_set):
        if a != b:
            return False, f"value mismatch:\n  spark={a}\n  duck ={b}"
    return True, f"{len(s_set)} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from htrtf_spark.queries import registry
    from htrtf_spark.session import get_spark

    spark = get_spark(app_name="check_queries", master="local[8]")
    con = duckdb.connect()
    for tbl in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    failures = []
    for name, (fn, sql) in sorted(registry().items()):
        if name_filter and name_filter not in name:
            continue
        try:
            df = fn(spark, sf_dir)
            if sql is None:
                n = df.count()
                print(f"  {name}: rows-only, {n} rows")
                if n == 0 and "metrics" not in name:
                    failures.append((name, "0 rows"))
                continue
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            ok, msg = compare(df, duck_rows, duck_cols)
            status = "OK " if ok else "FAIL"
            print(f"  {name}: {status} {msg}")
            if not ok:
                failures.append((name, msg))
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: ERROR {str(exc)[:300]}")
            failures.append((name, str(exc)[:300]))

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"  - {name}: {msg[:200]}")
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
