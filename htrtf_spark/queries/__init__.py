"""Registry of (Spark query, DuckDB oracle SQL) pairs for the driver gate.

Each module exports ``QUERIES: dict[name, (fn, sql|None)]`` where ``fn``
takes (spark, sf_dir) → DataFrame and ``sql`` is the ANSI-SQL equivalent
DuckDB runs on the same parquet (views pre-registered by the driver).
``sql=None`` marks genuinely non-SQL-expressible ops (rows-only check).

Parity rules used throughout (so value-hash comparisons can't flake):
- money/measure doubles are converted to exact integer cents ONCE per row
  (CAST(ROUND(x*100) AS BIGINT)) and aggregated in integer domain;
- every computed column is aliased identically on both sides;
- every ORDER BY ... LIMIT is totally tie-broken;
- ratios are returned as basis points (bigint), never raw doubles.
"""

from __future__ import annotations

from htrtf_spark.queries import (
    dedup,
    extraction_queries,
    pipeline_queries,
    relational,
    relational2,
    relational3,
    relational4,
    textops,
    textops2,
    vectors,
    vectors2,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    textops,
    textops2,
    dedup,
    vectors,
    vectors2,
    extraction_queries,
    pipeline_queries,
]


def registry() -> dict[str, tuple]:
    merged: dict[str, tuple] = {}
    for m in _MODULES:
        for name, pair in m.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = pair
    return merged


def spark_queries():
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sqls():
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
