"""Shared helpers for the query registry."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def cents(col: str | F.Column) -> F.Column:
    """Exact integer cents from a 2-decimal double (identical in DuckDB as
    CAST(ROUND(x*100) AS BIGINT); both engines compute the same correctly
    rounded double product, and 2dp data never lands on .5 exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def bp(num: F.Column, den: F.Column) -> F.Column:
    """Exact basis points: ROUND(10000*num/den) as bigint (num, den exact
    ints → the division is a single correctly-rounded op both engines)."""
    return F.round(num * F.lit(10000.0) / den).cast("long")


# --- canonical clean restatement (single source for every oracle) -------
from htrtf_spark import charset as _cs

NEG_SQL = _cs.CHARSET_FILTER_PATTERN.replace("'", "''")
WS_RUN_SQL = _cs.WS_RUN_PATTERN.replace("'", "''")


def clean_sql(col: str) -> str:
    """DuckDB restatement of the canonical clean (charset projection +
    whitespace canonicalization), using the same EXPLICIT character
    classes as the Python and JVM sides (charset.WS_CHARS) — '\\s' is
    not portable across re/Java/RE2."""
    return (
        f"trim(regexp_replace(regexp_replace({col}, '{NEG_SQL}', '', 'g'), "
        f"'{WS_RUN_SQL}', ' ', 'g'))"
    )
