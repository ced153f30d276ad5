"""Registry consistency: every oracle key exists in queries, names are
unique, and SQL strings are well-formed enough for DuckDB to parse
against empty views (catches SQL typos without running Spark)."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from htrtf_spark.queries import oracle_sqls, registry, spark_queries
from htrtf_spark.queries.extraction_queries import _Q34_INPUT


def _seed_q34_input(con) -> None:
    """The q34 oracle reads the parquet its Spark query materializes to
    a fixed /tmp path (the SQL text is frozen). On a clean /tmp the
    artifact does not exist yet, so the parse-only test would fail on
    I/O, not SQL — seed an EMPTY parquet with the input schema iff the
    directory holds no real artifact (a real one is never touched)."""
    if not glob.glob(os.path.join(_Q34_INPUT, "*.parquet")):
        os.makedirs(_Q34_INPUT, exist_ok=True)
        con.execute(
            "COPY (SELECT CAST(NULL AS VARCHAR) AS conv_id, "
            "CAST(NULL AS INTEGER) AS turn_idx, "
            "CAST(NULL AS VARCHAR) AS role, CAST(NULL AS VARCHAR) AS text "
            f"WHERE false) TO '{_Q34_INPUT}/seed.parquet' (FORMAT PARQUET)"
        )

TABLES = {
    "region": "r_regionkey INTEGER, r_name VARCHAR",
    "nation": "n_nationkey INTEGER, n_name VARCHAR, n_regionkey INTEGER",
    "customer": "c_custkey BIGINT, c_name VARCHAR, c_nationkey INTEGER, "
                "c_acctbal DOUBLE, c_mktsegment VARCHAR",
    "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INTEGER, s_acctbal DOUBLE",
    "part": "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, "
            "p_size INTEGER, p_retailprice DOUBLE",
    "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
              "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
    "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
                "l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, "
                "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
                "l_linestatus VARCHAR, l_shipdate TIMESTAMP",
    "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, "
              "value DOUBLE, props VARCHAR",
    "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
}


def test_registry_consistent():
    reg = registry()
    assert len(reg) >= 40
    qs, os_ = spark_queries(), oracle_sqls()
    # real invariant at the source: every registry entry is a
    # (callable, sql-string-or-None) pair
    for name, pair in reg.items():
        assert isinstance(pair, tuple) and len(pair) == 2, name
        assert callable(pair[0]), name
        assert pair[1] is None or isinstance(pair[1], str), name
    # at least 3/4 of queries carry a full SQL oracle
    assert len(os_) / len(qs) >= 0.75


@pytest.mark.parametrize("name", sorted(oracle_sqls()))
def test_oracle_sql_parses_in_duckdb(name):
    con = duckdb.connect()
    for tbl, ddl in TABLES.items():
        con.execute(f"CREATE TABLE {tbl} ({ddl})")
    if name == "q34_extract_synthetic":
        _seed_q34_input(con)
    con.execute(oracle_sqls()[name]).fetchall()  # empty tables → just parse/run
