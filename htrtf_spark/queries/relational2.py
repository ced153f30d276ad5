"""Advanced relational batch: cube/rollup/grouping sets, conditional-agg
pivot, exact percentiles, as-of join, approx-distinct sanity — the
"Spark gives these for free" extensions SURVEY.md §2.4 notes the
reference lacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from htrtf_spark.operators.asof import asof_join
from htrtf_spark.queries.util import cents, t

# --------------------------------------------------------------------- q43


def q43_cube_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum(cents("l_extendedprice")).alias("sum_c"))
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q43_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_c
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------- q44
# Pivot via conditional aggregation (engine-portable form).


def q44_pivot_status_by_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    outs = [
        F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).alias(f"n_{s}")
        for s in ["O", "F", "P"]
    ]
    return o.groupBy("o_orderpriority").agg(*outs).orderBy("o_orderpriority")


_Q44_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------- q45
# Exact median per group on integer cents (interpolating percentile —
# both engines interpolate identically on exact ints).


def q45_median_order_value(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    med = F.expr(
        "CAST(ROUND(percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)) AS BIGINT)"
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(med.alias("median_c"), F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


_Q45_SQL = """
SELECT o_orderpriority,
       CAST(ROUND(quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5))
            AS BIGINT) AS median_c,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------- q46
# As-of join: each 'click' event gets the most recent strictly-earlier
# 'view' value of the same user. Oracle restates the identical
# union+window construction in SQL (engine-portable by design).


def q46_asof_click_view(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", cents("value").alias("click_c")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", cents("value").alias("view_c")
    )
    out = asof_join(
        clicks, views, key="user_id", ts="ts",
        right_value_cols=["view_c"],
        left_tiebreak="event_id", right_tiebreak="event_id",
    )
    return out.select("user_id", "event_id", "click_c", "view_c_asof")


_Q46_SQL = """
WITH u AS (
  SELECT user_id AS k, ts, event_id AS tb, 1 AS side, event_id,
         CAST(ROUND(value*100) AS BIGINT) AS click_c,
         CAST(NULL AS BIGINT) AS view_c
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 0, event_id,
         NULL, CAST(ROUND(value*100) AS BIGINT)
  FROM events WHERE event_type = 'view'
), carried AS (
  -- row-carry semantics: the struct is non-null exactly for right rows,
  -- so LAST_VALUE(... IGNORE NULLS) attaches the most recent right ROW
  -- (mirrors the Spark operator; a bare column carry would skip rows
  -- whose value is NULL)
  SELECT k, ts, side, event_id, click_c,
         LAST_VALUE(CASE WHEN side = 0 THEN {'view_c': view_c} END IGNORE NULLS)
             OVER w AS rv
  FROM u
  WINDOW w AS (PARTITION BY k ORDER BY ts ASC, side DESC, tb ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT k AS user_id, event_id, click_c, rv.view_c AS view_c_asof
FROM carried WHERE side = 1
"""

# --------------------------------------------------------------------- q47
# Approx-distinct sanity: HLL estimate must land within 5% of exact
# (the approx value itself is engine-specific, so the oracle checks the
# invariant, not the estimate).


def q47_approx_distinct_sanity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            * F.lit(100)
            <= F.countDistinct("l_partkey") * F.lit(5)
        ).alias("approx_within_5pct"),
    )


_Q47_SQL = """
SELECT COUNT(DISTINCT l_partkey) AS n_exact,
       abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey)) * 100
         <= COUNT(DISTINCT l_partkey) * 5 AS approx_within_5pct
FROM lineitem
"""


QUERIES = {
    "q43_cube_rollup": (q43_cube_rollup, _Q43_SQL),
    "q44_pivot_status_by_priority": (q44_pivot_status_by_priority, _Q44_SQL),
    "q45_median_order_value": (q45_median_order_value, _Q45_SQL),
    "q46_asof_click_view": (q46_asof_click_view, _Q46_SQL),
    "q47_approx_distinct_sanity": (q47_approx_distinct_sanity, _Q47_SQL),
}
