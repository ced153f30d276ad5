"""Relational operator families (SURVEY.md §2.2-2.8) as (Spark, DuckDB)
pairs over the driver's TPC-H-ish tables.

Coverage: filters/predicates (P-family), broadcast semi/anti joins (J1),
multi-way equi joins, global + grouped aggregation incl. partial+final
(A-family), windows: row_number/topk/lag/running (W-family), argmax via
total-tiebreak window (O1), union/except (U-family), string/math scalar
functions (F-family), sessionization.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from htrtf_spark.queries.util import bp, cents, t

# --------------------------------------------------------------------- q01
# TPC-H Q1 analog: grouped multi-agg with partial+final aggregation
# (reference analog: incremental cross-batch cost/CER accumulation,
# /root/reference/Projects/IAM_lines/Structure_006/Structure_006.py:128-159).


def q01_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(price_c).alias("sum_base_c"),
            F.sum(price_c * (100 - disc_pct)).alias("sum_disc_cc"),
            F.sum(price_c * (100 - disc_pct) * (100 + tax_pct)).alias("sum_charge_cccc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)    AS sum_qty_c,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_cc,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
           * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT)    AS sum_charge_cccc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------- q02
# Predicate family: isin + range + not-null (P2/P5/P6 analogs).


def q02_order_filter(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (cents("o_totalprice") > 5_000_00)
    ).select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("total_c")
    )


_Q02_SQL = """
SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
FROM orders
WHERE o_orderstatus IN ('O','F')
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND CAST(ROUND(o_totalprice*100) AS BIGINT) > 500000
"""

# --------------------------------------------------------------------- q03
# TPC-H Q3 analog: 3-way join + grouped agg + total-tiebreak top-k.


def q03_top_revenue_orders(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price_c * (100 - disc_pct)).alias("revenue_cc"))
        .orderBy(F.desc("revenue_cc"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q03_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cc DESC, l_orderkey ASC
LIMIT 10
"""

# --------------------------------------------------------------------- q04
# Broadcast LEFT SEMI join (J1, the set-membership join:
# create_IAM_lines_dataset.py:215-235).


def q04_customers_with_urgent_orders(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_Q04_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""

# --------------------------------------------------------------------- q05
# LEFT ANTI join (the file-exists/validity filter family P7).


def q05_customers_without_orders(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(cents("o_totalprice") > 480_000_00)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


_Q05_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(ROUND(o_totalprice*100) AS BIGINT) > 48000000)
"""

# --------------------------------------------------------------------- q06
# TPC-H Q5 analog: 5-way join through the dimension chain, broadcast dims.


def q06_revenue_per_nation(spark, sf_dir):
    region = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(price_c * (100 - disc_pct)).alias("revenue_cc"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


_Q06_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA','EUROPE')
GROUP BY n_name
ORDER BY n_name
"""

# --------------------------------------------------------------------- q07
# Global min/max/sum/count + threshold fractions in basis points
# (A2/A3/A4: find_max_height + quantile-ish counts,
# create_IAM_lines_dataset.py:108-142).


def q07_global_stats(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    vc = cents("value")
    return ev.agg(
        F.count("*").alias("n"),
        F.min(vc).alias("min_c"),
        F.max(vc).alias("max_c"),
        F.sum(vc).alias("sum_c"),
        bp(F.sum((vc > 50_00).cast("long")), F.count("*")).alias("frac_over_50_bp"),
        F.countDistinct("user_id").alias("n_users"),
    )


_Q07_SQL = """
SELECT COUNT(*) AS n,
       MIN(CAST(ROUND(value*100) AS BIGINT)) AS min_c,
       MAX(CAST(ROUND(value*100) AS BIGINT)) AS max_c,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
       CAST(ROUND(10000.0 * SUM(CASE WHEN CAST(ROUND(value*100) AS BIGINT) > 5000
                                     THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT)
           AS frac_over_50_bp,
       COUNT(DISTINCT user_id) AS n_users
FROM events
"""

# --------------------------------------------------------------------- q08
# Grouped audit counters (A9: reject-reason counts family).


def q08_event_type_counts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("sum_c"))
        .orderBy("event_type")
    )


_Q08_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY event_type ORDER BY event_type
"""

# --------------------------------------------------------------------- q09
# Argmax with witness via totally-tiebroken window (O1: find_max_height
# keeps the witness name, create_IAM_lines_dataset.py:108-117).


def q09_argmax_per_segment(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("bal_c"), F.asc("c_custkey")
    )
    return (
        cust.select("c_mktsegment", "c_custkey", cents("c_acctbal").alias("bal_c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_Q09_SQL = """
SELECT c_mktsegment, c_custkey, bal_c FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT) DESC,
                                     c_custkey ASC) AS rn
  FROM customer
) WHERE rn = 1
"""

# --------------------------------------------------------------------- q10
# Top-k per group (W3 family).


def q10_top3_events_per_user(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value_c"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", cents("value").alias("value_c"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


_Q10_SQL = """
SELECT user_id, event_id, value_c, rk FROM (
  SELECT user_id, event_id, CAST(ROUND(value*100) AS BIGINT) AS value_c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ROUND(value*100) AS BIGINT) DESC,
                                     event_id ASC) AS rk
  FROM events
) WHERE rk <= 3
"""

# --------------------------------------------------------------------- q11
# Running aggregates over an ordered window (W4: running-offset decode,
# utils.py:136-137,198-201).


def q11_running_totals(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(cents("value")).over(w).alias("run_sum_c"),
        F.count("*").over(w).alias("run_n"),
    )


_Q11_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_sum_c,
       COUNT(*)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n
FROM events
"""

# --------------------------------------------------------------------- q12
# lag + gap sessionization (streaming-like semantics in batch; SURVEY §2.12).


def q12_sessionize(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    new_sess = F.when(gap.isNull() | (gap > 600_000), 1).otherwise(0)
    sess = ev.select(
        "user_id", "event_id", new_sess.alias("is_new")
    ).withColumn("session_id", F.sum("is_new").over(
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    ))
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


_Q12_SQL = """
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 600000
              OR LAG(epoch_ms(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM sess GROUP BY user_id ORDER BY user_id
"""

# --------------------------------------------------------------------- q13
# Time bucketing: tumbling 1-hour windows expressed portably.


def q13_hourly_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("sum_c"))
        .orderBy("hour")
    )


_Q13_SQL = """
SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY 1 ORDER BY 1
"""

# --------------------------------------------------------------------- q14
# Set ops: UNION / EXCEPT with distinct semantics (U1/U2/U3).


def q14_brand_set_ops(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    economy = part.filter(F.col("p_type") == "ECONOMY").select("p_brand").distinct()
    large = part.filter(F.col("p_size") > 49).select("p_brand").distinct()
    standard = part.filter(F.col("p_type") == "STANDARD").select("p_brand").distinct()
    return (
        economy.union(standard).distinct().subtract(large)
        .orderBy("p_brand")
    )


_Q14_SQL = """
(SELECT DISTINCT p_brand FROM part WHERE p_type = 'ECONOMY'
 UNION
 SELECT DISTINCT p_brand FROM part WHERE p_type = 'STANDARD')
EXCEPT
SELECT DISTINCT p_brand FROM part WHERE p_size > 49
ORDER BY p_brand
"""

# --------------------------------------------------------------------- q15
# Scalar string functions (F1-F3, F7, F8): split_part, lpad, ceil, greatest.


def q15_string_math_funcs(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.ceil(F.col("c_acctbal")).cast("long").alias("bal_ceil"),
        F.greatest(cents("c_acctbal"), F.lit(0).cast("long")).alias("bal_pos_c"),
        F.length("c_name").alias("name_len"),
    )


_Q15_SQL = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       UPPER(c_mktsegment) AS seg_upper,
       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       GREATEST(CAST(ROUND(c_acctbal*100) AS BIGINT), 0) AS bal_pos_c,
       LENGTH(c_name) AS name_len
FROM customer
"""

# --------------------------------------------------------------------- q16
# Levenshtein (F6 — the CER edit-distance core, utils.py:29-47 /
# tf.edit_distance Structure_006.py:148,156).


def q16_levenshtein(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.lit("red widget")).alias("lev_to_ref"),
        F.levenshtein(F.col("p_brand"), F.col("p_type")).alias("lev_brand_type"),
    )


_Q16_SQL = """
SELECT p_partkey,
       levenshtein(p_name, 'red widget') AS lev_to_ref,
       levenshtein(p_brand, p_type) AS lev_brand_type
FROM part
"""

# --------------------------------------------------------------------- q17
# Grouping-key derivation join: revenue by customer prefix-key bucket
# (J1's derived-key flavor: '-'.join(name.split('-')[0:2])).


def q17_derived_key_rollup(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    key = F.substring(F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)), 1, 4)
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(key.alias("cust_prefix"))
        .agg(F.count("*").alias("n_orders"), F.sum(cents("o_totalprice")).alias("sum_c"))
        .orderBy("cust_prefix")
    )


_Q17_SQL = """
SELECT SUBSTRING(split_part(c_name, '#', 2), 1, 4) AS cust_prefix,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, _Q01_SQL),
    "q02_order_filter": (q02_order_filter, _Q02_SQL),
    "q03_top_revenue_orders": (q03_top_revenue_orders, _Q03_SQL),
    "q04_customers_with_urgent_orders": (q04_customers_with_urgent_orders, _Q04_SQL),
    "q05_customers_without_orders": (q05_customers_without_orders, _Q05_SQL),
    "q06_revenue_per_nation": (q06_revenue_per_nation, _Q06_SQL),
    "q07_global_stats": (q07_global_stats, _Q07_SQL),
    "q08_event_type_counts": (q08_event_type_counts, _Q08_SQL),
    "q09_argmax_per_segment": (q09_argmax_per_segment, _Q09_SQL),
    "q10_top3_events_per_user": (q10_top3_events_per_user, _Q10_SQL),
    "q11_running_totals": (q11_running_totals, _Q11_SQL),
    "q12_sessionize": (q12_sessionize, _Q12_SQL),
    "q13_hourly_rollup": (q13_hourly_rollup, _Q13_SQL),
    "q14_brand_set_ops": (q14_brand_set_ops, _Q14_SQL),
    "q15_string_math_funcs": (q15_string_math_funcs, _Q15_SQL),
    "q16_levenshtein": (q16_levenshtein, _Q16_SQL),
    "q17_derived_key_rollup": (q17_derived_key_rollup, _Q17_SQL),
}
