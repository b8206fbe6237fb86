"""Relational query family over the TPC-H-ish star schema: joins,
grouped aggregation, windows, top-n — the general-purpose surface a
user expects alongside the vector operators.

Scale notes baked into each plan:

* dimension tables (region/nation/customer/supplier/part) are
  broadcast — the fact-table scan never shuffles for them;
* money sums go through DECIMAL so results are independent of
  partition addition order (and of AQE's runtime re-partitioning);
* top-n is ORDER BY + LIMIT (TakeOrderedAndProject), never a full
  sort; per-group top-n is a window rank after a partial agg.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.registry import register


def _dec(col: str, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})")


@register(
    "revenue_by_nation",
    sql="""
    SELECT n.n_name AS nation,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim star join: lineitem ⋈ orders ⋈ customer ⋈ nation with
    the three dimension sides broadcast — single shuffle (final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(broadcast(orders.select("o_orderkey", "o_custkey")),
                li.l_orderkey == F.col("o_orderkey"))
        .join(broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "top_customers",
    sql="""
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice::DECIMAL(18,4)) AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_name AS customer, c.c_mktsegment AS segment,
           round(CAST(s.total AS DOUBLE), 2) AS total_spend
    FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
    ORDER BY s.total DESC, c.c_custkey ASC
    LIMIT 10
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-n after aggregation: partial-agg the fact table, join
    the small result to the dimension, TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("total")
    )
    return (
        spend.join(broadcast(cust), spend.o_custkey == cust.c_custkey)
        .orderBy(F.desc("total"), F.col("c_custkey").asc())
        .limit(10)
        .select(
            F.col("c_name").alias("customer"),
            F.col("c_mktsegment").alias("segment"),
            F.round(F.col("total").cast("double"), 2).alias("total_spend"),
        )
    )


@register(
    "top_parts_per_brand",
    sql="""
    WITH qty AS (
      SELECT l_partkey, sum(l_quantity::DECIMAL(18,4)) AS total_qty
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT p.p_brand, p.p_name, q.total_qty,
             row_number() OVER (PARTITION BY p.p_brand
                                ORDER BY q.total_qty DESC, p.p_partkey ASC)
               AS rnk
      FROM qty q JOIN part p ON q.l_partkey = p.p_partkey
    )
    SELECT p_brand AS brand, p_name AS part_name,
           round(CAST(total_qty AS DOUBLE), 2) AS total_qty,
           rnk::BIGINT AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n: partial agg on the fact side first (shuffle
    carries one row per part, not per lineitem), then window rank
    within each brand."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = li.groupBy("l_partkey").agg(F.sum(_dec("l_quantity")).alias("total_qty"))
    joined = qty.join(broadcast(part), qty.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("total_qty"), F.col("p_partkey").asc()
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_name").alias("part_name"),
            F.round(F.col("total_qty").cast("double"), 2).alias("total_qty"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "running_revenue",
    sql="""
    WITH daily AS (
      SELECT o_custkey, o_orderdate,
             sum(o_totalprice::DECIMAL(18,4)) AS day_total
      FROM orders
      WHERE o_custkey < 50
      GROUP BY o_custkey, o_orderdate
    )
    SELECT o_custkey, o_orderdate,
           round(CAST(sum(day_total) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_total
    FROM daily
    """,
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-window cumulative sum per customer (the same window
    shape that powers context assembly's char budget)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.sum(_dec("o_totalprice")).alias("day_total"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("day_total").over(w).cast("double"), 2).alias(
            "running_total"
        ),
    )


@register(
    "order_priority_counts",
    sql="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + grouped count — TPC-H Q4 shape; the
    left-semi join keeps the orders scan narrow."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = orders.filter(
        F.col("o_orderdate")
        >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    )
    has_late = filtered.join(
        li,
        (li.l_orderkey == filtered.o_orderkey)
        & (li.l_shipdate > filtered.o_orderdate),
        "left_semi",
    )
    return has_late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "shipping_priority",
    sql="""
    SELECT l_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact/dim joins → grouped revenue →
    global top-10.  The customer filter is pushed to the (broadcast)
    dim scan, the two date predicates to the fact scans; the LIMIT
    rides a TakeOrderedAndProject over the aggregate, with l_orderkey
    as the deterministic tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            broadcast(
                orders.filter(F.col("o_orderdate") < cutoff).select(
                    "o_orderkey", "o_custkey", "o_orderdate"
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            broadcast(
                cust.filter(F.col("c_mktsegment") == "BUILDING").select(
                    "c_custkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "customer_order_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving order-less customers →
    per-customer count → distribution over counts.  Two aggregations,
    but the second one's input is one row per customer — the heavy
    shuffle happens once, on the join key."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "small_quantity_revenue",
    sql="""
    WITH part_avg AS (
      SELECT l_partkey, avg(CAST(l_quantity AS DECIMAL(18,4))) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_small,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                      AS DOUBLE) / 7.0, 2) AS avg_weekly
    FROM lineitem l JOIN part_avg p ON l.l_partkey = p.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,4)) < 0.5 * p.avg_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-key aggregate joined back to the fact
    table (the relational rewrite of a correlated scalar subquery).
    The per-part average is DECIMAL so the below-half-average predicate
    is exact in both engines (quantities are integral; the boundary is
    on a coarse 1/(2·count) grid that decimal rounding can't cross).
    No broadcast hint: the per-key frame is part-table-sized, so AQE
    picks broadcast at bench scale while the plan stays a co-keyed
    shuffle join at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = (
        li.groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.avg(_dec("l_quantity")).alias("avg_qty"))
    )
    joined = li.join(part_avg, li.l_partkey == part_avg.p_key).filter(
        _dec("l_quantity") < F.lit(0.5) * F.col("avg_qty")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
        ).alias("avg_weekly"),
    )


@register(
    "idle_high_balance_customers",
    sql="""
    WITH avg_bal AS (
      SELECT avg(CAST(c_acctbal AS DECIMAL(18,4))) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment AS segment,
           count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                      AS DOUBLE), 2) AS total_bal
    FROM customer, avg_bal
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (the 1-row average
    frame cross-joined in — Spark broadcasts it) + NOT EXISTS anti
    join against a filtered fact, grouped.  The acctbal comparison is
    DECIMAL-exact on both engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_dec("c_acctbal")).alias("ab")
    )
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.join(broadcast(avg_bal))
        .filter(_dec("c_acctbal") > F.col("ab"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias(
                "total_bal"
            ),
        )
    )
