"""Remaining small operator coverage: payload predicates, key
generation, projections/casts/defaults, grouping sets, set operators,
salted aggregation equivalence.

These close out the last SURVEY.md §2 rows that weren't already
exercised by a bigger query (#13 cast, #14 default column, #15 key
generation, #16 equality payload predicate, #22 slice) and add the
general-engine surfaces a Spark user expects (ROLLUP, UNION/INTERSECT/
EXCEPT) plus the skew-salting rewrite checked for result equivalence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.operators.skew import salted_agg
from legalchatbot_vectordb_exp_spark.registry import register


@register(
    "payload_filter_eq",
    sql="""
    SELECT vec_id, label FROM embeddings WHERE label = 5
    """,
)
def q_payload_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality payload predicate (#16, the reference's declared
    Filter/FieldCondition/MatchValue capability, ``Qdrant/main.py:4``):
    a plain pushed-down equi-filter on the payload column."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("label") == 5).select("vec_id", "label")


@register(
    "deterministic_ids",
    sql="""
    SELECT doc_id,
           sha256(doc_id || '|' || text) AS row_id,
           upper(substr(sha256(text), 1, 8)) AS short_key
    FROM documents
    """,
)
def q_deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key generation (#15): the reference uses uuid4 per point
    (``Qdrant/main.py:69``); the engine's reproducible variant is a
    content hash (uuid() exists but is excluded from oracles as
    non-deterministic — SURVEY.md §7 hard part c)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.concat(F.col("doc_id"), F.lit("|"), F.col("text")), 256).alias(
            "row_id"
        ),
        F.upper(F.substring(F.sha2(F.col("text"), 256), 1, 8)).alias(
            "short_key"
        ),
    )


@register(
    "cast_and_defaults",
    sql="""
    SELECT event_id,
           value::VARCHAR AS value_str,
           CAST(NULL AS VARCHAR) IS NULL AS has_default,
           '' AS predicted_law,
           coalesce(
             array_to_string(
               (regexp_extract_all(props, '[0-9]+'))[1:2], ','), '')
             AS first_two
    FROM events WHERE user_id = 1
    """,
)
def q_cast_and_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cast (#13), add-column-with-default (#14,
    ``Qdrant/llm.py:89-91``), and top-k slice (#22) in one projection.

    ``first_two`` is emitted as a comma-joined string (not an array) on
    both the Spark and DuckDB sides: the driver's canonicalizer sorts
    the pandas frame over all columns and list cells are unhashable.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 1)
        .withColumn("predicted_law", F.lit(""))  # the reference's default
        .select(
            "event_id",
            F.col("value").cast("string").alias("value_str"),
            F.lit(True).alias("has_default"),
            "predicted_law",
            F.concat_ws(
                ",",
                F.slice(
                    F.regexp_extract_all(
                        "props", F.lit("[0-9]+"), F.lit(0)
                    ),
                    1,
                    2,
                ),
            ).alias("first_two"),
        )
    )


@register(
    "sales_rollup",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(round(sum(l_quantity::DECIMAL(18,4)), 2) AS DOUBLE)
             AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (subtotals + grand total) —
    grouping-set expansion happens in one pass over the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2
            ).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "sales_cube",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(round(sum(l_extendedprice::DECIMAL(18,4)), 2) AS DOUBLE)
             AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE aggregation — all 2^k grouping sets including the
    cross margins ROLLUP lacks; still one pass over the scan (the
    grouping-set expansion happens before the single shuffle, and the
    partial aggregate combines map-side exactly as a plain groupBy)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2
            ).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n",
        )
    )


@register(
    "set_operators",
    sql="""
    WITH big_buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_totalprice > 300000
    ),
    urgent AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT 'both' AS tag, custkey FROM (
      SELECT custkey FROM big_buyers INTERSECT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'big_only' AS tag, custkey FROM (
      SELECT custkey FROM big_buyers EXCEPT SELECT custkey FROM urgent)
    """,
)
def q_set_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over derived key sets."""
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    both = big.intersect(urgent).select(F.lit("both").alias("tag"), "custkey")
    only = big.subtract(urgent).select(F.lit("big_only").alias("tag"), "custkey")
    return both.unionByName(only)


@register(
    "salted_agg_equivalence",
    sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(round(sum(value::DECIMAL(18,4)), 2) AS DOUBLE) AS total
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (hot-key mitigation) checked for
    exact result equivalence with the direct groupBy — the oracle IS
    the direct plan, so the rewrite's correctness is the assertion."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,4)")
    )
    out = salted_agg(
        ev.select("event_type", "value_dec"),
        key_cols=["event_type"],
        aggs={"n": ("event_type", "count"), "total_dec": ("value_dec", "sum")},
        n_salts=8,
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("total_dec"), 2).cast("double").alias("total"),
    )
