"""Scalar/window function breadth: the everyday SQL surface (window
rank family, datetime parts, string functions, JSON extraction, exact
distinct counts, null semantics) each pinned to the DuckDB oracle.

Cross-engine notes encoded here:
* day-of-week numbering differs (Spark ``dayofweek``: Sunday=1;
  DuckDB ``dow``: Sunday=0) — normalized to ISO (Monday=1..Sunday=7);
* JSON extraction goes through each engine's native JSON path;
* levenshtein is the standard DP distance in both.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.registry import register


@register(
    "window_functions",
    sql="""
    WITH spend AS (
      SELECT o_custkey, o_orderdate, o_totalprice
      FROM orders WHERE o_custkey < 20
    )
    SELECT o_custkey, o_orderdate,
           round(o_totalprice, 2) AS price,
           rank() OVER w::BIGINT AS rnk,
           dense_rank() OVER w::BIGINT AS drnk,
           ntile(4) OVER w::BIGINT AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           round(lag(o_totalprice, 1, 0.0) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS prev_price,
           round(lead(o_totalprice, 1, 0.0) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS next_price
    FROM (SELECT * FROM orders WHERE o_custkey < 20) o
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / lag / lead in one
    pass — Spark plans a single window exchange per distinct
    (partition, order) spec."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey").asc()
    )
    wt = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("price"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(wt), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1, 0.0).over(wt), 2).alias("next_price"),
    )


@register(
    "datetime_parts",
    sql="""
    SELECT event_id,
           extract(year FROM ts)::BIGINT AS y,
           extract(month FROM ts)::BIGINT AS mo,
           extract(day FROM ts)::BIGINT AS d,
           extract(hour FROM ts)::BIGINT AS h,
           extract(minute FROM ts)::BIGINT AS mi,
           isodow(ts)::BIGINT AS iso_dow,
           date_trunc('day', ts)::DATE AS day_start,
           strftime(ts, '%Y-%m-%d %H:00') AS hour_label
    FROM events WHERE event_id < 200
    """,
)
def q_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime part extraction over TIMESTAMP_NTZ, with day-of-week
    normalized to ISO (Monday=1): Spark dayofweek is Sunday=1, so
    iso = ((dayofweek + 5) % 7) + 1."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("mo"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("mi"),
        (((F.dayofweek("ts") + 5) % 7) + 1).cast("bigint").alias("iso_dow"),
        F.to_date("ts").alias("day_start"),
        F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_label"),
    )


@register(
    "string_functions",
    sql="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           replace(p_type, ' ', '_') AS type_key,
           lpad(p_brand, 12, '.') AS padded,
           substring(p_name, 1, 10) AS prefix10,
           length(p_name)::BIGINT AS name_len,
           reverse(p_brand) AS rbrand,
           split_part(p_type, ' ', 1) AS type_head
    FROM part WHERE p_partkey < 100
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: case, replace, pad, substring, reverse,
    split_part — all codegen'd JVM expressions."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_key"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.substring("p_name", 1, 10).alias("prefix10"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.reverse("p_brand").alias("rbrand"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "fuzzy_match_nations",
    sql="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name)::BIGINT AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
)
def q_fuzzy_match_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution shape) with a
    length-band blocking key, so the pair source is an equi-join, not
    an unconditioned self-join.

    Soundness: levenshtein(a,b) ≤ 4 implies |len(a)−len(b)| ≤ 4, so
    with band = floor(len/5) the bands of any qualifying pair differ
    by at most 1.  One side keeps its band, the other explodes to
    {band−1, band, band+1}; a qualifying pair matches on exactly one
    key (no dedup needed) and the exact levenshtein filter decides.
    Result-identical to the full self-join; candidate count drops from
    n² to the band-bucket products."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    band = F.floor(F.length("n_name") / 5)
    a = nation.select(
        F.col("n_nationkey").alias("ka"),
        F.col("n_name").alias("name_a"),
        band.alias("blk"),
    )
    b = nation.select(
        F.col("n_nationkey").alias("kb"),
        F.col("n_name").alias("name_b"),
        F.explode(F.array(band - 1, band, band + 1)).alias("blk"),
    )
    return (
        a.join(F.broadcast(b), "blk")
        .filter(F.col("ka") < F.col("kb"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 4)
        .select("name_a", "name_b", "dist")
    )


@register(
    "json_extract_props",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k_value
    FROM events WHERE event_id < 500
    """,
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native JSON path extraction from the props column (schema-on-read
    for semi-structured payloads; from_json with an explicit schema is
    the typed alternative when the shape is known)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "distinct_counts",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS users,
           count(DISTINCT date_trunc('day', ts)) AS active_days
    FROM events GROUP BY event_type
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (Spark expands to one
    aggregate with per-distinct shuffles).  The 100 TB drop-in is
    ``approx_count_distinct`` (HLL++, single pass, mergeable) — exact
    kept because the oracle hash-matches values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("users"),
        F.count_distinct(F.date_trunc("day", "ts")).alias("active_days"),
    )


@register(
    "null_semantics",
    sql="""
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS u
      FROM events WHERE event_id < 300
    )
    SELECT event_id,
           coalesce(round(v, 2), -1.0) AS v_or_default,
           (v IS NULL)::BOOLEAN AS v_missing,
           round(nullif(coalesce(v, 0.0), 0.0), 2) AS v_nullif,
           (u IS NOT DISTINCT FROM NULL) AS u_null_safe_eq_null
    FROM t
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling surface: coalesce, IS NULL, nullif, and null-safe
    equality (Spark <=> ≡ SQL IS NOT DISTINCT FROM)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    t = ev.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("u"),
    )
    return t.select(
        "event_id",
        F.coalesce(F.round("v", 2), F.lit(-1.0)).alias("v_or_default"),
        F.col("v").isNull().alias("v_missing"),
        F.round(F.nullif(F.coalesce("v", F.lit(0.0)), F.lit(0.0)), 2).alias(
            "v_nullif"
        ),
        F.col("u").eqNullSafe(F.lit(None).cast("long")).alias(
            "u_null_safe_eq_null"
        ),
    )


@register(
    "array_functions",
    sql="""
    SELECT vec_id,
           len(embedding)::BIGINT AS n,
           round(embedding[1]::DOUBLE, 6) AS first_component,
           round(list_aggregate(embedding[1:8]::DOUBLE[], 'max'), 6)
             AS max_head,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(embedding[1:8]::DOUBLE[],
                                  x -> CASE WHEN x > 0 THEN x
                                       ELSE 0.0 END)),
                   (acc, x) -> acc + x), 6) AS sum_pos_head,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))::BIGINT
             AS n_positive,
           array_to_string(list_transform(
             list_reverse(list_sort(embedding[1:3]::DOUBLE[])),
             x -> CAST(floor(x * 1000)::BIGINT AS VARCHAR)), ',')
             AS top3_desc_milli
    FROM embeddings WHERE vec_id < 100
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth over the embedding column: slice,
    element access, filter, higher-order transform + ordered fold,
    sort/reverse, stringify — the array surface a vector pipeline
    leans on daily, every expression JVM-side.

    Cross-engine notes: Spark arrays are 1-indexed via
    ``element_at`` / ``slice`` (matching DuckDB's 1-based list
    slices); the positive-sum folds left in index order on both
    engines, so the accumulated double is bit-identical."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        # widen float32 -> double FIRST (exact), matching the oracle's
        # ::DOUBLE[] — arithmetic in float32 would round differently
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("ed")
        )
    )
    head8 = F.slice("ed", 1, 8)
    pos_head = F.transform(
        head8, lambda x: F.when(x > 0, x).otherwise(F.lit(0.0))
    )
    top3 = F.reverse(F.array_sort(F.slice("ed", 1, 3)))
    return emb.select(
        "vec_id",
        F.size("ed").cast("bigint").alias("n"),
        F.round(F.element_at("ed", 1), 6).alias("first_component"),
        F.round(F.array_max(head8), 6).alias("max_head"),
        F.round(
            F.aggregate(pos_head, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("sum_pos_head"),
        F.size(F.filter("ed", lambda x: x > 0))
        .cast("bigint")
        .alias("n_positive"),
        # integer milli-units: float->string formatting differs between
        # engines, integer formatting doesn't
        F.array_join(
            F.transform(
                top3,
                lambda x: F.floor(x * 1000).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("top3_desc_milli"),
    )
