"""Analytics query family: as-of join, vector centroids, exact
percentiles, pivot, int8 vector quantization — the remaining
general-engine surfaces a 100 TB training-data warehouse uses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.operators.asof import asof_join
from legalchatbot_vectordb_exp_spark.registry import register


@register(
    "asof_join_events",
    sql="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id,
           p.user_id,
           e.event_id AS right_event_id
    FROM purchases p ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): each purchase event
    paired with the user's latest error at-or-before it.  Union-merge
    window implementation (operators/asof.py) vs DuckDB's native
    ASOF JOIN as the oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, errors, on="user_id", ts="ts", payload_cols=["event_id"]
    )
    return out.select("event_id", "user_id", "right_event_id")


@register(
    "label_centroids",
    sql="""
    WITH comp AS (
      SELECT label, u.i AS pos, e.embedding[u.i]::DOUBLE AS x
      FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS u(i)
    )
    SELECT label, pos::BIGINT AS pos,
           round(avg(x), 6) AS centroid_component,
           count(*) AS n
    FROM comp GROUP BY label, pos
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode the vectors, average
    per (label, position).  At scale this is the k-means update step —
    one partial-aggregated shuffle keyed (label, pos), no vectors ever
    collected."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("x").cast("double").alias("x"),
    )
    return comp.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 6).alias("centroid_component"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "value_percentiles",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``).  At 100 TB the drop-in is
    ``percentile_approx`` (t-digest, mergeable, one pass) — exact kept
    here because the oracle hash-matches values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "events_pivot",
    sql="""
    SELECT user_id,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'signup') AS signup
    FROM events GROUP BY user_id
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts to one column per type.  Pivot values are
    declared (not discovered) so the plan is a single pass — the
    two-phase auto-discover variant needs an extra distinct scan."""
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "error", "signup"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "vector_quantize_int8",
    sql="""
    SELECT vec_id,
           array_to_string(list_transform(embedding::DOUBLE[],
             x -> CAST(greatest(least(floor(x * 127.0), 127.0), -127.0)
                  AS BIGINT)), ',') AS qvec,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding::DOUBLE[],
               x -> abs(x - CAST(greatest(least(floor(x * 127.0), 127.0),
                                          -127.0) AS BIGINT) / 127.0))),
             (a, x) -> a + x), 6) AS l1_error
    FROM embeddings
    """,
)
def q_vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of unit vectors (×127, floor, clamp)
    plus the reconstruction L1 error — 4x storage reduction for the
    100 TB embedding store; floor keeps the mapping deterministic
    across engines (round() would differ on half-way cases).

    ``qvec`` is emitted as a comma-joined string on both sides: the
    driver's canonicalizer can't sort frames with list cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = lambda x: F.greatest(  # noqa: E731
        F.least(F.floor(x * 127.0), F.lit(127.0)), F.lit(-127.0)
    ).cast("bigint")
    staged = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    return staged.select(
        "vec_id",
        F.concat_ws(
            ",", F.transform(F.col("v"), lambda x: q(x).cast("string"))
        ).alias("qvec"),
        F.round(
            F.aggregate(
                F.transform(
                    F.col("v"), lambda x: F.abs(x - q(x).cast("double") / 127.0)
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("l1_error"),
    )


@register(
    "interval_join_events",
    sql="""
    SELECT l.event_id AS click_id,
           count(*) AS n_purchases,
           CAST(round(sum(CAST(r.value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS purchase_value
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts > l.ts
     AND r.ts <= l.ts + INTERVAL 5 MINUTE
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    GROUP BY l.event_id
    """,
)
def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: purchases within 5 minutes after each
    click by the same user — time-bucket blocking
    (operators/interval.py) turns the would-be per-key nested loop
    into an equi-join on (user, bucket) with an exact integer-micros
    residual predicate."""
    from legalchatbot_vectordb_exp_spark.operators.interval import (
        interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(
        clicks, purchases, on="user_id", lower_s=0, upper_s=300,
        bounds="(]",
    )
    return joined.groupBy(F.col("event_id").alias("click_id")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(
            F.sum(F.col("r_value").cast("decimal(18,4)")), 2
        ).cast("double").alias("purchase_value"),
    )


@register(
    "stats_moments",
    sql="""
    SELECT event_type,
           count(*) AS n,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS variance,
           round(corr(value, user_id::DOUBLE), 6) AS corr_vu,
           round(covar_samp(value, user_id::DOUBLE), 6) AS covar_vu
    FROM events GROUP BY event_type
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates per group: sample
    stddev/variance and Pearson correlation/covariance between value
    and user id.  Both engines use single-pass co-moment updates whose
    merged results agree to well under the round-6 display precision
    (verified at sf0.001/0.01); skewness is deliberately absent —
    Spark computes population g1, DuckDB the bias-corrected sample
    form, a definition (not precision) mismatch."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("variance"),
        F.round(F.corr("value", u), 6).alias("corr_vu"),
        F.round(F.covar_samp("value", u), 6).alias("covar_vu"),
    )


@register(
    "approx_agg_guard",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           true AS hll_within_5pct,
           true AS tdigest_p50_within_10pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_agg_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB drop-ins for exact distinct/percentile are the
    mergeable sketches (HLL++ ``approx_count_distinct``, t-digest
    ``percentile_approx``) — but sketch values differ between engines,
    so they can't be hash-compared directly.  This query makes the
    accuracy CONTRACT the oracle-checkable result: Spark computes both
    exact and sketch per group and emits whether the sketch landed
    inside its documented error band (booleans + the exact count).
    A sketch regression (or a parameter change that breaks the band)
    flips a boolean and fails the hash check."""
    ev = load_table(spark, sf_dir, "events")
    # r20 split: mixing count_distinct with the percentile aggregates
    # in ONE groupBy makes Spark key the partial PERCENTILE state by
    # (event_type, user_id) — the exchange then carries one
    # value-histogram buffer per pair (measured 3.16 s at sf0.1).
    # Split the distinct-user side (pairs first, then count — HLL is
    # duplicate-insensitive, so approx_count_distinct over the
    # deduped pairs is the identical sketch) from the percentile side
    # (one group-keyed aggregate whose partial state is per
    # event_type) and broadcast-join the two 5-row results: 1.19 s,
    # identical rows.  At scale the same split keeps every shuffle
    # row narrow: pair keys on one side, per-group buffers (not
    # per-pair) on the other.
    users = (
        ev.select("event_type", "user_id")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("event_type")
        .agg(
            # count(user_id), not count(*): a NULL user_id pair-group
            # must not count as a distinct user (count DISTINCT
            # semantics; fixtures carry no NULLs, so rows identical)
            F.count("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("hll_users"),
        )
    )
    pct = ev.select("event_type", "value").groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile_approx(value, 0.5, 1000)").alias("p50_approx"),
    )
    # null-safe equality so a NULL event_type group survives the
    # re-join exactly as the single-groupBy form would keep it
    agg = users.join(
        pct.withColumnRenamed("event_type", "_et"),
        users["event_type"].eqNullSafe(F.col("_et")),
    ).drop("_et")
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("hll_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("p50_approx") - F.col("p50"))
            <= 0.10 * F.abs(F.col("p50"))
        ).alias("tdigest_p50_within_10pct"),
    )


@register(
    "stratified_sample",
    sql="""
    WITH s AS (
      SELECT o_orderpriority, o_totalprice,
             substr(md5(o_orderkey::VARCHAR), 1, 8) AS h
      FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n_sampled,
           CAST(round(sum(o_totalprice::DECIMAL(18,4)), 2) AS DOUBLE)
             AS sum_sampled
    FROM s
    WHERE h < CASE WHEN o_orderpriority = '1-URGENT'
                   THEN '80000000' ELSE '19999999' END
    GROUP BY o_orderpriority
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~50% of '1-URGENT'
    orders and ~10% of every other stratum by thresholding the first
    8 hex chars of md5(key) — the reproducible, cluster-order-
    independent alternative to ``sampleBy`` (whose RNG draw depends on
    partition layout and so can't be oracle-checked).

    Scale shape: the hash filter is a pure per-row predicate evaluated
    in the scan stage — no shuffle, no state, works identically on a
    1000-executor cluster; sampled rows then feed a normal map-side-
    combining aggregate.  Rates are exact in expectation and the
    selection is stable under repartitioning, retries, and engine
    changes (md5 is bit-identical everywhere)."""
    o = load_table(spark, sf_dir, "orders")
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
    thr = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.lit("80000000")
    ).otherwise(F.lit("19999999"))
    return (
        o.filter(h < thr)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
            ).cast("double").alias("sum_sampled"),
        )
    )


@register(
    "snapshot_diff",
    sql="""
    WITH old AS (
      SELECT o_custkey AS custkey, count(*) AS n,
             sum(o_totalprice::DECIMAL(18,4)) AS total
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    ),
    new AS (
      SELECT o_custkey AS custkey, count(*) AS n,
             sum(o_totalprice::DECIMAL(18,4)) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT coalesce(o.custkey, n.custkey) AS custkey,
           CASE WHEN o.custkey IS NULL THEN 'insert'
                WHEN n.custkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           coalesce(n.n, 0) AS new_n,
           CAST(round(coalesce(n.total, 0::DECIMAL(18,4)), 2) AS DOUBLE) AS new_total
    FROM old o FULL OUTER JOIN new n ON o.custkey = n.custkey
    WHERE o.custkey IS NULL OR n.custkey IS NULL
       OR o.n <> n.n OR o.total <> n.total
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: two per-customer activity snapshots
    (order count + DECIMAL revenue before/after a cutoff) full-outer
    joined on the key and classified insert / delete / update — the
    change feed a warehouse emits when reconciling dataset versions.

    Scale shape: both snapshots are first shrunk by a map-side-
    combining groupBy on the same key the join uses, so the full outer
    join is key-co-partitioned (one shuffle each side, no broadcast
    needed at any scale); classification and the changed-row filter
    are projection-level.  Unchanged keys are dropped, which is what
    keeps the emitted feed proportional to churn, not corpus size."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")

    def snap(pred):
        return (
            o.filter(pred)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                    "total"
                ),
            )
        )

    old = snap(F.col("o_orderdate") < cutoff).alias("o")
    new = snap(F.col("o_orderdate") >= cutoff).alias("n")
    joined = old.join(new, F.col("o.custkey") == F.col("n.custkey"), "full")
    return joined.filter(
        F.col("o.custkey").isNull()
        | F.col("n.custkey").isNull()
        | (F.col("o.n") != F.col("n.n"))
        | (F.col("o.total") != F.col("n.total"))
    ).select(
        F.coalesce(F.col("o.custkey"), F.col("n.custkey")).alias("custkey"),
        F.when(F.col("o.custkey").isNull(), "insert")
        .when(F.col("n.custkey").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        F.coalesce(F.col("n.n"), F.lit(0)).alias("new_n"),
        F.round(
            F.coalesce(F.col("n.total"), F.lit(0).cast("decimal(18,4)")), 2
        ).cast("double").alias("new_total"),
    )


@register(
    "events_topn_per_window",
    sql="""
    WITH agg AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, event_type, n,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n DESC, event_type ASC) AS rnk
      FROM agg
    )
    SELECT window_start, event_type, n, rnk::BIGINT AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_events_topn_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hourly window — the windowed-leaderboard
    pattern (trending topics, hottest endpoints).  Plan: tumbling
    aggregate (map-side partial) → per-window rank; both exchanges are
    key-partitioned, and integer counts + lexicographic tie-break make
    the cut deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    rank_w = Window.partitionBy("w").orderBy(
        F.desc("n"), F.col("event_type").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "rnk"
        )
    )


@register(
    "retention_cohort",
    sql="""
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT o.o_custkey, f.cohort_month,
             (date_part('year', o.o_orderdate)
                - date_part('year', f.cohort_month)) * 12
             + (date_part('month', o.o_orderdate)
                - date_part('month', f.cohort_month)) AS months_since
      FROM orders o JOIN firsts f USING (o_custkey)
    )
    SELECT cohort_month, months_since::BIGINT AS months_since,
           count(DISTINCT o_custkey)::BIGINT AS active_customers
    FROM activity
    WHERE months_since <= 6
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, then
    distinct active customers per months-since-cohort (0..6) — the
    standard retention triangle.  Plan: a custkey-keyed min aggregate
    joined back on the same key (co-partitioned — one shuffle feeds
    both), then a (cohort, offset)-keyed distinct count.  All
    integer/date arithmetic, deterministic everywhere."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort_month")
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("bigint")
    activity = orders.join(firsts, "o_custkey").select(
        "o_custkey",
        "cohort_month",
        months_since.alias("months_since"),
    )
    return (
        activity.filter(F.col("months_since") <= 6)
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").alias("active_customers"))
    )


@register(
    "part_affinity",
    sql="""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS together
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    freq AS (
      SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1
    ),
    n AS (SELECT count(DISTINCT o_orderkey)::BIGINT AS n_orders FROM orders)
    SELECT p.part_a, p.part_b, p.together::BIGINT AS together,
           round(p.together * n.n_orders
                 / CAST(fa.n_orders * fb.n_orders AS DOUBLE), 6) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b, n
    WHERE p.together >= 2
    """,
)
def q_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over order lines: parts co-occurring in
    ≥2 orders, scored by lift = P(a,b) / (P(a)·P(b)) — the co-purchase
    signal behind "frequently bought together".

    Plan (round-11 rewrite, measured 2.5 s → under the 2.0 s bar at
    sf0.1): ONE shuffle of lineitem — ``groupBy(l_orderkey)
    collect_list(l_partkey)`` — then both downstream inputs are HOF
    projections of the per-order basket array, sharing that exchange
    (ReusedExchange): pairs come from sorted-array positional
    combinations (strict ``x < y``, so line multiplicity matches the
    SQL self-join's ``cnt_a × cnt_b`` and equal-part line pairs drop,
    exactly the oracle's ``a.l_partkey < b.l_partkey``), frequencies
    from ``explode(array_distinct(parts))`` (= ``count(DISTINCT
    l_orderkey)`` without the count_distinct expand).  The round-10
    self-join spelled the same result as a × b with per-side aliases,
    which DEFEATED exchange reuse (two scans + two shuffle writes of
    the same bytes) and paid a count_distinct expand — the dominant
    stage costs in the r10 profile.  Pair count per order stays
    quadratic in LINES PER ORDER (≤7 in TPC-H, a bounded constant),
    never in table size; basket skew is bounded by the same constant.
    Lift is one multiply and one divide over exact integer counts →
    bit-identical floats."""
    # r21: key the ONE exchange by the group key instead of spread()'s
    # keyless round-robin.  repartition("l_orderkey") (no explicit N —
    # AQE-coalescible, conf-sized on a cluster) establishes the exact
    # partitioning the basket aggregate needs, so the groupBy plans as
    # a single COMPLETE ObjectHashAggregate riding that exchange
    # (guide §2.4 "two operations keyed the same way share one
    # exchange").  The spread() form paid the same one exchange PLUS a
    # partial collect_list pass that cannot combine (every element
    # ships regardless) and round-robin's sort-before-repartition.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).repartition("l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("parts")
    )
    combos = F.expr(
        "filter(flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), y -> "
        "named_struct('part_a', x, 'part_b', y)))), "
        "p -> p.part_a < p.part_b)"
    )
    pairs = (
        per_order.select(F.explode(combos).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
    )
    freq = (
        per_order.select(
            F.explode(F.array_distinct("parts")).alias("l_partkey")
        )
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # o_orderkey is the orders primary key, so the basket count is the
    # row count — a parquet-footer metadata read, not a distinct agg
    n_orders = load_table(spark, sf_dir, "orders").count()
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "together",
            F.round(
                F.col("together")
                * F.lit(int(n_orders))
                / (F.col("na") * F.col("nb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


PR_ITERS = 8
PR_SCALE = 10**12  # fixed-point rank scale: all arithmetic stays integer


def _pagerank_oracle() -> str:
    """Unrolled fixed-point PageRank: every iteration is pure integer
    arithmetic (floor divisions, integer sums), so ranks are exactly
    reproducible on any engine — no float accumulation order anywhere."""
    head = f"""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    edges AS (
      SELECT part_a AS src, part_b AS dst FROM pairs
      UNION ALL SELECT part_b, part_a FROM pairs
    ),
    deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM edges
            GROUP BY src),
    pr0 AS (SELECT node, {PR_SCALE}::BIGINT AS rank FROM deg)
    """
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(f""",
    pr{i} AS (
      SELECT e.dst AS node,
             (15 * {PR_SCALE} / 100)::BIGINT
             + (85 * sum(p.rank // d.d) // 100)::BIGINT AS rank
      FROM edges e
      JOIN pr{i - 1} p ON p.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node AS part, rank AS rank_fp
    FROM pr{PR_ITERS}
    ORDER BY rank DESC, node ASC LIMIT 20
    """
    )


@register("pagerank_parts", sql=_pagerank_oracle())
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the part co-purchase graph — the
    iterative-algorithm pattern (label propagation's weighted cousin)
    expressed as a driver-side loop of keyed join+aggregate plans.

    Determinism: ranks live as BIGINT fixed-point ({PR_SCALE} = 1.0);
    each iteration is rank//degree contributions, an integer sum, and
    the damped update (15·S/100 + 85·Σ//100) — floor divisions and
    integer sums only, so iteration order, partitioning and engine
    cannot change a single bit.  The oracle unrolls the same
    {PR_ITERS} iterations as CTEs.

    Scale shape: each iteration shuffles on the edge key — the classic
    Pregel super-step as a DataFrame plan; the rank frame is persisted
    per iteration to cut lineage (at 100 TB: localCheckpoint every few
    super-steps, same as connected components)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("part_a", "part_b")
    )
    edges = pairs.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("src"), F.col("part_a").alias("dst")
        )
    )
    # ADJACENCY-LIST form (r20 optimization): group each node's out
    # edges into one array row BEFORE the iteration loop, so every
    # super-step joins ranks against |nodes| adjacency rows instead of
    # |edges| edge rows and explodes AFTER the join (guide §3.3: "join
    # first on the un-exploded key, explode after").  The degree is
    # size(dsts) — the separate deg aggregate and its edge×deg join
    # are gone.  Persisted PRE-PARTITIONED on the join key: each
    # iteration's sort-merge join then reads the cached side without
    # re-shuffling it (8 exchanges of the static side removed — the
    # measured r20 plan went 124 Exchange nodes → ~30), and the ranks
    # side arrives hash(dst)-partitioned from the previous groupBy, so
    # steady-state iterations shuffle only the map-side-combined
    # contribution rows.  sum/div stay pure BIGINT: a double division
    # would go inexact past 2^53 on high-degree graphs.
    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("dsts"))
        .repartition("src")
        .persist()
    )
    ranks = adj.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    teleport = 15 * PR_SCALE // 100
    for _ in range(PR_ITERS):
        # No per-iteration persist: each rank frame feeds exactly one
        # consumer, so the 8 super-steps form straight-line lineage
        # executed once (at 100 TB scale, localCheckpoint every few
        # steps bounds plan depth instead).
        ranks = (
            adj.join(ranks, adj.src == ranks.node)
            .select(
                F.explode("dsts").alias("dst"),
                F.expr("rank div size(dsts)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(teleport) + F.expr("(85 * s) div 100"))
                .cast("bigint")
                .alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("part"), F.col("rank").alias("rank_fp")
    ).orderBy(F.desc("rank_fp"), F.col("part").asc()).limit(20)


@register(
    "conversion_funnel",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_viewed,
           (SELECT count(*) FROM c)::BIGINT AS n_clicked_after_view,
           (SELECT count(*) FROM p)::BIGINT AS n_purchased_after_click
    """,
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER
    the first view, then purchased AFTER the first qualifying click —
    the sequential-pattern count behind product funnels (strictly
    ordered, not mere co-occurrence).

    Plan: three user-keyed min aggregates, each stage joined to the
    previous on the user key — co-partitioned shuffles, no windows
    over the raw stream; integer counts, so the single output row is
    exact.  The three stage counts come from ONE conditional aggregate
    over the left-joined funnel frame (clicked ⊆ viewed and
    purchased ⊆ clicked by construction, so ``count(stage_ts)`` is the
    stage population) — a single job, and Spark's ReuseExchange dedupes
    the repeated v/c subplans inside it (round-3 review: the previous
    version ran three separate ``.count()`` actions)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_viewed"),
            F.count("t_click").alias("n_clicked_after_view"),
            F.count("t_purchase").alias("n_purchased_after_click"),
        )
    )


@register(
    "cdc_apply",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 >= 3
    ),
    feed AS (
      SELECT o_orderkey, o_totalprice AS price, 'I' AS op, 1 AS seq
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice + 1000, 'U', 1
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, o_totalprice + 2000, 'U', 2
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, NULL, 'D', 1
      FROM orders WHERE o_orderkey % 7 = 2
    ),
    latest AS (
      SELECT o_orderkey, price, op FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn
        FROM feed) WHERE rn = 1
    )
    SELECT b.o_orderkey, round(b.o_totalprice, 2) AS price
    FROM base b ANTI JOIN latest l ON l.o_orderkey = b.o_orderkey
    UNION ALL
    SELECT o_orderkey, round(price, 2) FROM latest WHERE op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — the other half of ``snapshot_diff``: compact a
    change feed (insert/update/delete rows with sequence numbers,
    including multiple versions of the same key) to latest-per-key,
    then merge it into the base snapshot: delete drops the row, the
    latest update/insert wins, untouched base rows pass through.

    Plan: the feed compaction is one window over the feed (keyed by
    the primary key — feed-sized, not snapshot-sized), the merge is a
    key-partitioned anti join + union.  This is exactly the MERGE INTO
    shape lakehouse tables run on every ingest cycle; with the
    deterministic synthetic feed both engines derive identical rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    from pyspark.sql import Window

    base = orders.filter(F.col("o_orderkey") % 7 >= 3)
    mk = lambda pred, price, op, seq: (  # noqa: E731
        orders.filter(pred).select(
            "o_orderkey",
            price.alias("price"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )
    )
    feed = (
        mk(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice"), "I", 1)
        .unionAll(
            mk(
                F.col("o_orderkey") % 7 == 1,
                F.col("o_totalprice") + 1000,
                "U",
                1,
            )
        )
        .unionAll(
            mk(
                F.col("o_orderkey") % 7 == 1,
                F.col("o_totalprice") + 2000,
                "U",
                2,
            )
        )
        .unionAll(
            mk(
                F.col("o_orderkey") % 7 == 2,
                F.lit(None).cast("double"),
                "D",
                1,
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "price", "op")
    )
    untouched = base.join(latest, "o_orderkey", "anti").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    applied = latest.filter(F.col("op") != "D").select(
        "o_orderkey", F.round("price", 2).alias("price")
    )
    return untouched.unionAll(applied)


@register(
    "embedding_drift",
    sql="""
    WITH halves AS (
      SELECT vec_id % 2 AS half, u.i AS pos, e.embedding[u.i]::DOUBLE AS x
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS u(i)
    ),
    means AS (
      SELECT half, pos, round(avg(x), 6) AS m
      FROM halves GROUP BY half, pos
    )
    SELECT a.pos::BIGINT AS pos,
           round(abs(a.m - b.m), 6) AS mean_drift
    FROM means a JOIN means b ON a.pos = b.pos
    WHERE a.half = 0 AND b.half = 1
    ORDER BY mean_drift DESC, pos ASC LIMIT 10
    """,
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per-component mean of two
    corpus halves (old vs new ingest, here split by id parity), top-10
    most-drifted components — the pipeline check that catches a model
    swap or preprocessing change silently shifting the embedding
    space.  One (half, pos)-keyed aggregate (partial agg, posexplode
    scan-stage) + a 64-row self-join; the drift compares ROUNDED means
    so the final doubles are deterministic cross-engine (the
    ``label_centroids`` precedent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "half",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("x").cast("double").alias("x"),
    )
    means = comp.groupBy("half", "pos").agg(
        F.round(F.avg("x"), 6).alias("m")
    )
    a = means.filter(F.col("half") == 0).select(
        "pos", F.col("m").alias("ma")
    )
    b = means.filter(F.col("half") == 1).select(
        "pos", F.col("m").alias("mb")
    )
    return (
        a.join(b, "pos")
        .select(
            "pos",
            F.round(F.abs(F.col("ma") - F.col("mb")), 6).alias(
                "mean_drift"
            ),
        )
        .orderBy(F.desc("mean_drift"), F.col("pos").asc())
        .limit(10)
    )


@register(
    "length_buckets",
    sql="""
    WITH t AS (
      SELECT doc_id, n_chars,
             ntile(8) OVER (ORDER BY n_chars ASC, doc_id ASC) AS bucket
      FROM documents
    )
    SELECT bucket::BIGINT AS bucket,
           count(*)::BIGINT AS n_docs,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars
    FROM t GROUP BY bucket
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth document-length buckets (ntile over a total order) —
    the binning behind curriculum schedules and length-balanced
    sampling.  The ntile order carries an explicit doc_id tie-break so
    bucket boundaries are engine-independent.  Note the global sort:
    ntile is inherently a total order — at 100 TB the drop-in is
    approx-quantile cut points (percentile_approx) broadcast as range
    boundaries, same output contract."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    t = docs.withColumn("bucket", F.ntile(8).over(w).cast("bigint"))
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "events_anomaly_mad",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*)::BIGINT AS n,
           sum(CASE WHEN d.ad > 5 * m.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_anomalies
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counting per event type: |value − median| >
    5·MAD (median absolute deviation) — the outlier detector that
    survives heavy tails where mean/stddev break.  Two median passes
    (exact interpolated percentile, identical in both engines) with
    the per-type statistics broadcast back against the stream; output
    is integer counts, so the hash is exact."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("ad") > 5 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


@register(
    "value_histogram",
    sql="""
    WITH b AS (
      SELECT event_type,
             least(greatest(floor(value / 50.0), 0), 9)::BIGINT AS bin
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, bin, count(*)::BIGINT AS n
    FROM b GROUP BY event_type, bin
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type (10 bins of width 50,
    clamped) — the profiling primitive behind every monitoring
    dashboard.  Bin assignment is floor arithmetic on the scan (no
    UDF, no sort); one partial-aggregated shuffle keyed
    (type, bin)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 50.0), F.lit(0)), F.lit(9)
    ).cast("bigint")
    return (
        ev.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "table_profile",
    sql="""
    SELECT 'o_custkey' AS col,
           count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null,
           count(DISTINCT o_custkey)::BIGINT AS n_distinct,
           CAST(floor(min(o_custkey)::DOUBLE * 100 + 0.5) AS BIGINT)
             AS min_cents,
           CAST(floor(max(o_custkey)::DOUBLE * 100 + 0.5) AS BIGINT)
             AS max_cents
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           -- ::BIGINT on EVERY union branch: DuckDB sum(INT) -> HUGEINT,
           -- and union type promotion widens the column to the widest
           -- branch, overriding branch 1's cast.
           sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_totalprice),
           CAST(floor(min(o_totalprice)::DOUBLE * 100 + 0.5) AS BIGINT),
           CAST(floor(max(o_totalprice)::DOUBLE * 100 + 0.5) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderstatus),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile pass (null count, distinct count, min/max per
    column) — the data-quality snapshot a 100 TB warehouse runs after
    every load.  One wide aggregate per profiled column family over a
    single scan; non-numerics profile nulls + cardinality only.

    Numeric bounds are emitted as integer *cents* via
    ``floor(x*100 + 0.5)`` — identical IEEE double ops in Spark and
    DuckDB — never as a rounded DOUBLE: ``round(double, 2)`` is
    half-even on the binary value in DuckDB but HALF_UP on the
    shortest-decimal repr in Spark, so any min/max near a ``.xx5``
    boundary could hash-diverge.  That is portability hardening; the
    actual r5/r6 driver mismatch was the oracle's uncast
    ``sum(CASE...)`` columns — DuckDB widens them to HUGEINT, union
    promotion overrides the one cast branch, and the driver's pandas
    fetch coerces HUGEINT to float64 (fixed with ::BIGINT on ALL
    three branches).

    NOTE ``floor(x*100 + 0.5)`` is half-UP only for x ≥ 0
    (``floor(-267.5 + 0.5) = -267``, where half-away-from-zero gives
    −268).  Safe here: o_custkey/o_totalprice are positive TPC-H
    domains.  Do not copy this pattern to signed columns without a
    sign-aware variant."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_ck"),
        F.count_distinct("o_custkey").alias("nd_ck"),
        F.floor(F.min("o_custkey").cast("double") * 100 + 0.5)
        .cast("bigint").alias("min_ck"),
        F.floor(F.max("o_custkey").cast("double") * 100 + 0.5)
        .cast("bigint").alias("max_ck"),
        F.sum(
            F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)
        ).alias("null_tp"),
        F.count_distinct("o_totalprice").alias("nd_tp"),
        F.floor(F.min("o_totalprice").cast("double") * 100 + 0.5)
        .cast("bigint").alias("min_tp"),
        F.floor(F.max("o_totalprice").cast("double") * 100 + 0.5)
        .cast("bigint").alias("max_tp"),
        F.sum(
            F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)
        ).alias("null_st"),
        F.count_distinct("o_orderstatus").alias("nd_st"),
    )
    rows = [
        ("o_custkey", "null_ck", "nd_ck", "min_ck", "max_ck"),
        ("o_totalprice", "null_tp", "nd_tp", "min_tp", "max_tp"),
        ("o_orderstatus", "null_st", "nd_st", None, None),
    ]
    parts = []
    for col, nl, nd, mn, mx in rows:
        parts.append(
            agg.select(
                F.lit(col).alias("col"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col(nl).cast("bigint").alias("n_null"),
                F.col(nd).cast("bigint").alias("n_distinct"),
                (F.col(mn) if mn else F.lit(None).cast("bigint")).alias(
                    "min_cents"
                ),
                (F.col(mx) if mx else F.lit(None).cast("bigint")).alias(
                    "max_cents"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
