"""Interval join: bounds semantics, cross-bucket matches, and the
equi-join (not nested-loop) plan shape."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.operators.interval import interval_join


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, k, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(rows)
        ],
        "id long, k long, ts timestamp_ntz",
    )


def _pairs(out):
    return sorted((r.id, r.r_id) for r in out.collect())


def test_interval_join_bounds_and_bucket_straddle(spark):
    # left at t=0; right rows at exact bound edges and bucket edges
    left = _df(spark, [(1, 0)])
    right = _df(spark, [(1, 0), (1, 1), (1, 299), (1, 300), (1, 301)])
    kw = dict(on="k", lower_s=0, upper_s=300)

    incl = interval_join(left, right, bounds="[]", **kw)
    assert _pairs(incl) == [(0, 0), (0, 1), (0, 2), (0, 3)]

    half = interval_join(left, right, bounds="(]", **kw)
    assert _pairs(half) == [(0, 1), (0, 2), (0, 3)]

    open_ = interval_join(left, right, bounds="()", **kw)
    assert _pairs(open_) == [(0, 1), (0, 2)]


def test_interval_join_matches_naive_join(spark):
    import random

    rng = random.Random(13)
    left = _df(spark, [(rng.randrange(3), rng.randrange(3000)) for _ in range(60)])
    right = _df(spark, [(rng.randrange(3), rng.randrange(3000)) for _ in range(60)])

    out = interval_join(left, right, on="k", lower_s=10, upper_s=170,
                        bounds="[]", bucket_s=60)  # window spans >2 buckets
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") >= F.expr("l.ts + INTERVAL 10 SECONDS"))
            & (F.col("r.ts") <= F.expr("l.ts + INTERVAL 170 SECONDS")),
        )
        .select(F.col("l.id").alias("id"), F.col("r.id").alias("r_id"))
    )
    assert _pairs(out) == sorted((r.id, r.r_id) for r in naive.collect())


def test_interval_join_plan_is_equi_join(spark):
    left = _df(spark, [(1, 0), (2, 5)])
    right = _df(spark, [(1, 100), (2, 200)])
    out = interval_join(left, right, on="k", lower_s=0, upper_s=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
