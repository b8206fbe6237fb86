"""Vector expression helpers: normalization zero-guard, dot, cosine."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_normalize,
)


def test_l2_normalize_unit_and_zero_guard(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["id", "v"]
    )
    out = df.select(
        "id",
        l2_normalize("v").alias("nv"),
        l2_norm(l2_normalize("v")).alias("n"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].nv == [0.6, 0.8]
    assert abs(by_id[1].n - 1.0) < 1e-12
    # reference zero-guard: x / (norm or 1.0) → zeros stay zeros, no NaN
    assert by_id[2].nv == [0.0, 0.0]
    assert by_id[2].n == 0.0


def test_dot_and_cosine(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0], [3.0, 4.0])], ["id", "a", "b"])
    r = df.select(
        dot("a", "b").alias("d"), cosine_sim("a", "b").alias("c")
    ).head()
    assert r.d == 11.0
    expected = 11.0 / (math.sqrt(5) * math.sqrt(25))
    assert abs(r.c - expected) < 1e-12


def test_cosine_zero_vector_scores_zero(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0], [1.0, 0.0])], ["id", "a", "b"])
    assert df.select(cosine_sim("a", "b").alias("c")).head().c == 0.0
