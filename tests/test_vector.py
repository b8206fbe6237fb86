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


def test_exact_pair_scores_bit_equal_to_expression(spark):
    import pyspark.sql.functions as F
    from legalchatbot_vectordb_exp_spark.functions.vector import dot
    from legalchatbot_vectordb_exp_spark.operators.ann import exact_pair_scores

    rows = [
        (1, [0.1, -0.2, 0.3, 0.7]),
        (2, [0.5, 0.5, -0.5, 0.1]),
        (3, [-0.9, 0.01, 0.2, 0.4]),
        (4, [0.25, 0.25, 0.25, 0.25]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], ["id_a", "id_b"]
    )
    kernel = {
        (r.id_a, r.id_b): r.cos
        for r in exact_pair_scores(pairs, emb).collect()
    }
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    expr = {
        (r.id_a, r.id_b): r.cos
        for r in pairs.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", dot("va", "vb").alias("cos"))
        .collect()
    }
    # bit-identical, not approximately equal: the kernel folds dims in
    # the same IEEE order as the expression plan
    assert kernel == expr


def test_lsh_planes_match_md5_construction(spark):
    import hashlib

    from legalchatbot_vectordb_exp_spark.queries_ann import (
        DIM,
        N_PLANES,
        _spark_planes,
    )

    got = {r.plane_id: r.pv for r in _spark_planes(spark).collect()}
    assert len(got) == N_PLANES
    for p in range(N_PLANES):
        expected = [
            1.0
            if hashlib.md5(f"{p}_{j}".encode()).hexdigest()[0] <= "7"
            else -1.0
            for j in range(DIM)
        ]
        assert got[p] == expected
