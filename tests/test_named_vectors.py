"""Named vectors (Qdrant multi-vector points): per-name dim/metric
config, per-name validation, search in one named space, column pruning
of the unused names, and payload-filter composition."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.sources.collection import VectorCollection


def _multi(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("body"),
        F.slice("embedding", 1, 32).alias("title"),
        "label",
    )
    c = VectorCollection(spark, str(tmp_path), "multi_demo")
    c.create_multi(
        emb,
        vectors={
            "body": {"dim": 64, "metric": "dot"},
            "title": {"dim": 32, "metric": "dot"},
        },
    )
    return c, emb


def test_search_named_ranks_in_the_chosen_space(spark, sf_smoke, tmp_path):
    c, emb = _multi(spark, sf_smoke, tmp_path)
    row = emb.filter("id = 1").head()
    title_q = [float(x) for x in row["title"]]
    got = c.search_named("title", title_q, k=5).collect()
    assert got[0]["id"] == 1  # self-hit in its own space
    # recompute the title-space scores exactly
    vecs = {
        r["id"]: [float(x) for x in r["title"]]
        for r in emb.filter(
            F.col("id").isin([r["id"] for r in got])
        ).collect()
    }
    for r in got:
        want = 0.0
        for x, y in zip(vecs[r["id"]], title_q):
            want += x * y
        assert math.isclose(r["score"], want, rel_tol=1e-9)
    # and the two named spaces genuinely rank differently
    body_q = [float(x) for x in row["body"]]
    body_ids = [r["id"] for r in c.search_named("body", body_q, k=5).collect()]
    assert body_ids != [r["id"] for r in got]


def test_search_named_prunes_other_vector_columns(
    spark, sf_smoke, tmp_path
):
    c, emb = _multi(spark, sf_smoke, tmp_path)
    q = [float(x) for x in emb.filter("id = 1").head()["title"]]
    df = c.search_named("title", q, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "title" in scan[0] and "body" not in scan[0], scan


def test_search_named_composes_payload_filter(spark, sf_smoke, tmp_path):
    c, emb = _multi(spark, sf_smoke, tmp_path)
    q = [float(x) for x in emb.filter("id = 1").head()["title"]]
    got = c.search_named("title", q, k=5, where="label = 1").collect()
    assert len(got) == 5 and all(r["label"] == 1 for r in got)


def test_create_multi_validates_each_name_and_ids(
    spark, sf_smoke, tmp_path
):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("body"),
        F.slice("embedding", 1, 16).alias("title"),
    )
    c = VectorCollection(spark, str(tmp_path), "multi_bad")
    try:
        c.create_multi(
            emb,
            vectors={
                "body": {"dim": 64, "metric": "dot"},
                "title": {"dim": 32, "metric": "dot"},  # actual: 16
            },
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "title" in str(e) and "dim=32" in str(e)


def test_search_named_unknown_name_and_wrong_dim_raise(
    spark, sf_smoke, tmp_path
):
    c, _ = _multi(spark, sf_smoke, tmp_path)
    try:
        c.search_named("caption", [0.0] * 32, k=1)
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "caption" in str(e)
    try:
        c.search_named("title", [0.0] * 64, k=1)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "dim" in str(e)
