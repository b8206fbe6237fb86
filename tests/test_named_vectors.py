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


# ------------- named sparse vectors + query_points (round 17)


def _multi_with_sparse(spark, sf_smoke, tmp_path):
    import pyspark.sql.functions as F

    from legalchatbot_vectordb_exp_spark.io_tables import load_table
    from legalchatbot_vectordb_exp_spark.queries_sparse import _postings
    from legalchatbot_vectordb_exp_spark.sources.collection import (
        VectorCollection,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    docs = load_table(spark, sf_smoke, "documents")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("body"),
        F.slice("embedding", 1, 16).alias("title"),
    )
    c = VectorCollection(spark, str(tmp_path), "multi_sparse")
    c.create_multi(
        pts,
        vectors={
            "body": {"dim": 64, "metric": "dot"},
            "title": {"dim": 16, "metric": "dot"},
        },
    )
    post = _postings(docs).select(
        F.col("doc_id").alias("id"), "term_id", F.col("w").alias("weight")
    )
    # keep only postings whose id exists as a point (same id space in
    # the testdata: doc_id == vec_id)
    c.attach_sparse("text", post)
    return c, emb


def test_attach_sparse_and_named_sparse_search(
    spark, sf_smoke, tmp_path
):
    c, _ = _multi_with_sparse(spark, sf_smoke, tmp_path)
    assert "text" in c.properties["sparse_vectors"]
    got = c._search_sparse_named(
        "text", {"vector": 2, "merge": 1}, k=5
    ).collect()
    assert len(got) == 5
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(s, int) for s in scores)  # exact ints
    # unknown name raises
    import pytest

    with pytest.raises(KeyError):
        c._search_sparse_named("nope", {"a": 1}, k=3)


def test_attach_sparse_rejects_orphans_and_non_multi(
    spark, sf_smoke, tmp_path
):
    import pyspark.sql.functions as F
    import pytest

    from legalchatbot_vectordb_exp_spark.io_tables import load_table
    from legalchatbot_vectordb_exp_spark.sources.collection import (
        VectorCollection,
    )

    c, emb = _multi_with_sparse(spark, sf_smoke, tmp_path)
    orphan = spark.createDataFrame(
        [(10**9, 5, 1)], "id long, term_id long, weight int"
    )
    with pytest.raises(ValueError, match="no point"):
        c.attach_sparse("other", orphan)
    dense = VectorCollection(spark, str(tmp_path), "plain")
    dense.create(
        emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vector"),
        ),
        dim=64,
        metric="dot",
        normalize=False,
    )
    with pytest.raises(ValueError, match="create_multi"):
        dense.attach_sparse("text", orphan)


def test_query_points_hybrid_rrf_and_dbsf(spark, sf_smoke, tmp_path):
    c, emb = _multi_with_sparse(spark, sf_smoke, tmp_path)
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    spec = [
        {"using": "body", "vector": qvec},
        {"using": "text", "terms": {"vector": 3, "stream": 2, "merge": 1}},
    ]
    got = c.query_points(spec, fusion="rrf", k=10).collect()
    assert len(got) == 10
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # rrf scores are sums of reciprocals: bounded by 2/(60+1)
    assert all(0 < s <= 2 / 61 + 1e-12 for s in scores)
    got_d = c.query_points(spec, fusion="dbsf", k=10).collect()
    assert len(got_d) == 10
    sd = [r["score"] for r in got_d]
    assert sd == sorted(sd, reverse=True)
    import pytest

    with pytest.raises(ValueError, match="unknown fusion"):
        c.query_points(spec, fusion="linear")
