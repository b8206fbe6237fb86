"""ML operators: hash-embedder determinism + unit norm, generate
pipeline shape, end-to-end rag query."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.functions.vector import l2_norm
from legalchatbot_vectordb_exp_spark.ml.embed import embed_text_udf
from legalchatbot_vectordb_exp_spark.ml.generate import generate_rag_answers


def test_embed_deterministic_unit_vectors(spark):
    df = spark.createDataFrame(
        [("hello",), ("world",), ("hello",), ("",)], ["text"]
    )
    embed = embed_text_udf(dim=16)
    out = df.select("text", embed("text").alias("v")).collect()
    by_text = {}
    for r in out:
        assert len(r.v) == 16
        n = math.sqrt(sum(x * x for x in r.v))
        assert abs(n - 1.0) < 1e-9
        by_text.setdefault(r.text, []).append(r.v)
    # same text → identical vector (deterministic across rows/batches)
    assert by_text["hello"][0] == by_text["hello"][1]
    assert by_text["hello"][0] != by_text["world"][0]


def test_generate_appends_column_preserving_rows(spark):
    df = spark.createDataFrame(
        [(1, "q1", "มาตรา 420 และ 1336"), (2, "q2", "no digits here")],
        ["qid", "text", "context"],
    )
    out = generate_rag_answers(df).collect()
    by_qid = {r.qid: r for r in out}
    assert by_qid[1].predicted_law == "มาตรา 420, 1336"
    assert by_qid[2].predicted_law == "ไม่พบข้อกฎหมาย"
    assert by_qid[1].context == "มาตรา 420 และ 1336"  # originals intact


def test_rag_end_to_end_query(spark, sf_smoke):
    from legalchatbot_vectordb_exp_spark.queries import QUERIES

    out = QUERIES["rag_end_to_end"](spark, sf_smoke).collect()
    assert len(out) == 5  # five query docs
    for r in out:
        assert r.predicted_law
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0.0 <= r.mrr_at_k <= 1.0
    # run twice → identical (deterministic fake models)
    again = QUERIES["rag_end_to_end"](spark, sf_smoke).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mmr_kernel_short_pool():
    """ADVICE r4: a pool smaller than MMR_K must return every
    candidate (len(pool) rows), not crash on best=None."""
    import pandas as pd

    from legalchatbot_vectordb_exp_spark.queries_rag import (
        MMR_K,
        _mmr_greedy_kernel,
    )

    pool = pd.DataFrame(
        {
            "query_id": [1, 1],
            "vec_id": [10, 11],
            "embedding": [[1.0, 0.0], [0.8, 0.6]],
            "rel": [0.9, 0.5],
        }
    )
    out = _mmr_greedy_kernel(pool)
    assert len(out) == 2 < MMR_K
    assert list(out["rank"]) == [1, 2]
    assert list(out["vec_id"]) == [10, 11]

    one = _mmr_greedy_kernel(pool.iloc[:1])
    assert len(one) == 1 and one["vec_id"].iloc[0] == 10
