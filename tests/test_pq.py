"""Product quantization (operators/pq.py): codebook determinism,
encode validity, ADC exactness on centroid-aligned vectors, and the
candidate operator's per-query top-r contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from legalchatbot_vectordb_exp_spark.operators.pq import (
    adc_candidates,
    encode_pq,
    sample_vectors,
    train_codebooks,
)


def _toy(n=200, d=16, seed=7):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_codebooks_deterministic_and_shaped():
    x = _toy()
    b1 = train_codebooks(x, m=4, k=8, iters=5)
    b2 = train_codebooks(x, m=4, k=8, iters=5)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)


def test_codebooks_reject_bad_dims():
    x = _toy(d=10)
    with pytest.raises(ValueError):
        train_codebooks(x, m=4, k=8)  # 10 % 4 != 0
    with pytest.raises(ValueError):
        train_codebooks(_toy(n=4), m=4, k=8)  # sample smaller than k


def test_encode_codes_valid_and_deterministic(spark):
    x = _toy()
    books = train_codebooks(x, m=4, k=8, iters=5)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["codes"]
        for r in encode_pq(df, books).collect()
    }
    assert len(got) == len(x)
    arr = np.array([got[i] for i in range(len(x))])
    assert arr.shape == (len(x), 4)
    assert arr.min() >= 0 and arr.max() < 8
    # argmin reference
    ds = 4
    for j in range(4):
        d2 = (
            (x[:, j * ds : (j + 1) * ds][:, None, :] - books[j][None]) ** 2
        ).sum(-1)
        assert np.array_equal(arr[:, j], d2.argmin(1))


def test_adc_exact_on_centroid_aligned_vectors(spark):
    """A vector lying exactly on its subspace centroids has zero
    quantization error: ADC == exact dot."""
    x = _toy()
    books = train_codebooks(x, m=4, k=8, iters=5)
    # build vectors from centroid rows directly
    picks = [(0, 1, 2, 3), (7, 6, 5, 4), (3, 3, 3, 3)]
    vecs = [
        np.concatenate([books[j][p[j]] for j in range(4)]) for p in picks
    ]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = vecs[0]
    cands = adc_candidates(
        encode_pq(df, books), books, [(0, q.tolist())], r=3
    ).collect()
    by_id = {r["vec_id"]: r["adc"] for r in cands}
    for i, v in enumerate(vecs):
        assert by_id[i] == pytest.approx(float(v @ q), abs=1e-12)


def test_adc_candidates_topr_per_query(spark, sf_smoke):
    from legalchatbot_vectordb_exp_spark.io_tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    books = train_codebooks(sample_vectors(emb, 128), m=8, k=16, iters=4)
    qrows = emb.filter("vec_id < 2").orderBy("vec_id").collect()
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    out = adc_candidates(encode_pq(emb, books), books, queries, r=25)
    pdf = out.toPandas()
    assert set(pdf["query_id"]) == {0, 1}
    assert (pdf.groupby("query_id").size() == 25).all()
    # the query vector itself must always survive ADC at r=25: its code
    # equals its own quantization, so its ADC score is maximal-ish
    for qid in (0, 1):
        assert qid in set(pdf[pdf["query_id"] == qid]["vec_id"])


def test_adc_candidates_probe_cells_restriction(spark):
    """With probe_cells, a query's candidates come only from ITS cells,
    different queries can probe different cells, and a query probing an
    empty cell set yields no rows."""
    x = _toy()
    books = train_codebooks(x, m=4, k=8, iters=5)
    vecs = [np.concatenate([books[j][i % 8] for j in range(4)])
            for i in range(12)]
    df = spark.createDataFrame(
        [(i, v.tolist(), i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, cluster_id long",
    )
    encoded = encode_pq(df, books).join(
        df.select("vec_id", "cluster_id"), "vec_id"
    )
    q = vecs[0].tolist()
    out = adc_candidates(
        encoded,
        books,
        [(0, q), (1, q), (2, q)],
        r=10,
        probe_cells={0: {0}, 1: {1, 2}, 2: set()},
    ).toPandas()
    got = {
        qid: set(out[out["query_id"] == qid]["vec_id"])
        for qid in set(out["query_id"])
    }
    assert got[0] == {0, 3, 6, 9}            # cell 0 members only
    assert got[1] == {1, 2, 4, 5, 7, 8, 10, 11}  # cells 1+2
    assert 2 not in got                       # empty probe set -> no rows
