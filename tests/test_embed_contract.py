"""The embed UDF's batch contract must be backend-independent: the
hash embedder (container default) and a SentenceTransformer-style real
model (recorded fixture when the optional dep is absent, the real
thing when present) must both come out of ``embed_text_udf`` as
L2-normalized float64 arrays of a constant per-backend dimension,
one row per input text (round-3 review item 4).
"""

from __future__ import annotations

import importlib.util
import math

import pytest

from legalchatbot_vectordb_exp_spark.ml import embed as embed_mod
from legalchatbot_vectordb_exp_spark.ml.embed import (
    RecordedSTFixture,
    embed_text_udf,
    set_model_factory,
)

TEXTS = ["hello", "world", "", "มาตรา 420", "hello"]


@pytest.fixture
def reset_factory():
    yield
    set_model_factory(None)  # restore default resolution


def _run_udf(spark, dim):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    return df.select(
        "text", embed_text_udf(dim=dim)("text").alias("v")
    ).collect()


def _assert_contract(rows, dim):
    assert len(rows) == len(TEXTS)  # one row per text
    by_text = {}
    for r in rows:
        assert len(r.v) == dim  # constant dimension
        assert all(isinstance(x, float) for x in r.v)  # float64 elements
        n = math.sqrt(sum(x * x for x in r.v))
        assert abs(n - 1.0) < 1e-6  # unit norm (float32 models widen)
        by_text.setdefault(r.text, []).append(list(r.v))
    # deterministic: same text → identical vector across rows/batches
    assert by_text["hello"][0] == by_text["hello"][1]
    return by_text


def test_default_backend_contract(spark, reset_factory):
    """Whatever backend the default resolution picks (hash embedder in
    this container; the reference's SentenceTransformer where the dep
    is installed), the UDF output contract is the same."""
    if importlib.util.find_spec("sentence_transformers") is not None:
        dim = 384  # paraphrase-multilingual-MiniLM-L12-v2 output dim
    else:
        dim = 16
    _assert_contract(_run_udf(spark, dim), dim)


def test_recorded_real_backend_contract(spark, reset_factory):
    """The recorded SentenceTransformer fixture (float32,
    un-normalized encode output) passes the IDENTICAL assertions —
    the UDF owns normalization and float64 widening, not the model.
    Also proves the installed factory actually reaches the Python
    workers: the fixture's vectors differ from the hash embedder's."""
    dim = RecordedSTFixture.DIM
    hash_by_text = _assert_contract(_run_udf(spark, dim), dim)
    set_model_factory(RecordedSTFixture)
    real_by_text = _assert_contract(_run_udf(spark, dim), dim)
    assert real_by_text["hello"][0] != hash_by_text["hello"][0]


def test_backend_swap_is_schema_invariant(spark, reset_factory):
    """Swapping backends never changes schema or row multiplicity —
    only vector values — so a real-model deployment is a pure config
    change, not a plan change."""
    dim = RecordedSTFixture.DIM
    hash_rows = _run_udf(spark, dim)
    set_model_factory(RecordedSTFixture)
    real_rows = _run_udf(spark, dim)
    assert [r.text for r in hash_rows] == [r.text for r in real_rows]
    assert all(
        len(a.v) == len(b.v) for a, b in zip(hash_rows, real_rows)
    )


def test_dim_mismatch_fails_loudly(spark, reset_factory):
    """ADVICE r4: a backend whose native width differs from the
    requested ``dim`` must raise inside the UDF (unsized array<double>
    would otherwise let results diverge silently per-environment)."""
    set_model_factory(RecordedSTFixture)  # native DIM = 8
    with pytest.raises(Exception, match="dim"):
        _run_udf(spark, dim=16)
