"""Semantic tests for the E10 family on CRAFTED corpora: planted
duplicates must be caught, clean rows must survive.  Oracle parity
(test_oracle_parity) proves Spark == DuckDB; these prove both compute
the thing the operator claims."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legalchatbot_vectordb_exp_spark.queries_scale import (
    _INCOMING_CUT,
    q_dedup_incremental,
    q_semdedup_cells,
    q_substring_dedup_spans,
)


def _hash_bucket(doc_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def _write_documents(spark, path: str, rows) -> str:
    df = spark.createDataFrame(
        [(i, t, "en", "crafted", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def id_pools():
    corpus = [i for i in range(5000) if _hash_bucket(i) < _INCOMING_CUT]
    incoming = [i for i in range(5000) if _hash_bucket(i) >= _INCOMING_CUT]
    return corpus, incoming


def test_incremental_dedup_flags_planted_copy(spark, tmp_path, id_pools):
    corpus_ids, incoming_ids = id_pools
    dup_text = (
        "the quick brown fox jumps over the lazy dog near the old "
        "river bank where tall green willows bend in morning wind"
    )
    uniq = (
        "completely different subject matter entirely about parquet "
        "column encodings dictionary pages and run length schemes"
    )
    rows = [
        (corpus_ids[0], dup_text),
        (corpus_ids[1], "another corpus doc about shuffle partitioning"),
        (incoming_ids[0], dup_text),  # exact copy of a corpus doc
        (incoming_ids[1], uniq),  # genuinely new
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {
        int(r["doc_id"]): bool(r["is_dup"])
        for r in q_dedup_incremental(spark, sf).collect()
    }
    assert got[incoming_ids[0]] is True
    assert got[incoming_ids[1]] is False
    assert set(got) == {incoming_ids[0], incoming_ids[1]}


def test_substring_spans_count_planted_overlap(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram
    rows = [
        (1, f"unique one two three four {shared}"),
        (2, f"{shared} totally different tail words here"),
        (3, "no overlap with anything else at all whatsoever"),
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {
        int(r["doc_id"]): (int(r["n_dup_grams"]), int(r["n_grams"]))
        for r in q_substring_dedup_spans(spark, sf).collect()
    }
    # docs 1 and 2 each contain the shared 5-gram at exactly one
    # position; doc 3 shares nothing
    assert got[1][0] == 1 and got[2][0] == 1
    assert got[3][0] == 0
    # total positions = words - 5 + 1
    assert got[3][1] == 8 - 5 + 1


def test_semdedup_drops_planted_identical_vector(spark, tmp_path):
    import math

    dim = 64
    base = [1.0 / math.sqrt(dim)] * dim
    other = [0.0] * dim
    other[0] = 1.0
    anti = [-x for x in base]  # cosine -1 vs base
    rows = [
        (0, base, 0),  # centroid (vec_id % mod == 0)
        (7, base, 0),  # identical direction → dup of 0
        (9, anti, 1),  # opposite direction → kept
        (11, other, 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {
        int(r["vec_id"]): bool(r["kept"])
        for r in q_semdedup_cells(spark, str(tmp_path)).collect()
    }
    assert got[0] is True  # smallest id in its cell always survives
    assert got[7] is False  # identical to a smaller id → dropped
    assert got[9] is True  # anti-parallel: cosine −1 < τ


def test_bloom_fp_rate_zero_when_all_probes_match(spark, tmp_path):
    """fp_rate must be 0.0 — not NULL — when every probe row is an
    exact match (no negatives => no false positives by definition;
    ADVICE r5/r6).  Both engines agree via coalesce(.../nullif, 0)."""
    from legalchatbot_vectordb_exp_spark.queries_scale import (
        q_bloom_prune_join,
    )

    cust = spark.range(8).selectExpr(
        "id AS c_custkey", "'BUILDING' AS c_mktsegment"
    )
    cust.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.range(32).selectExpr(
        "id AS o_orderkey", "(id % 8) AS o_custkey"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    row = q_bloom_prune_join(spark, str(tmp_path)).collect()[0]
    assert row.n_exact == row.n_orders == 32
    assert row.fp_rate == 0.0


def test_semdedup_and_ann_share_one_quantizer(spark, sf_smoke):
    """SemDeDup's cell blocking and the ANN family must assign every
    vector to the SAME IVF cell (r5/r6 VERDICT ask): both now route
    through queries_ann.make_ivf_assign / ivf_best_cells, and this
    pins the distributed kernel against an independent driver-side
    evaluation so a quantizer change can't silently shift dedup
    groups relative to search cells."""
    import numpy as np

    from legalchatbot_vectordb_exp_spark.io_tables import load_table
    from legalchatbot_vectordb_exp_spark.queries_ann import (
        IVF_ASSIGN_SCHEMA,
        ivf_best_cells,
        ivf_mod_for,
        make_ivf_assign,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    rows = emb.collect()
    mod = ivf_mod_for(len(rows))
    cids = [int(r[0]) for r in rows if int(r[0]) % mod == 0]
    cmat = [list(map(float, r[1])) for r in rows if int(r[0]) % mod == 0]

    # distributed path (exactly what semdedup_cells / ann_ivf_topk run)
    dist = {
        int(r["vec_id"]): int(r["cluster_id"])
        for r in emb.mapInPandas(
            make_ivf_assign(cids, cmat), schema=IVF_ASSIGN_SCHEMA
        ).collect()
    }
    # independent driver-side evaluation of the same quantizer
    E = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    want = ivf_best_cells(E, cids, cmat)
    assert len(dist) == len(rows)
    for r, cell in zip(rows, want):
        assert dist[int(r[0])] == int(cell), int(r[0])
