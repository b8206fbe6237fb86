"""Semantic checks for the training-prep operators (oracle parity is
covered by test_oracle_parity's registry sweep)."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.queries_training import (
    BENCH_MOD,
    CONTAM_MIN_SHARED,
    CONTAM_NGRAM,
    SEQ_LEN,
    q_decontamination,
    q_hash_split,
    q_sequence_packing,
)


def test_hash_split_partitions_whole_corpus(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    total = docs.count()
    rows = q_hash_split(spark, sf_smoke).collect()
    assert len(rows) == total
    counts = defaultdict(int)
    for r in rows:
        counts[r.split] += 1
    assert set(counts) <= {"train", "val", "test"}
    # 90/5/5 within binomial noise on a small corpus
    assert counts["train"] / total > 0.8


def test_hash_split_stable_under_growth(spark, sf_smoke, sf_correct):
    """A document's split must not change when the corpus grows —
    sf0.001 doc_ids are a subset of sf0.01's."""
    small = {r.doc_id: r.split for r in q_hash_split(spark, sf_smoke).collect()}
    big = {r.doc_id: r.split for r in q_hash_split(spark, sf_correct).collect()}
    moved = {d for d in small if big.get(d) != small[d]}
    assert not moved


def test_sequence_packing_dense_per_shard(spark, sf_smoke):
    """Within a shard, token intervals are contiguous (concat-and-chunk
    wastes zero tokens) and sequence ids are consistent with offsets."""
    rows = q_sequence_packing(spark, sf_smoke).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rs:
            assert r.first_seq == shard * 1000000 + offset // SEQ_LEN
            assert (
                r.last_seq
                == shard * 1000000 + (offset + r.n_toks - 1) // SEQ_LEN
            )
            assert r.first_seq <= r.last_seq
            offset += r.n_toks


def test_decontamination_pairs_really_overlap(spark, sf_correct):
    """Every flagged (train, bench) pair must share ≥ CONTAM_MIN_SHARED
    distinct n-gram shingles — recomputed independently in Python."""
    flagged = q_decontamination(spark, sf_correct).collect()
    assert flagged, "expected non-empty contamination at sf0.01"
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_correct}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def shingles(text):
        ws = [w for w in text.strip().split() if w]
        if len(ws) <= CONTAM_NGRAM:
            return {" ".join(ws)}
        return {
            " ".join(ws[i : i + CONTAM_NGRAM])
            for i in range(len(ws) - CONTAM_NGRAM + 1)
        }

    for r in flagged:
        assert r.train_id % BENCH_MOD != 0
        assert r.bench_id % BENCH_MOD == 0
        shared = shingles(docs[r.train_id]) & shingles(docs[r.bench_id])
        assert len(shared) == r.n_shared >= CONTAM_MIN_SHARED


def test_negative_sampling_rejects_singleton_corpus(spark, tmp_path):
    """n < 2 must raise a clear error instead of a mod-by-zero in the
    `% (n-1)` slot expression (ADVICE r5/r6)."""
    import pytest

    from legalchatbot_vectordb_exp_spark.queries_training import (
        q_negative_sampling,
    )

    one = spark.range(1).selectExpr(
        "id AS vec_id",
        "array(0.1D, 0.2D) AS embedding",
        "0L AS label",
    )
    one.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    with pytest.raises(ValueError, match=">=2 embeddings"):
        q_negative_sampling(spark, str(tmp_path))
