"""Semantic checks for the curation operators (oracle parity is covered
by test_oracle_parity's sweep over the registry)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.queries_curation import (
    BOILERPLATE_MIN_DOCS,
    BOILERPLATE_MIN_SOURCES,
    TARGET_FRACTION,
    q_boilerplate_shingles,
    q_repetition_score,
    q_temperature_sample,
    q_text_normalize,
)


def test_normalize_alphabet_and_spacing(spark, sf_smoke):
    rows = q_text_normalize(spark, sf_smoke).collect()
    pat = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$")
    for r in rows:
        if r.norm_text:
            assert pat.match(r.norm_text), r.norm_text[:80]
        assert r.n_tokens_norm == (
            len(r.norm_text.split(" ")) if r.norm_text else 0
        )


def test_normalize_idempotent(spark, sf_smoke):
    """Normalizing already-normalized text is the identity."""
    once = q_text_normalize(spark, sf_smoke)
    renorm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("norm_text"), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    n_changed = once.filter(renorm != F.col("norm_text")).count()
    assert n_changed == 0


def test_boilerplate_thresholds_hold(spark, sf_smoke):
    for r in q_boilerplate_shingles(spark, sf_smoke).collect():
        assert r.n_docs >= BOILERPLATE_MIN_DOCS
        assert r.n_sources >= BOILERPLATE_MIN_SOURCES


def test_repetition_ratios_bounded(spark, sf_smoke):
    for r in q_repetition_score(spark, sf_smoke).collect():
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.dup_bigram_ratio <= 1.0
        assert r.n_tokens >= 0


def test_temperature_sample_deterministic_and_on_target(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    total = docs.count()
    kept1 = {r.doc_id for r in q_temperature_sample(spark, sf_smoke).collect()}
    kept2 = {r.doc_id for r in q_temperature_sample(spark, sf_smoke).collect()}
    assert kept1 == kept2  # md5 selection: same rows every run
    # binomial noise around the target fraction; generous band
    assert 0.25 * total <= len(kept1) <= 0.8 * total


def test_temperature_sample_flattens_sources(spark, tmp_path):
    """Keep-RATE must be non-increasing in source size (alpha < 1):
    bigger sources are downsampled harder.  The driver corpus has
    uniform source sizes, so this uses a deliberately skewed one."""
    rows = []
    doc_id = 0
    for src, n in [("big", 800), ("mid", 150), ("tiny", 50)]:
        for _ in range(n):
            rows.append((doc_id, f"text {doc_id}", "en", src, 10))
            doc_id += 1
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    after = {
        r.source: r.n
        for r in q_temperature_sample(spark, str(tmp_path))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rate = {
        "big": after.get("big", 0) / 800,
        "mid": after.get("mid", 0) / 150,
        "tiny": after.get("tiny", 0) / 50,
    }
    assert rate["big"] < rate["mid"] < rate["tiny"]
    # overall volume lands near the target fraction
    kept = sum(after.values())
    assert 0.3 * 1000 <= kept <= 0.7 * 1000
    assert TARGET_FRACTION == 0.5
