"""Char-budget context assembly vs a direct Python reimplementation of
the reference accumulation loop (``Qdrant/llm.py:22-34`` semantics)."""

from __future__ import annotations

from legalchatbot_vectordb_exp_spark.operators.context import (
    SEPARATOR,
    assemble_context,
)


def ref_assemble(hits, budget):
    """hits: list of (score, text, page, chunk) already sorted desc."""
    parts, total = [], 0
    for score, text, page, chunk in hits:
        txt = text.strip()
        if not txt:
            continue
        remaining = budget - total
        if len(txt) > remaining:
            txt = txt[:remaining]
        parts.append(f"[Page {page} | Chunk {chunk}]\n{txt}")
        total += len(txt)
        if total >= budget:
            break
    return SEPARATOR.join(parts)


def run_case(spark, hits, budget):
    rows = [
        ("q1", float(s), t, p, c, i) for i, (s, t, p, c) in enumerate(hits)
    ]
    df = spark.createDataFrame(
        rows, ["query_id", "score", "text", "page", "chunk_index", "hid"]
    )
    out = assemble_context(df, budget=budget, id_col="hid")
    got = {r.query_id: r.context for r in out.collect()}
    expected = ref_assemble(hits, budget)
    if expected == "":
        assert got == {} or got.get("q1") == ""
    else:
        assert got["q1"] == expected


def test_basic_and_truncation(spark):
    hits = [(0.9, "a" * 50, 1, 0), (0.8, "b" * 50, 2, 1), (0.7, "c" * 50, 3, 2)]
    run_case(spark, hits, budget=120)  # third hit truncated to 20 chars


def test_exact_budget_early_exit(spark):
    hits = [(0.9, "a" * 60, 1, 0), (0.8, "b" * 60, 2, 1), (0.7, "c" * 60, 3, 2)]
    run_case(spark, hits, budget=120)  # second hit exactly fills → stop


def test_empty_text_skipped_without_budget(spark):
    hits = [(0.9, "   ", 1, 0), (0.8, "xy", 2, 1)]
    run_case(spark, hits, budget=100)


def test_whitespace_stripped_before_count(spark):
    hits = [(0.9, "  abc  ", 1, 0), (0.8, "defgh", 2, 1)]
    run_case(spark, hits, budget=5)  # first consumes 3, second truncated to 2


def test_all_within_budget(spark):
    hits = [(0.5, "hello", 9, 3), (0.4, "world", 8, 2)]
    run_case(spark, hits, budget=4000)
