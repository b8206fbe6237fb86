"""IR evaluation: recall@k and MRR@k over digit-extracted labels.

Reproduces ``LLM.evaluate_mrr_at_k`` (``Qdrant/llm.py:143-163``):

* gold   = the SET of ``\\d+`` matches in the answers text
  (``Qdrant/llm.py:138-140``, ``llm.py:148``) — note ``193/33`` splits
  into two numbers; that is reference behavior, reproduced not fixed.
* pred   = the FIRST k ``\\d+`` matches in the prediction text, in
  order, duplicates kept (``llm.py:149``).
* recall = |gold ∩ pred[:k]| / |gold|, 0.0 when gold is empty.
* rr     = 1 / (1-based rank of the FIRST pred element in gold),
  0.0 if none — order-sensitive first-match semantics
  (``llm.py:150-156``).

Pure column expressions → fully DuckDB-oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DIGITS = r"[0-9]+"


def extract_numbers(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(DIGITS), F.lit(0))


def recall_at_k(gold: Column, pred: Column, k: int) -> Column:
    """|set(gold) ∩ pred[:k]| / |set(gold)|, empty-gold → 0.0."""
    gold_set = F.array_distinct(gold)
    topk = F.slice(pred, 1, k)
    return F.when(F.size(gold_set) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(gold_set, topk)).cast("double")
        / F.size(gold_set).cast("double")
    )


def mrr_at_k(gold: Column, pred: Column, k: int) -> Column:
    """1 / first 1-based position in pred[:k] that appears in gold; 0.0
    when there is no match.  First-match (not best-match) semantics:
    zip predictions with their positions, keep matches, take min pos."""
    topk = F.slice(pred, 1, k)
    pos = F.zip_with(
        topk,
        F.sequence(F.lit(1), F.greatest(F.size(topk), F.lit(1))),
        lambda p, i: F.when(F.array_contains(gold, p), i).otherwise(F.lit(None)),
    )
    first = F.array_min(F.filter(pos, lambda x: x.isNotNull()))
    return F.coalesce(F.lit(1.0) / first.cast("double"), F.lit(0.0))


def with_recall_mrr(
    df: DataFrame,
    answers_col: str = "answers",
    pred_col: str = "predicted_law",
    k: int = 5,
) -> DataFrame:
    gold = extract_numbers(answers_col)
    pred = extract_numbers(pred_col)
    return df.withColumn("recall_at_k", recall_at_k(gold, pred, k)).withColumn(
        "mrr_at_k", mrr_at_k(gold, pred, k)
    )


def mean_metrics(df: DataFrame) -> DataFrame:
    """Whole-frame means (``Qdrant/llm.py:161-162``)."""
    return df.agg(
        F.avg("recall_at_k").alias("avg_recall"),
        F.avg("mrr_at_k").alias("avg_mrr"),
    )
