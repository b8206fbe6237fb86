"""recall@k / MRR@k vs a direct Python reimplementation of the
reference's evaluation loop (``Qdrant/llm.py:143-163`` semantics:
gold = set of \\d+ in answers, pred = first-k \\d+ in prediction,
rr = 1/first-match rank, recall = |gold ∩ pred[:k]|/|gold| else 0)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.operators.evaluate import with_recall_mrr

CASES = [
    # (answers, predicted, k)
    ("มาตรา 1336, 1299", "1336 และ 1299", 5),
    ("193/33 และ 420", "193 33 420", 5),       # slash splits into two golds
    ("", "123", 5),                             # empty gold → recall 0, rr 0
    ("420", "", 5),                             # empty pred
    ("420", "999 888 777 666 555 420", 5),      # match beyond k → miss
    ("420 421", "421 421 420", 3),              # dup pred, first match rank 1
    ("7", "a7b then 77", 2),                    # embedded digits
    ("10 20 30", "30", 1),
]


def ref_eval(answers: str, predicted: str, k: int) -> tuple[float, float]:
    gold = set(re.findall(r"\d+", answers))
    pred = re.findall(r"\d+", predicted)[:k]
    rr = 0.0
    for i, p in enumerate(pred, start=1):
        if p in gold:
            rr = 1.0 / i
            break
    recall = (len(gold & set(pred)) / len(gold)) if gold else 0.0
    return recall, rr


def test_matches_reference_loop(spark):
    for answers, predicted, k in CASES:
        df = spark.createDataFrame(
            [(answers, predicted)], ["answers", "predicted_law"]
        )
        row = with_recall_mrr(df, k=k).select("recall_at_k", "mrr_at_k").head()
        exp_recall, exp_rr = ref_eval(answers, predicted, k)
        assert abs(row.recall_at_k - exp_recall) < 1e-12, (answers, predicted, k)
        assert abs(row.mrr_at_k - exp_rr) < 1e-12, (answers, predicted, k)
