"""Experiment tracking wrapper: end-to-end eval → log flow using the
fallback recorder (mlflow absent in this container)."""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark import tracking
from legalchatbot_vectordb_exp_spark.operators.evaluate import (
    mean_metrics,
    with_recall_mrr,
)


def test_eval_metrics_flow_into_tracking(spark):
    tracking.clear_local_log()
    tracking.configure("http://127.0.0.1:5000", "legal-rag")
    df = spark.createDataFrame(
        [("420", "420"), ("111", "999")], ["answers", "predicted_law"]
    )
    row = mean_metrics(with_recall_mrr(df, k=5)).head()
    tracking.log_retrieval_run(
        params={"embedding_model": "hash-64", "distance": "cosine", "k": 5},
        metrics={"avg_recall": row.avg_recall, "avg_mrr": row.avg_mrr},
    )
    log = tracking.local_log()
    kinds = {(kind, key) for kind, key, _ in log}
    assert ("param", "embedding_model") in kinds
    assert ("metric", "avg_recall") in kinds
    vals = {key: v for kind, key, v in log if kind == "metric"}
    assert abs(vals["avg_recall"] - 0.5) < 1e-12
    assert abs(vals["avg_mrr"] - 0.5) < 1e-12
