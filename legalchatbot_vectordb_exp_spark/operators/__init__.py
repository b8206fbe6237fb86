from legalchatbot_vectordb_exp_spark.operators.topk import (
    topk_search,
    topk_search_batch,
)
from legalchatbot_vectordb_exp_spark.operators.context import assemble_context
from legalchatbot_vectordb_exp_spark.operators.evaluate import (
    extract_numbers,
    with_recall_mrr,
    mean_metrics,
)

__all__ = [
    "topk_search",
    "topk_search_batch",
    "assemble_context",
    "extract_numbers",
    "with_recall_mrr",
    "mean_metrics",
]
