from legalchatbot_vectordb_exp_spark.plans.topk_planner import plan_topk_search

__all__ = ["plan_topk_search"]
