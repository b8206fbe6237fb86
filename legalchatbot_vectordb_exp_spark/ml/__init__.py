from legalchatbot_vectordb_exp_spark.ml.embed import embed_text_udf
from legalchatbot_vectordb_exp_spark.ml.generate import generate_rag_answers

__all__ = ["embed_text_udf", "generate_rag_answers"]
