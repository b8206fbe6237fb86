from legalchatbot_vectordb_exp_spark.sinks.text import write_chunk_dump

__all__ = ["write_chunk_dump"]
