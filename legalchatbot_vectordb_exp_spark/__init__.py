"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference RAG experiment
(Puthipongyo/legalchatbot-vectordb-exp, surveyed in SURVEY.md).

Everything is DataFrame-first: operators are lazy column expressions /
window specs that Catalyst optimizes; Python crosses the JVM boundary
only at the three Arrow-UDF sites (document extraction, embedding,
generation) — see SURVEY.md §3.4.
"""

from legalchatbot_vectordb_exp_spark.session import get_spark
from legalchatbot_vectordb_exp_spark.io_tables import load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES"]

__version__ = "0.1.0"
