from legalchatbot_vectordb_exp_spark.sources.collection import VectorCollection
from legalchatbot_vectordb_exp_spark.sources.csvio import read_cases_csv, write_cases_csv
from legalchatbot_vectordb_exp_spark.sources.pdf import read_pdf_pages

__all__ = ["VectorCollection", "read_cases_csv", "write_cases_csv", "read_pdf_pages"]
