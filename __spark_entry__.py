"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship single-query top-k cosine search at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the operator registry from
``legalchatbot_vectordb_exp_spark.queries`` (each Spark query paired
with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
