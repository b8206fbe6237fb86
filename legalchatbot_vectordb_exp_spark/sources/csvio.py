"""CSV source/sink with the reference's encoding semantics.

The reference reads and writes the QA case table with
``encoding="utf-8-sig"`` (BOM) — ``Qdrant/main.py:118``,
``Qdrant/llm.py:135``.  Spark's CSV reader strips a UTF-8 BOM from the
first field automatically; on write we don't emit a BOM (downstream
Spark/DuckDB don't want one), we just guarantee UTF-8.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_cases_csv(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .option("multiLine", True)  # case narratives contain newlines
        .option("escape", '"')
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_cases_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """``to_csv(index=False)`` twin; ``single_file`` coalesces to one
    part (only sane for small outputs — driver-side convenience)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("encoding", "UTF-8")
        .option("escape", '"')
        .csv(path)
    )
