"""JSONL (newline-delimited JSON) source/sink — the interchange format
of LLM training-data pipelines (one document object per line).

Design points for the 100 TB case:

* **Explicit schema always.**  Schema inference scans the whole input
  once before the real job; on a 100 TB corpus that doubles the read.
  Callers pass (or reuse) a ``StructType``; the documents schema ships
  as ``DOCUMENTS_SCHEMA``.
* **Corrupt lines are data, not exceptions.**  ``PERMISSIVE`` mode
  routes unparseable lines into ``_corrupt_record`` so one bad shard
  of a web-scale crawl cannot kill the job; ``quarantine_corrupt``
  splits them off for audit.  (``FAILFAST`` stays available for
  ingest-validation runs via ``mode``.)
* JSONL is splittable line-by-line, so a 100 TB directory parallelizes
  per-block like text; compressed shards (``.gz``) fall back to
  per-file tasks — prefer ``.zst``/uncompressed shard layouts upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# the synthetic documents table's shape (TESTDATA.md)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", IntegerType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    The returned frame carries ``_corrupt_record`` (null for clean
    rows) when mode is PERMISSIVE.
    """
    # StructType.add mutates the receiver — build a fresh StructType so
    # the caller's (module-level) schema is never widened in place
    full = StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def quarantine_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, corrupt) frames.

    Clean rows drop the corrupt-record column; corrupt rows keep only
    the raw line for audit."""
    if _CORRUPT not in df.columns:
        return df, df.limit(0).select(F.col(df.columns[0]).alias(_CORRUPT))
    # Spark forbids plans that reference ONLY the corrupt-record column
    # of a raw JSON scan (SPARK-21610): materialize the parse once,
    # then both splits read the cached result.
    df = df.cache()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = df.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    return clean, corrupt


def write_jsonl(
    df: DataFrame, path: str, shards: int | None = None, compression: str | None = None
) -> None:
    """Write newline-delimited JSON.  ``shards`` repartitions to a
    target output-file count (training loaders want even shard sizes);
    at scale leave it unset and let the write inherit upstream
    partitioning."""
    out = df.repartition(shards) if shards else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
