"""Continuous index ingestion: the reference's batch ingest pipeline
(PDF/text → embed → normalize → upsert, ``Qdrant/main.py:91-111``)
re-expressed as Structured Streaming — new document files are embedded
and merged into a ``VectorCollection`` as they arrive, instead of the
reference's truncate-and-reload (``Qdrant/VectorDB/Database.py:10-14``).

Shape: file-source ``readStream`` → iterator ``pandas_udf`` embedding
(model loads once per executor, Arrow batches) → ``foreachBatch``
upsert.  ``foreachBatch`` is the idiomatic sink when the write is a
*merge* rather than an append: each micro-batch is a normal DataFrame,
so the collection's keyed last-writer-wins upsert (or the
partition-scoped ``upsert_ivf``) applies unchanged.  Exactly-once
comes from the checkpointed source offsets + idempotent keyed upsert
(re-processing a batch overwrites the same ids with the same values).

At 100 TB-scale ingest the same topology runs against a Kafka source
and a Delta ``MERGE`` sink; nothing in the plan changes but the
format strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from legalchatbot_vectordb_exp_spark.ml.embed import embed_text_udf
from legalchatbot_vectordb_exp_spark.sources.collection import (
    VectorCollection,
)

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    schema: StructType | None = None,
) -> DataFrame:
    """File-source stream over a directory of document parquet files
    (drop-in for Kafka here; downstream operators are source-agnostic)."""
    return (
        spark.readStream.schema(schema or DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_index_into_collection(
    docs: DataFrame,
    collection: VectorCollection,
    checkpoint_dir: str,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the continuous index build: embed each micro-batch and
    merge it into the collection keyed on ``id_col``.

    The embedding UDF runs *inside* the streaming plan (executors,
    Arrow batches); only the final keyed merge goes through
    ``foreachBatch``.  Idempotent by construction — the same ids
    re-upsert to the same rows — so retried batches are safe.
    """
    props = collection.properties
    vector_col = props["vector_col"]
    cid = props["id_col"]

    embedded = docs.select(
        F.col(id_col).cast("string").alias(cid),
        embed_text_udf(dim)(F.col(text_col)).alias(vector_col),
    )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            collection.upsert(batch)

    writer = (
        embedded.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_into_versioned(
    docs: DataFrame,
    collection,
    checkpoint_dir: str,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous index build into a ``VersionedCollection``
    (``sources/versioned.py``): embed each micro-batch, COW-MERGE it.

    vs ``stream_index_into_collection``: every micro-batch becomes one
    committed VERSION — the ingest history is queryable (``history()``
    shows one ``merge:update`` per non-empty batch) and any past index
    state is time-travel readable while ingest keeps running (readers
    resolve immutable snapshots; the stream never overwrites what a
    concurrent query has open).  Restart semantics: checkpointed
    source offsets make re-processing rare, and a re-merged batch is
    value-idempotent (same keys → same rows) — it just burns an extra
    version, which ``vacuum`` retires.  Duplicate ids *within* one
    batch are rejected by merge's write-time validation: dedup
    upstream (e.g. ``dropDuplicatesWithinWatermark``) for sources
    that can repeat a key inside a trigger.
    """
    props = collection.properties
    vector_col = props["vector_col"]
    cid = props["id_col"]

    embedded = docs.select(
        F.col(id_col).alias(cid),
        embed_text_udf(dim)(F.col(text_col)).alias(vector_col),
    )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            collection.merge(batch)

    writer = embedded.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
