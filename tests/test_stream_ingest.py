"""Continuous index ingestion: readStream → embed → foreachBatch
upsert into a VectorCollection (streaming/ingest.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.sources.collection import (
    VectorCollection,
)
from legalchatbot_vectordb_exp_spark.streaming.ingest import (
    read_document_stream,
    stream_index_into_collection,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_index_builds_and_merges(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, [(1, "alpha beta"), (2, "gamma delta")])
    _write_docs(spark, src, [(3, "epsilon zeta")])

    coll = VectorCollection(spark, str(tmp_path / "wh"), "stream_idx")
    seed = spark.createDataFrame(
        [("2", [1.0] + [0.0] * 63)], "id string, vector array<double>"
    )
    coll.create(seed, dim=64)

    q = stream_index_into_collection(
        read_document_stream(spark, src), coll, ckpt, dim=64
    )
    q.awaitTermination(120)

    rows = {r["id"]: r for r in coll.read().collect()}
    # 3 streamed ids; id "2" was overwritten (last-writer-wins), so the
    # seed vector is gone and every vector is a unit embedding
    assert set(rows) == {"1", "2", "3"}
    for r in rows.values():
        norm = sum(x * x for x in r["vector"]) ** 0.5
        assert abs(norm - 1.0) < 1e-9
    assert list(rows["2"]["vector"])[:2] != [1.0, 0.0]

    # late-arriving update: only new offsets process on restart, and the
    # keyed merge is idempotent on the updated id
    _write_docs(spark, src, [(3, "replacement text"), (4, "eta theta")])
    v3_before = list(rows["3"]["vector"])
    q2 = stream_index_into_collection(
        read_document_stream(spark, src), coll, ckpt, dim=64
    )
    q2.awaitTermination(120)

    after = {r["id"]: list(r["vector"]) for r in coll.read().collect()}
    assert set(after) == {"1", "2", "3", "4"}
    assert after["3"] != v3_before  # id 3 re-embedded from new text
