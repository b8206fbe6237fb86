from legalchatbot_vectordb_exp_spark.streaming.events import (
    read_event_stream,
    streaming_dedup,
    streaming_sessions,
    tumbling_counts,
)
from legalchatbot_vectordb_exp_spark.streaming.ingest import (
    read_document_stream,
    stream_index_into_collection,
)

__all__ = [
    "read_document_stream",
    "read_event_stream",
    "stream_index_into_collection",
    "streaming_dedup",
    "streaming_sessions",
    "tumbling_counts",
]
