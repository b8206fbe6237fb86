from legalchatbot_vectordb_exp_spark.streaming.events import (
    read_event_stream,
    streaming_dedup,
    streaming_sessions,
    tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "streaming_dedup",
    "streaming_sessions",
    "tumbling_counts",
]
