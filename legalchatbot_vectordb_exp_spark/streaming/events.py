"""Structured Streaming operators over the events stream (extension
E6 — the reference has no streaming at all, SURVEY.md §2.8; its
ingest is batch truncate-and-reload).

Each operator shares its window expression with the batch twin in
``queries_events.py`` — the semantics checked by the DuckDB oracle are
the semantics running incrementally here.  Watermarks bound state:
late rows beyond the watermark are dropped, and window/dedup state is
evicted once the watermark passes, so state size is O(open windows),
not O(stream history) — the property that matters at 100 TB/day.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    schema: StructType | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files
    (drop-in for Kafka in this environment — the downstream operators
    are source-agnostic).  Pass a narrower ``schema`` when the staged
    files were projected to the consumed columns."""
    return (
        spark.readStream.schema(schema or EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (batch twin:
    ``events_tumbling``).

    The value sum accumulates as DECIMAL, not double: decimal addition
    is exact and associative, so the result is independent of how rows
    are split across micro-batches — what makes the availableNow
    replay (``events_streaming_live``) bit-comparable to a relational
    oracle."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keeps state bounded; batch twin:
    ``events_dedup``)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def streaming_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with an inactivity gap (batch twin:
    ``events_sessionize``'s lag/cumsum construction)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within
    ``(left.ts + lower, left.ts + upper]`` of a same-key left row —
    the streaming twin of ``operators/interval.py``.

    Both sides are watermarked and the join condition carries explicit
    time bounds, so Spark can evict join state once the watermark
    passes ``upper`` — state is O(events in the join window), not
    O(stream history).  Left columns come back prefixed ``l_``, right
    columns ``r_``.
    """
    l = left.withWatermark("ts", watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark("ts", watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{on}") == F.col(f"r_{on}"))
        & (F.col("r_ts") > F.col("l_ts") + F.expr(f"INTERVAL {lower}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")
