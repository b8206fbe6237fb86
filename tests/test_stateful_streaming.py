"""applyInPandasWithState custom operator: per-user profiles emitted on
processing-time timeout.  Driven with two micro-batch triggers and a
quiet period so the timeout fires, then totals checked against batch."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.streaming.events import read_event_stream
from legalchatbot_vectordb_exp_spark.streaming.stateful import (
    user_profile_stream,
)


def test_user_profiles_emitted_on_timeout(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "events_src")
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName("t_profiles")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait until data is consumed, then for the quiet-period timeout
        deadline = time.time() + 90
        while time.time() < deadline:
            got = spark.sql("SELECT count(*) c FROM t_profiles").head().c
            if got >= ev.select("user_id").distinct().count():
                break
            time.sleep(2)
        out = spark.sql("SELECT * FROM t_profiles").collect()
    finally:
        q.stop()

    by_user = {r.user_id: r for r in out}
    expected = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    }
    assert set(by_user) == set(expected)
    for uid, exp in expected.items():
        got = by_user[uid]
        assert got.n_events == exp.n
        assert abs(got.total_value - exp.total) < 1e-6
        assert got.first_ts == exp.lo and got.last_ts == exp.hi
