"""Benchmark harness: run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full plan runs, no driver
materialization cost polluting the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the paths every query shares before the clock starts: scan +
    # codegen (count), a shuffled aggregate, and the Arrow/Python-worker
    # bridge (tiny mapInPandas) — otherwise the alphabetically-first
    # query is billed for one-time JVM/worker initialization.
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.count()
    warm.groupBy("r_regionkey").count().write.mode("overwrite").format(
        "noop"
    ).save()
    warm.select("r_regionkey").mapInPandas(
        lambda it: it, schema="r_regionkey int"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
