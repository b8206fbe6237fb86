"""Isolated per-query micro-bench: fresh process, warmed JVM (same
warm-up as bench.py), then min-of-N noop-sink timings per named query.

Usage: python tools_r21/qbench.py q1 q2 ...          # steady min-of-3
       QB_REPEATS=5 python tools_r21/qbench.py q1    # more repeats

Prints per-query: first-run seconds (fixture-inclusive) and steady min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    repeats = int(os.environ.get("QB_REPEATS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="qbench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: scan+codegen, shuffle agg, Python workers
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.count()
    warm.groupBy("r_regionkey").count().write.mode("overwrite").format(
        "noop"
    ).save()

    def _warm_kernel(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        _warm_kernel, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    spark.createDataFrame([(0, 0)], "a long, b long").write.mode(
        "overwrite"
    ).format("noop").save()
    # run the calibration kernel a few times to push JIT toward steady
    import pyspark.sql.functions as F

    for _ in range(3):
        (
            spark.range(2_000_000)
            .select(
                (F.col("id") * 2654435761 % 1000003).alias("h"),
                (F.col("id") % 4096).alias("g"),
            )
            .groupBy("g")
            .agg(F.sum("h").alias("s"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    out = {}
    for name in names:
        fn = QUERIES[name]
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"first": runs[0], "steady": min(runs[1:] or runs), "runs": runs}
        print(f"{name}: first={runs[0]} steady={min(runs[1:] or runs)} runs={runs}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
