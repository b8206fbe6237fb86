"""Round-18 diagnostic for the three BENCH_r17 regressions
(text_stats, time_gapfill, pii_redact — byte-identical code, 2.6-3x
slower in the full suite).

Phases:
  A  fresh session, run the 3 queries x3         -> clean baseline
  B  build every staged fixture (the ann/hybrid/stream families'
     process-cached localCheckpoints), rerun x3  -> staged-state effect
  C  unpersist all persistent RDDs, rerun x3     -> does releasing
                                                    restore phase A?
  D  churn 150 trivial jobs (listener/status-store aging), rerun x3

Prints one JSON line per phase.  Not part of the bench contract —
a throwaway measurement harness (kept in-repo for provenance).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _STAGED_FIXTURE_QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402

TARGETS = ["text_stats", "time_gapfill", "pii_redact"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the bench's own staged-fixture list — hand-duplicating it here went
# stale within one round (it missed sparse_layout_incremental), so the
# diagnostic would have measured a different staged state than the
# bench actually builds
STAGED = sorted(_STAGED_FIXTURE_QUERIES)


def run3(spark, name):
    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def jvm_stats(spark):
    jsc = spark.sparkContext._jsc.sc()
    rdds = spark.sparkContext._jsc.getPersistentRDDs().size()
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    return {"persistent_rdds": rdds, "jvm_used_mb": round(used),
            "executor_mem_status": jsc.getExecutorMemoryStatus().size()}


def main():
    spark = get_spark(app_name="diag", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    warm.count()
    warm.groupBy("r_regionkey").count().write.mode("overwrite").format(
        "noop").save()

    def _wk(b):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from b

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        _wk, schema="id long").write.mode("overwrite").format("noop").save()
    spark.createDataFrame([(0, 0)], "a long, b long").write.mode(
        "overwrite").format("noop").save()

    res = {}
    res["A"] = {n: run3(spark, n) for n in TARGETS}
    res["A_jvm"] = jvm_stats(spark)
    print(json.dumps({"phase": "A", **res["A"], **res["A_jvm"]}),
          flush=True)

    t0 = time.perf_counter()
    for n in STAGED:
        try:
            QUERIES[n](spark, SF_DIR).write.mode("overwrite").format(
                "noop").save()
        except Exception as e:  # noqa: BLE001
            print(f"stage {n} failed: {e}", flush=True)
    stage_s = round(time.perf_counter() - t0, 1)
    res["B"] = {n: run3(spark, n) for n in TARGETS}
    res["B_jvm"] = jvm_stats(spark)
    print(json.dumps({"phase": "B", "stage_s": stage_s, **res["B"],
                      **res["B_jvm"]}), flush=True)

    # phase C: drop every persisted RDD (localCheckpoints included)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    n_un = 0
    while it.hasNext():
        e = it.next()
        try:
            e.getValue().unpersist(True)
            n_un += 1
        except Exception:
            pass
    spark.sparkContext._jvm.java.lang.System.gc()
    time.sleep(1)
    res["C"] = {n: run3(spark, n) for n in TARGETS}
    res["C_jvm"] = jvm_stats(spark)
    print(json.dumps({"phase": "C", "unpersisted": n_un, **res["C"],
                      **res["C_jvm"]}), flush=True)

    # phase D: listener/status-store churn — 300 trivial jobs
    import pyspark.sql.functions as F
    for _ in range(300):
        spark.range(1000).select(F.sum("id")).write.mode(
            "overwrite").format("noop").save()
    res["D"] = {n: run3(spark, n) for n in TARGETS}
    res["D_jvm"] = jvm_stats(spark)
    print(json.dumps({"phase": "D", **res["D"], **res["D_jvm"]}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
