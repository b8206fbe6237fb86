"""A/B: noDataMicroBatches on vs off for events_stream_join_live.

Alternating same-process runs; rows hashed both ways to prove the
inner-join emission set is unchanged.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402
from legalchatbot_vectordb_exp_spark.queries_events import (  # noqa: E402
    q_events_stream_join_live,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(
    app_name="exp-stream-join",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")


def run(tag):
    t0 = time.perf_counter()
    df = q_events_stream_join_live(spark, SF)
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    import pyspark.sql.functions as F

    h = (
        df.select(
            F.sha2(
                F.concat_ws(
                    "|", "click_id", "n_purchases", "purchase_value"
                ),
                256,
            ).alias("h")
        )
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256))
        .collect()[0][0]
    )
    print(f"{tag}: {dt:.2f}s hash={h[:16]}", flush=True)
    return dt, h


# warm staging (fixture)
run("warmup(fixture)")

KEY = "spark.sql.streaming.noDataMicroBatches.enabled"
res = {}
for i in range(3):
    for mode in ("on", "off"):
        spark.conf.set(KEY, "true" if mode == "on" else "false")
        dt, h = run(f"rep{i} noData={mode}")
        res.setdefault(mode, []).append((dt, h))
spark.conf.set(KEY, "true")

hs = {h for v in res.values() for _, h in v}
print("hashes identical:", len(hs) == 1)
for m, v in res.items():
    print(m, "min", round(min(d for d, _ in v), 2), [round(d, 2) for d, _ in v])
