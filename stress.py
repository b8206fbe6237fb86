"""Scale-robustness sweep: run every registered query against a larger
corpus and report per-query wall time (no oracle — this is the
"would it survive 10×?" check, not the correctness gate).

Usage:
    python stress.py [sf_dir]        # default /tmp/stress

Build a stress corpus by scaling the driver testdata (example used in
round 1: 10× documents/embeddings via repeated union with shifted ids,
written to /tmp/stress/*.parquet).  Findings from the 10× run are
recorded in SCALE.md §6c — this sweep is what exposed the
corpus-vector-plane LSH degeneracy (2 buckets → 100 M candidate
pairs) that motivated the md5-Rademacher planes.

Skew hardening is asserted separately in ``tests/test_skew_stress.py``:
a 90%-one-source corpus with corpus-hot boilerplate shingles, with the
"no task >10x median rows" balance contract pinned at each exchange of
the boilerplate/decontamination plans (broadcast joins + map-side
partial aggregation are what make the hot keys harmless).
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    spark = get_spark(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, object] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # keep sweeping; failures are findings
            timings[name] = f"ERROR: {str(ex)[:200]}"
        print(json.dumps({name: timings[name]}), flush=True)

    ok = [v for v in timings.values() if isinstance(v, float)]
    errors = {k: v for k, v in timings.items() if not isinstance(v, float)}
    print(
        json.dumps(
            {
                "metric": "stress_total_wall",
                "value": round(sum(ok), 2),
                "unit": "sec",
                "n_queries": len(timings),
                "n_errors": len(errors),
                "errors": errors,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
