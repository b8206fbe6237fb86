"""Physical-plan audit: for every registered query, count the plan
features that matter at 100 TB — shuffles (Exchange), join strategies, parquet filter pushdown — and flag
anti-patterns (sort-merge joins where a broadcast was expected,
CartesianProduct, row-at-a-time Python UDFs).

Usage:
    python plan_audit.py [sf_dir]    # default /root/testdata/sf0.1

Prints one line per query plus a summary; exits non-zero if a
CartesianProduct or BatchEvalPython (non-Arrow Python UDF) shows up —
those are never acceptable in this engine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402

# live streaming queries execute on construction; the audit only needs
# the batch plans
SKIP = {"events_streaming_live", "events_stream_join_live"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    print(f"{'query':34} {'exch':>4} {'bhj':>3} {'smj':>3}  flags")
    for name, fn in sorted(QUERIES.items()):
        if name in SKIP:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan:  # row-at-a-time Python UDF
            flags.append("PY_ROW_UDF")
        if flags:
            bad.append((name, flags))
        print(
            f"{name:34} {n_ex:4d} {n_bhj:3d} {n_smj:3d}  {','.join(flags)}"
        )

    if bad:
        print(f"ANTI-PATTERNS: {bad}")
        sys.exit(1)
    print("no anti-patterns (no CartesianProduct, no row-wise Python UDFs)")
    spark.stop()


if __name__ == "__main__":
    main()
