"""Oracle-check named queries at a given sf (default sf0.01) using the
same comparison the driver uses.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools_r21/oracle_check.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from oracle_harness import canonical_rows, duckdb_conn  # noqa: E402

from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.registry import ORACLES as ORACLE_SQL  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    failed = []
    for name in names:
        sdf = QUERIES[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        cur = con.execute(ORACLE_SQL[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        s_can = canonical_rows(scols, [tuple(r) for r in srows])
        o_can = canonical_rows(ocols, orows)
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and s_can == o_can
        )
        print(
            f"{name}: rows {len(srows)}/{len(orows)} "
            f"cols_match={sorted(scols) == sorted(ocols)} "
            f"values_match={s_can == o_can} -> {'PASS' if ok else 'FAIL'}",
            flush=True,
        )
        if not ok:
            failed.append(name)
            for i, (a, b) in enumerate(zip(s_can, o_can)):
                if a != b:
                    print(f"  first diff row {i}:\n   spark  {a}\n   oracle {b}")
                    break
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
