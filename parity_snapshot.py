"""Self-reported oracle-parity artifact in the driver's CORRECTNESS
format: run EVERY registered oracle query against its DuckDB twin at
the driver's own scale factor (sf0.01) and write per-query
rows/schema/hash booleans.

The driver samples only 50 queries per round, so most queries never
get a driver CORRECTNESS row; this artifact closes that evidence gap
(round-3 review item 1).  Usage:

    python parity_snapshot.py                # sf0.01 → CORRECTNESS_local_sf001.json
    SPARK_GRAFT_SF_DIR=... OUT=... python parity_snapshot.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
)

from legalchatbot_vectordb_exp_spark.queries import ORACLES, QUERIES  # noqa: E402
from oracle_harness import canonical_rows, duckdb_conn  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = os.environ.get("OUT", "CORRECTNESS_local_sf001.json")
    # the driver builds its own vanilla session — replicate that
    # (non-UTC tz catches timezone leaks the engine must not have)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)

    results: dict[str, dict] = {}
    for name in sorted(QUERIES):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = QUERIES[name](spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
            if name not in ORACLES:
                # rows-only query (no relational oracle by design)
                rec["err"] = "rows-only: no oracle registered"
                results[name] = rec
                continue
            rel = con.sql(ORACLES[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
            rec["oracle_rows"] = len(d_rows)
            rec["rows_match"] = len(s_rows) == len(d_rows)
            rec["schema_match"] = sorted(df.columns) == sorted(d_cols)
            if rec["rows_match"] and rec["schema_match"]:
                rec["hash_match"] = canonical_rows(
                    df.columns, s_rows
                ) == canonical_rows(d_cols, d_rows)
        except Exception as e:  # record, keep going — this is a census
            rec["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=2)
        results[name] = rec
        flag = "OK " if rec["hash_match"] else "-- "
        print(f"{flag}{name}: {rec['spark_rows']} rows", flush=True)

    # content-based freshness evidence for census_gate.py: the exact
    # sources this census proved (git does not preserve mtimes)
    import census_gate

    results["_source_digest"] = census_gate.source_digest_map(
        os.path.dirname(os.path.abspath(__file__)) or "."
    )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    rows = {k: v for k, v in results.items() if not k.startswith("_")}
    ok = sum(1 for r in rows.values() if r["hash_match"])
    oracles = sum(1 for n in rows if n in ORACLES)
    print(f"\n{ok}/{oracles} oracle queries hash-match → {out_path}")
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
